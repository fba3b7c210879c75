"""Local stand-in for the driver's correctness harness: runs every
``queries()`` entry at sf0.01, compares SQL-oracled ones against DuckDB
(row count + schema + order-insensitive value comparison on
name-sorted columns). Usage: python scripts/verify_local.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def compare(name: str, mine: pd.DataFrame, gold: pd.DataFrame) -> str:
    if len(mine) != len(gold):
        return f"ROWCOUNT mine={len(mine)} gold={len(gold)}"
    m_cols, g_cols = sorted(mine.columns), sorted(gold.columns)
    if m_cols != g_cols:
        return f"SCHEMA mine={m_cols} gold={g_cols}"
    m = mine[m_cols].sort_values(m_cols).reset_index(drop=True)
    g = gold[g_cols].sort_values(g_cols).reset_index(drop=True)
    for c in m_cols:
        mc, gc = m[c], g[c]
        try:
            if not mc.equals(gc):
                eq = (mc == gc) | (mc.isna() & gc.isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    return f"VALUES col={c} row={i} mine={mc[i]!r} gold={gc[i]!r}"
        except Exception as e:  # noqa: BLE001
            return f"COMPARE-ERR col={c}: {e}"
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            mine = to_df(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name in oracles:
            gold = con.execute(oracles[name]).fetchdf()
            verdict = compare(name, mine, gold)
        else:
            verdict = f"rows-only ({len(mine)} rows)"
        status = "OK" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:24s} {dt:6.1f}s  {verdict}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
