"""Simulate the driver's correctness gate: run every queries() entry
and, where an oracle_sql() entry exists, the DuckDB oracle at sf0.01;
compare row count, schema (column names sorted), and a value hash.

Usage: python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    # ray Dataset
    return obj.to_pandas()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.reset_index(drop=True)
    # canonical string form, row-order-insensitive: sort by all columns
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    except Exception:
        pass
    csv = df.to_csv(index=False, float_format="%.6g")
    return hashlib.sha256(csv.encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    if not only:
        # entry() smoke (the driver checks this separately): must run
        # and yield >=0 rows with a stable schema.
        ds = e.entry()
        n = ds.count() if hasattr(ds, "count") else len(ds)
        schema = (
            ds.schema().names if hasattr(ds, "schema") and callable(ds.schema)
            else list(ds.columns)
        )
        print(f"entry: rows={n} schema={schema}")

    qs = e.queries()
    oracles = e.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok-   {name}: rows={len(mine)} (rows-only; no oracle)")
            continue
        try:
            gold = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: oracle raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(gold):
            problems.append(f"rows {len(mine)} vs {len(gold)}")
        if sorted(mine.columns) != sorted(gold.columns):
            problems.append(f"cols {sorted(mine.columns)} vs {sorted(gold.columns)}")
        else:
            hm, hg = value_hash(mine), value_hash(gold)
            if hm != hg:
                problems.append(f"hash {hm} vs {hg}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"OK    {name}: rows={len(mine)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
