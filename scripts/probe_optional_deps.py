"""Per-round probe for optionally-installable libraries the repo has
seams for (VERDICT r3 'Next round' #7-9): prints one JSON line with
what imported.  Negative results are recorded in BASELINE.md; the
moment an environment provides a library, the corresponding skipped
tests run with no code changes:

- lance   → tests/test_lance_io.py real-Lance contract tests
- lxml    → tests/test_parser_differential.py fuzz vs lxml recovery
- PIL     → would replace functions/png.py for non-PNG formats
  (the PNG path itself is REAL via the stdlib codec — always true)

Usage: python scripts/probe_optional_deps.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out = {
        name: importlib.util.find_spec(name) is not None
        for name in ("lance", "lxml", "PIL", "cv2")
    }
    # the stdlib PNG codec needs only zlib/struct/numpy — always real
    from website_indexer_ray.functions import png  # noqa: F401

    out["png_stdlib_codec"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
