"""Write the committed DuckDB-gradable oracle tables (round-6 verdict
ask #3): the single-node Python oracle's parsed/sims/score/issue
tables at the DRIVER GATE scale (sf0.01), as parquet under
``tests/goldens/xoracle_sf0.01/``.

``__spark_entry__.oracle_sql()`` references these by absolute path so
the driver's DuckDB run can grade ``x_exam_info``,
``x_compare_configs``, ``x_eval_scores`` and ``x_validation_issues``
instead of recording ``no_oracle``.  Staleness is pinned by
``tests/test_parsed_eval.py::test_xoracle_artifacts_current`` which
regenerates from the live generator and compares.

Usage: python scripts/make_xoracle_tables.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    import pandas as pd

    from exam_pdf_parser_spark.core.oracle_x import build_xoracle_tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = (sys.argv[2] if len(sys.argv) > 2
               else os.path.join(_REPO, "tests/goldens/xoracle_sf0.01"))
    os.makedirs(out_dir, exist_ok=True)
    tables = build_xoracle_tables(sf_dir)
    for name, rows in tables.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        pd.DataFrame(rows).to_parquet(path, index=False)
        print(f"{name:20s} {len(rows):6d} rows -> {path}")


if __name__ == "__main__":
    main()
