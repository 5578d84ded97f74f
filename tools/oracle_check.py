"""Run named registry queries through the local replica of the driver's
correctness gate (tests/oracle_harness.compare — row count + columns +
exact values vs the DuckDB oracle).

Run: python tools/oracle_check.py [--sf SF_DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from oracle_harness import compare

    from mini_log_lakehouse_spark.entry_registry import ORACLES, QUERIES
    from mini_log_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="oracle-check-r16")
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    for name in args.queries:
        try:
            compare(QUERIES[name](spark, args.sf), ORACLES[name], args.sf, name)
            print(f"OK   {name}")
        except Exception as exc:  # noqa: BLE001 - report, don't abort the batch
            failed.append(name)
            print(f"FAIL {name}: {str(exc)[:300]}")
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
