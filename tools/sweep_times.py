"""Time named registry queries (median of N warm iterations, noop sink
per guide §1.4) in ONE warm/bench-mode session and print a JSON dict.

Run: python tools/sweep_times.py [--sf SF_DIR] [--iters N] query [query ...]
     python tools/sweep_times.py --all            # every registry entry

The r16 optimization round's A/B harness (same methodology as the r15
sweep): each query is built fresh per iteration (no cross-iteration
result reuse), executed to the noop sink, labeled in the UI.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from mini_log_lakehouse_spark.entry_registry import QUERIES
    from mini_log_lakehouse_spark.session import get_spark

    names = list(QUERIES) if args.all else args.queries
    spark = get_spark(app_name="sweep-times-r16")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        times = []
        for i in range(args.iters):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(times), 4)
        print(f"{name}: {out[name]} s  (runs: {[round(t, 3) for t in times]})",
              file=sys.stderr)
    spark.stop()
    payload = json.dumps({"sf_dir": args.sf, "iters": args.iters, "times": out})
    print(payload)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(payload + "\n")


if __name__ == "__main__":
    main()
