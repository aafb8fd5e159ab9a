#!/usr/bin/env python
"""Round-7 isolated measurement harness (guide §1.4): times individual
queries/operators with the noop sink at an arbitrary SF dir, optionally
captures .explain("formatted") to plans/r07/. bench.py itself is FROZEN
for driver measurement; this file exists so optimization work can
measure one query at a time without touching it.

Usage:
  python bench_extra.py <name>[,<name>...] [--sf DIR] [--trials N] [--explain TAG]
  python bench_extra.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="?", default="")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--explain", default="", help="suffix tag: write plans/r07/<name>_<tag>.txt")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from docling_pdf_spark.queries import spark_queries
    from bench import EXTRA_BENCH

    catalog = dict(spark_queries())
    catalog.update(EXTRA_BENCH)

    if args.list:
        print("\n".join(sorted(catalog)))
        return 0

    from docling_pdf_spark.session import get_spark

    spark = get_spark("bench_extra", local_cores=args.cpus, shuffle_partitions=max(args.cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py so first-trial numbers are steady-state
    import bench as bench_mod

    bench_mod.warm_up(spark, args.cpus)

    out = {}
    for name in args.names.split(","):
        name = name.strip()
        if not name:
            continue
        fn = catalog[name]
        spark.sparkContext.setJobDescription(f"r07: {name}")
        df = fn(spark, args.sf)
        if args.explain:
            os.makedirs("plans/r07", exist_ok=True)
            with open(f"plans/r07/{name}_{args.explain}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = times
        print(json.dumps({name: times}), flush=True)
    print(json.dumps({"sf": args.sf, "results": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
