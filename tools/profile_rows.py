"""Per-row optimization profiler (guide §1): time named bench/driver
rows in isolation (min of N timed collects after warm passes, the
bench's own methodology) and dump each row's ``explain("formatted")``
to a file for the plan-evidence record.

Usage:
  python tools/profile_rows.py [--plans DIR] [--suffix S] [--reps N]
                               [--sf SF_DIR] name [name ...]

Writes DIR/<name>_<suffix>.txt when --plans is given and prints one
JSON line {"name": sec, ...} to stdout.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from valkey_search_spark.session import get_spark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="plan")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs.update(entrymod.bench_extra())

    out: dict[str, float] = {}
    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        for _ in range(args.warm):
            fn(spark, args.sf).collect()
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
