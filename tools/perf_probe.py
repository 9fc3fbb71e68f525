"""Per-query optimization probe: isolated timing + formatted plan capture.

    python tools/perf_probe.py [--sf DIR] [--tag before|after] [--runs N]
                               [--registry-fn] query [query ...]

For each named query (REGISTRY bench_fn by default, or the registry
contract fn with --registry-fn): captures ``df.explain("formatted")``
into ``plans/r13/<query>_<tag>.txt`` and times the noop-sink execution
(guide §1.4) best-of-N with the job labeled (guide §1.5). This is the
measure-first harness for the round-13 optimization pass; bench.py
remains the cross-round artifact of record.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--registry-fn", action="store_true",
                    help="probe the registry contract fn even when a bench_fn exists")
    ap.add_argument("--no-plan", action="store_true", help="skip plan capture (timing only)")
    ap.add_argument("--round", default="r14", help="plans/<round> output directory")
    args = ap.parse_args()

    from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import REGISTRY
    from api_kakfa_spark_airflow_s3_athena_spark.session import local_test_session

    spark = local_test_session("perf-probe")
    outdir = os.path.join(os.path.dirname(__file__), "..", "plans", args.round)
    os.makedirs(outdir, exist_ok=True)

    # Warmup: same protocol as bench.py — pay session/codegen startup
    # and first-touch listing outside the measurement.
    from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import load_table

    REGISTRY["athena_q2_count"].fn(spark, args.sf).write.format("noop").mode("overwrite").save()
    for table in ("lineitem", "orders", "customer", "nation", "region",
                  "documents", "embeddings", "events"):
        load_table(spark, args.sf, table).count()

    needs_stream = any("streaming" in q or q == "quantile_drift_monitor" for q in args.queries)
    if needs_stream:
        from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import _stage_events_stream
        _stage_events_stream(spark, args.sf)

    for name in args.queries:
        spec = REGISTRY[name]
        fn = spec.fn if args.registry_fn else (spec.bench_fn or spec.fn)
        if not args.no_plan:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        times = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: best={min(times)} runs={times}")
    spark.stop()


if __name__ == "__main__":
    main()
