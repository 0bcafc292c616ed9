"""Ad-hoc mini-bench: same methodology as bench.py (warm-up outside the
timed region, min-of-N, noop sink) over an argv-selected query subset.

Usage: python tools/probe_bench.py q257_ivf_pq_trained_topk [q...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPEATS.
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]

    from kinesis_producer_spark.session import get_spark
    from kinesis_producer_spark.suite import load_all

    queries, _ = load_all()
    spark = get_spark("probe_bench")
    spark.sparkContext.setLogLevel("ERROR")

    warm_sf = "/root/testdata/sf0.001"
    for wq in ("q01_pricing_summary", "q51_minhash_lsh"):
        queries[wq](spark, warm_sf).write.mode("overwrite").format("noop").save()
    # warm each probed query once at tiny SF (codegen + UDF workers)
    for name in names:
        queries[name](spark, warm_sf).write.mode("overwrite").format("noop").save()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    times: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
    print(json.dumps({"queries": times, "total": round(sum(times.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
