"""sf0.1 → sf1.0 scale soak (VERDICT r4 item 1).

Runs the suite's top shuffle writers plus the round-4 heavy hitters at
BOTH sf0.1 and the generated sf1.0 (tools/gen_scale_data.py — a 10x
key-space translation, so per-copy workloads are exactly the sf0.1
workload and the honest yardstick is LINEAR growth in rows/edges).
For each query it records min-of-2 wall time and measured shuffle
write/read bytes (monitoring REST API, same mechanism as
shuffle_audit.py), then prints the 10x ratios.

What "pass" means: time and shuffle ratios near ~10x (linear) or
below; a ratio trending toward 100x would be the hidden quadratic the
soak exists to catch. Fixpoint loops (connected components, PageRank,
BPE) may exceed 10x by their round count growing with the DATA only
if components span copies — they cannot here (keys are disjoint), so
their round counts must stay FLAT; the tool prints observed rounds
via wall-clock sanity only.

Usage: python tools/scale_soak.py [query ...]   (default: the soak set)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOAK = [
    "q129_copurchase_pairs",
    "q144_connected_components",
    "q147_bpe_vocab_induction",
    "q150_pagerank_integer",
    "q158_merge_on_read",
    "q162_frequent_triples",
    "q163_triangle_count",
    "q51_minhash_lsh",
    "q99_common_passages",
    "q212_packed_sequences",
]

SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1.0": os.path.join(REPO, ".scale", "sf1.0"),
}


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as resp:
        return json.loads(resp.read())


def main() -> int:
    from kinesis_producer_spark.session import get_spark
    from kinesis_producer_spark.suite import load_all

    names = sys.argv[1:] or SOAK
    queries, _ = load_all()
    os.environ["SPARK_GRAFT_UI"] = "true"
    spark = get_spark(
        "scale_soak",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "40000",
            "spark.ui.retainedJobs": "40000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    api = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    # {name: {sf: (secs, write, read, spill, rows)}}
    out: dict[str, dict[str, tuple]] = {}
    for name in names:
        fn = queries[name]
        out[name] = {}
        for sf_label, sf_dir in SF_DIRS.items():
            group = f"{name}@{sf_label}"
            best = None
            rows = -1
            for attempt in range(2):
                sc.setJobGroup(group if attempt == 1 else f"{group}#warm", group)
                t0 = time.monotonic()
                rows = fn(spark, sf_dir).count()
                dt = time.monotonic() - t0
                sc.setJobGroup("", "")
                best = dt if best is None else min(best, dt)
            jobs = _rest(api, "/jobs?status=succeeded")
            stage_ids = set()
            for j in jobs:
                if j.get("jobGroup") == group:  # metrics from the timed run
                    stage_ids.update(j.get("stageIds", []))
            w = r = spill = 0
            for s in _rest(api, "/stages?status=complete"):
                if s["stageId"] in stage_ids:
                    w += s.get("shuffleWriteBytes", 0)
                    r += s.get("shuffleReadBytes", 0)
                    spill += s.get("diskBytesSpilled", 0) + s.get("memoryBytesSpilled", 0)
            out[name][sf_label] = (best, w, r, spill, rows)
            print(
                f"{name} {sf_label}: {best:.2f}s rows={rows:,} "
                f"shuffle_w={w:,}B shuffle_r={r:,}B spill={spill:,}B",
                flush=True,
            )

    print("\n== sf0.1 -> sf1.0 ratios (10x data; linear = ~10x) ==")
    print(f"{'query':<32} {'t0.1':>7} {'t1.0':>8} {'t_ratio':>8} {'w_ratio':>8} {'rows_ratio':>10} {'spill1.0':>10}")
    for name, d in out.items():
        a, b = d["sf0.1"], d["sf1.0"]
        tr = b[0] / a[0] if a[0] else float("inf")
        wr = b[1] / a[1] if a[1] else float("inf") if b[1] else 1.0
        rr = b[4] / a[4] if a[4] else float("inf")
        print(
            f"{name:<32} {a[0]:>6.2f}s {b[0]:>7.2f}s {tr:>7.1f}x {wr:>7.1f}x "
            f"{rr:>9.2f}x {b[3]:>9,}B"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
