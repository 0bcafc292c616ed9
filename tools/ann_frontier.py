"""One-table view of the whole ANN family's frontier (round-9 verdict
item: q253/q258/q263/q265 each gate a PAIR — this regenerates the full
payload × recall × probed-fraction × serve-time comparison in one run).

For every serving path: code payload bytes per vector, the probed
candidate fraction its ADC stage scans, recall@10 against the exact
brute-force truth over the standard 30-query sample, and the serve
wall (min of 3, training/codebook collection done ONCE before the
clock — the serve number excludes build-time passes, matching the
round-8 serving-latency protocol).

Usage: python tools/ann_frontier.py [sf_dir] > AUDITS_r9/ann_frontier.md
(progress goes to stderr; stdout is the markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from kinesis_producer_spark.operators.llm_queries import (
        _RECALL_K,
        _RECALL_QUERIES,
    )
    from kinesis_producer_spark.operators.similarity import (
        _trained_parts,
        brute_force_topk,
        ivf_cell,
        ivf_pq_residual_topk_trained,
        ivf_pq_topk,
        ivf_pq_topk_trained,
        ivf_serving_config,
        pq_codes_and_adc_topk,
        ivf_sq8_topk,
        sq8_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from kinesis_producer_spark.session import get_spark

    spark = get_spark()
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = e.count()
    qids = list(range(_RECALL_QUERIES))
    qs = e.filter(F.col("vec_id") < _RECALL_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(e, qs, k=_RECALL_K + 1)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("cos_micro").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rnk") <= _RECALL_K)
        .select("query_id", "vec_id")
        .collect()
    }

    # build-time artifacts, OUTSIDE the serve clock
    print("training...", file=sys.stderr)
    cells_def, nprobe_def = ivf_serving_config(n)
    cent16 = train_ivf_centroids(e, n_cells=16, rounds=2)
    cent16_s = train_ivf_centroids(
        e, n_cells=16, rounds=2, sample_rows=256
    )
    cent_def = train_ivf_centroids(e, n_cells=cells_def, rounds=2)
    cbt = train_pq_codebooks(e, n_centroids=16, m_dims=8, rounds=2)
    cbres16 = train_pq_codebooks(
        e, n_centroids=16, m_dims=8, rounds=2, centroids=cent16
    )

    def probed_trained(cent, nprobe, adapt=None):
        cell_fn, probes_fn = _trained_parts(cent, nprobe, adapt=adapt)
        tcells = e.select(cell_fn(F.col("embedding")).alias("_cell"))
        tprobes = e.filter(F.col("vec_id") < _RECALL_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.explode(probes_fn(F.col("embedding"))).alias("_cell"),
        )
        return tprobes.join(tcells, "_cell").count() / (n * _RECALL_QUERIES)

    def probed_signbit(bits=3):
        scells = e.select(ivf_cell(F.col("embedding"), bits).alias("_cell"))
        qc = ivf_cell(F.col("embedding"), bits)
        sprobes = e.filter(F.col("vec_id") < _RECALL_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.array(qc, *[qc.bitwiseXOR(F.lit(1 << i)) for i in range(bits)])
            ).alias("_cell"),
        )
        return sprobes.join(scells, "_cell").count() / (n * _RECALL_QUERIES)

    rows = []

    def run(name, payload_b, probed, thunk):
        print(f"serving {name}...", file=sys.stderr)
        best, hits = None, None
        for _ in range(3):
            t0 = time.time()
            got = {(r.query_id, r.vec_id) for r in thunk().collect()}
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            hits = len(got & truth)
        rows.append(
            (name, payload_b, probed, hits, 100 * hits // len(truth),
             int(1000 * best))
        )

    qe = e.filter(F.col("vec_id") < _RECALL_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qe")
    )
    ce = e.select("vec_id", F.col("embedding").alias("_ce"))

    def rerank(short):
        # q265's flat-path protocol: ADC top-50 shortlist -> exact
        # cosine re-rank -> top-10, the same tail every IVF path runs,
        # so every row in the table measures the same thing
        from kinesis_producer_spark.operators.similarity import cosine_micro

        return (
            short.join(ce, "vec_id")
            .join(F.broadcast(qe), "query_id")
            .select(
                "query_id", "vec_id",
                cosine_micro(F.col("_qe"), F.col("_ce")).alias("cos_micro"),
            )
            .withColumn(
                "rnk",
                F.row_number().over(
                    W.partitionBy("query_id").orderBy(
                        F.col("cos_micro").desc(), F.col("vec_id")
                    )
                ),
            )
            .filter(F.col("rnk") <= _RECALL_K)
            .select("query_id", "vec_id")
        )

    kw = dict(query_ids=qids, k=_RECALL_K, shortlist=50, exclude_self=True)
    run("brute force (exact)", 512, 1.0, lambda: (
        brute_force_topk(e, qs, k=_RECALL_K + 1)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("cos_micro").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rnk") <= _RECALL_K)
    ))
    run("flat PQ ADC (lowest-id cb)", 4, 1.0,
        lambda: rerank(
            pq_codes_and_adc_topk(e, qids, k=50, exclude_self=True)
            .select("query_id", "vec_id")
        ))
    run("flat PQ ADC (TRAINED cb, q264)", 4, 1.0,
        lambda: rerank(
            pq_codes_and_adc_topk(e, qids, k=50, exclude_self=True,
                                  codebook=cbt)
            .select("query_id", "vec_id")
        ))
    run("SQ8 (q263)", 64, 1.0, lambda: sq8_topk(e, **kw))
    p_sb = probed_signbit()
    run("sign-bit IVF×PQ bits=3 (q252)", 4, p_sb,
        lambda: ivf_pq_topk(e, bits=3, **kw))
    p16 = probed_trained(cent16, 2)
    run("trained IVF×PQ 16×2 (r8 point)", 4, p16,
        lambda: ivf_pq_topk_trained(e, n_cells=16, nprobe=2,
                                    centroids=cent16, **kw))
    p16_s = probed_trained(cent16_s, 2)
    run("trained 16×2, 256-row sampled training (q267)", 4, p16_s,
        lambda: ivf_pq_topk_trained(e, n_cells=16, nprobe=2,
                                    centroids=cent16_s, **kw))
    p_def = probed_trained(cent_def, nprobe_def)
    run(f"trained IVF×PQ {cells_def}×{nprobe_def} (serving_config, q257)",
        4, p_def,
        lambda: ivf_pq_topk_trained(e, n_cells=cells_def, nprobe=nprobe_def,
                                    centroids=cent_def, **kw))
    run("trained cells 16×2 + TRAINED PQ cb", 4, p16,
        lambda: ivf_pq_topk_trained(e, n_cells=16, nprobe=2,
                                    centroids=cent16, codebook=cbt, **kw))
    run(f"trained {cells_def}×{nprobe_def} + TRAINED PQ cb (full stack)",
        4, p_def,
        lambda: ivf_pq_topk_trained(e, n_cells=cells_def, nprobe=nprobe_def,
                                    centroids=cent_def, codebook=cbt, **kw))
    run("residual IVFADC 16×2 (q262)", 4, p16,
        lambda: ivf_pq_residual_topk_trained(e, n_cells=16, nprobe=2,
                                             centroids=cent16, **kw))
    run("residual IVFADC 16×2 + TRAINED residual cb", 4, p16,
        lambda: ivf_pq_residual_topk_trained(e, n_cells=16, nprobe=2,
                                             centroids=cent16,
                                             pq_codebook=cbres16, **kw))
    run(f"trained IVF×SQ8 {cells_def}×{nprobe_def} (q273)", 64, p_def,
        lambda: ivf_sq8_topk(e, n_cells=cells_def, nprobe=nprobe_def,
                             centroids=cent_def, **kw))
    p_ad = probed_trained(cent_def, 8, adapt=(2, 1))
    run(f"trained {cells_def} cells, ADAPTIVE nprobe<=8 ratio 2 (q278)",
        4, p_ad,
        lambda: ivf_pq_topk_trained(e, n_cells=cells_def, nprobe=8,
                                    centroids=cent_def,
                                    adapt_ratio=(2, 1), **kw))
    p_fx8 = probed_trained(cent_def, 8)
    run(f"trained {cells_def} cells, FIXED nprobe=8 (q279 comparator)",
        4, p_fx8,
        lambda: ivf_pq_topk_trained(e, n_cells=cells_def, nprobe=8,
                                    centroids=cent_def, **kw))

    print(f"# ANN frontier — {sf_dir} (n={n}, {_RECALL_QUERIES} queries, "
          f"recall@{_RECALL_K}, shortlist 50, serve = min-of-3 ms with "
          f"training outside the clock)\n")
    print("| path | payload B/vec | probed | hits/"
          f"{len(truth)} | recall | serve ms |")
    print("|---|---|---|---|---|---|")
    for name, pb, pr, hits, rec, ms in rows:
        print(f"| {name} | {pb} | {100 * pr:.1f}% | {hits} | {rec}% | {ms} |")


if __name__ == "__main__":
    main()
