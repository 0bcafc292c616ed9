"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is materialized through the noop sink so the full plan
executes (scan → shuffle → sink) without concentrating rows on the
driver — the same discipline a 100 TB run needs.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

# One headline per engine area: TPC-H-style agg, join+agg, as-of join,
# window top-k, event rollup, XML parse+pivot, tar source, Kinesis sink,
# exact + MinHash dedup, ANN search, text analysis.
HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q04_customer_order_stats",
    "q08_asof_join",
    "q09_topk_per_group",
    "q21_hourly_rollup",
    "q30_signal_xml_roundtrip",
    "q35_tar_roundtrip",
    "q40_kinesis_sink_acks",
    "q50_dedup_exact",
    "q51_minhash_lsh",
    "q55_ann_bruteforce",
    "q58_text_quality",
    "q27_salted_join",
    "q63_tfidf",
    "q90_shipping_priority",
    "q96_word_repetition",
    "q99_common_passages",
    # Iterative algorithms — heaviest non-headline families; tracked so
    # round-over-round regressions in loop-convergence cost are visible.
    "q144_connected_components",
    "q147_bpe_vocab_induction",
    # Round-2 operator families: codec-free media header decode
    # (mapInPandas over synthesized binary containers) and PassJoin
    # segment-blocked edit-distance join.
    "q188_media_header_decode",
    "q62_edit_distance",
    # Round-3: real baseline-JPEG encode+decode (pure-numpy codec) per
    # document inside one mapInPandas stage.
    "q195_jpeg_decode_stats",
    # Round-3 additions: PNG (zlib+unfilter) and FLAC (Rice+fixed
    # predictors) codec round-trips, candidate-pruned exact heavy
    # hitters, and the Bloom-prefiltered semi-join.
    "q196_png_decode_stats",
    "q198_flac_decode_samples",
    "q201_heavy_hitters_pruned",
    "q200_bloom_prune_join",
    # Round-4: grouped (per-domain) heavy hitters and the distributed
    # prefix-sum sequence packing — both shuffle-discipline families.
    "q211_grouped_heavy_hitters",
    "q212_packed_sequences",
    # Round-4: progressive (SOF2) JPEG and lossless-WebP (VP8L)
    # encode+decode matrices.
    "q215_progressive_jpeg_stats",
    "q216_webp_decode_stats",
    # Round-5: deterministic HLL register sketch (256-group map-side
    # combine — the mergeable distinct-count shape), the
    # prefix-aggregate range join (same answer as q28's 102M-pair
    # workload at O(inputs) shuffle — 23x faster at sf0.1), KMV set
    # operations, and the mergeable log-bin quantile summary.
    "q222_hll_registers",
    "q223_range_aggregate_prefix",
    "q224_kmv_set_ops",
    "q225_logbin_quantiles",
    # Round-6: span-level exact substring dedup (ExactSubstr cut list)
    # and span-level benchmark decontamination — the gram-digest →
    # mark → run-fold family.
    "q226_exact_substring_spans",
    "q229_contamination_spans",
    # Round-6 late: SemDeDup keep-list (cell-bounded pair compare with
    # hoisted self-norms), conditional bigram-LM fluency, DSIR
    # importance (broadcast feature table), and PQ-ADC ANN (the
    # compressed-index member of the ANN family).
    "q231_semantic_dedup_keep_list",
    "q232_bigram_lm_quality",
    "q233_dsir_importance",
    "q234_pq_ann_adc",
    # Round-6 extension: ANN recall harness (exact-vs-IVF over a
    # broadcast query sample), mixture epoch-plan (groupBy(source) +
    # broadcast stamp, zero corpus shuffle), per-source calibration
    # (one window exchange).
    "q242_ann_recall_eval",
    "q244_mixture_epoch_plan",
    "q247_source_quality_calibration",
    # Round-6 extension 2: log-free drift audit (one map-side groupBy)
    # and HTML main-content extraction (pure regexp codegen scan).
    "q249_distribution_drift",
    "q250_html_text_extraction",
    # Round-7: composed IVF×PQ serving (multi-probe cell pruning ->
    # ADC over probed codes -> exact re-rank) and its recall gate vs
    # the flat-ADC path.
    "q252_ivf_pq_topk",
    "q253_ivf_pq_recall",
    # Round-8: the production ANN read path (persisted cell-partitioned
    # index: build + partition-pruned serve) and the trained-quantizer
    # serving composition that replaces the sign-bit cells.
    "q254_ivf_pq_index_serving",
    "q257_ivf_pq_trained_topk",
    # Round-9: trained per-subspace PQ codebooks (build = one (cid, d)
    # aggregate per Lloyd round for all M sub-codebooks; serving is
    # q234's flat ADC byte-for-byte against the trained literals),
    # and filtered ANN (metadata predicate pushed into the candidate
    # scan ahead of ADC — q257's plan plus one pushed-down filter).
    "q264_pq_trained_adc_topk",
    "q270_filtered_ann_topk",
    # Round-10: the index LIFECYCLE completed — upsert/delete
    # tombstones served merge-on-read (suppression = churn-bounded
    # broadcast anti-join behind the same probe-cell partition
    # prune) — and adaptive per-query probe width (widen while
    # d2 <= 2x the nearest centroid's, ceiling 8: dominates the
    # fixed ceiling on recall AND probed rows at both fixtures).
    "q276_ann_index_upsert_serving",
    "q278_ivf_adaptive_nprobe_topk",
    # Round-11: the lifecycle loop CLOSED — staleness-triggered
    # rebuild (retrain on the surviving corpus → re-encode → atomic
    # swap under the compaction lock discipline) — the produce→
    # consume Kinesis loop (durable shard logs read back shard-aware
    # into the Firehose transform), perceptual image dedup (integer-
    # DCT pHash, pigeonhole-complete banded candidates through the
    # real PNG decoder), and the count-trained hashed-feature quality
    # classifier (train = ONE aggregation pass, score = broadcast
    # join).
    "q282_ann_index_rebuild_serving",
    "q284_kinesis_consume_roundtrip",
    "q285_phash_near_dup_pairs",
    "q288_nb_quality_score",
    # Round-12: the production-width SemDeDup registration (the
    # corpus-count-derived quantizer that stays linear where pinned
    # bits went quadratic), perceptual AUDIO dedup through the real
    # FLAC codec (banded energy-delta fingerprints), the stream
    # pipeline closed through the flatten sink (consume → EAV pivot →
    # partitioned CSV → pruned re-read), the in-stream rebuild
    # composition, and the graph-ANN family (cell-hypercube NSW build
    # + fixed-horizon layered beam search).
    "q290_semantic_dedup_auto_bits",
    "q291_audio_fp_near_dup_pairs",
    "q293_stream_consume_flatten_sink",
    "q294_streaming_rebuild_maintenance",
    "q295_nsw_graph_build",
    "q298_hnsw_layered_search",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from kinesis_producer_spark.session import get_spark
    from kinesis_producer_spark.suite import load_all

    queries, _ = load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm JVM codegen AND the Python-UDF worker pool (32 workers ×
    # pandas/pyarrow import) outside the timed region — steady-state is
    # the scale-relevant number; worker spawn is a fixed cost that
    # amortizes to noise on a long-running cluster.
    warm_sf = "/root/testdata/sf0.001"
    for wq in (
        "q01_pricing_summary",
        "q30_signal_xml_roundtrip",
        "q51_minhash_lsh",
        "q144_connected_components",  # warms the iterative-loop codegen path
    ):
        queries[wq](spark, warm_sf).write.mode("overwrite").format("noop").save()

    # min-of-N per query (default 2): this box shares hardware with
    # noisy neighbors (load spikes inflate shuffle-heavy queries 2-5x
    # run-to-run); the minimum is the contention-free estimate and is
    # what round-over-round comparisons should use.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
