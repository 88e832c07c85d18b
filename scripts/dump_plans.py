#!/usr/bin/env python3
"""Regenerate PLANS.md: formatted physical plans of representative queries
with the 100 TB rationale for each — the `.explain` audit the scale rules
demand, kept re-runnable so the doc can't silently drift from the code.

Usage:  python scripts/dump_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (query, why this plan is the one you'd want at 100 TB)
AUDIT: list[tuple[str, str]] = [
    (
        "q_geodesic_length",
        "Window lag and the final aggregate both key on pipeline_id: ONE hash"
        " exchange feeds both (the window sort reuses it), and the haversine"
        " is a pure codegen expression — no Python anywhere.",
    ),
    (
        "q_tpch_q1_pricing_summary",
        "Scan-dominated aggregation: the shipdate filter is in PushedFilters,"
        " ReadSchema carries only the 7 referenced columns, and the partial"
        " HashAggregate collapses ~6e6 rows/TB to 4-6 groups map-side — the"
        " exchange ships grouped partials, not rows.",
    ),
    (
        "q_join_inner_hash",
        "The customer dim broadcasts (BroadcastHashJoin, BuildRight): the"
        " orders fact never shuffles.  At 1000 executors this is the"
        " difference between a dim-table-sized broadcast and a fact-table"
        " shuffle.",
    ),
    (
        "q_tpch_q18_large_orders",
        "The HAVING subquery and the outer aggregation both hash-partition"
        " lineitem on l_orderkey — AQE can reuse the exchange; qualifying"
        " keys flow through a LeftSemi (no row multiplication) and customer"
        " broadcasts.",
    ),
    (
        "q_spatial_distance_join",
        "The reference's KDTree radius query becomes a grid-cell equi-join:"
        " SortMergeJoin/ShuffledHashJoin on the cell key with the exact"
        " haversine as residual filter — shuffle keyed on a dense integer"
        " cell id, NEVER CartesianProduct/BroadcastNestedLoop.",
    ),
    (
        "q_contamination",
        "Both the benchmark shingle set and the flagged-id set broadcast:"
        " the 100 TB corpus side streams through two BroadcastHashJoins"
        " without ever shuffling its text.",
    ),
    (
        "q_tfidf",
        "tf is a two-level hash agg; the df join is left to AQE on purpose —"
        " an unbounded vocabulary makes forced broadcast a scale bug; N"
        " rides a 1-row broadcast, never a driver collect.",
    ),
    (
        "q_chunk_documents",
        "UDTF-shaped fan-out with zero Python and zero shuffle: tokenize"
        " once in the projection below Generate(posexplode), slice per"
        " chunk above it.  Output partitioning inherits the scan.",
    ),
    (
        "q_tpch_q17_small_qty",
        "Correlated scalar subquery, decorrelated: the per-part AVG is a"
        " self-aggregation of lineitem; both it and the probe side key on"
        " l_partkey, so at scale the join is SMJ over ONE reusable exchange"
        " (AQE broadcasts the small agg at this sf).  The brand list"
        " broadcasts as a LeftSemi — no row multiplication before the avg"
        " join.",
    ),
    (
        "q_tpch_q20_excess_supply",
        "Nested semi-join chain: the (l_suppkey, l_partkey) aggregation's"
        " exchange also serves the per-part total (stacked aggs, same key"
        " prefix); the name-filtered part list broadcasts as a LeftSemi"
        " BEFORE the share filter, and supplier is only ever semi-joined —"
        " each supplier row emitted at most once, no DISTINCT needed.",
    ),
    (
        "q_tpch_q21_waiting_supplier",
        "EXISTS / NOT EXISTS as LeftSemi + LeftAnti with non-equi residuals"
        " (same l_orderkey, different l_suppkey): all three lineitem"
        " branches key their join on l_orderkey, so at 100 TB they share"
        " shuffle partitioning; the residual disqualifier is evaluated"
        " inside the join, never as a post-join filter on multiplied rows;"
        " supplier broadcasts last.",
    ),
    (
        "q_tpch_q2_min_cost_supplier",
        "Correlated MIN over a second relation copy: the region-restricted"
        " cost table is built ONCE (persisted — the pre-fix plan ran the"
        " lineitem scan + (partkey, suppkey) aggregation twice) and feeds"
        " both the candidate rows and the per-part min; the min-equality"
        " join keys both sides on l_partkey (SMJ, shared partitioning);"
        " supplier/nation/region and the filtered part list all broadcast;"
        " TakeOrderedAndProject bounds the driver at 100 rows.",
    ),
    (
        "q_tpch_q16_supplier_cnt",
        "DISTINCT pairs -> anti join -> COUNT DISTINCT: the complaint list"
        " broadcasts as LeftAnti BEFORE the distinct (prunes early), the"
        " filtered part side broadcasts, and the count-distinct plans as"
        " the two-phase partial/final HashAggregate stack over one"
        " exchange on the grouping key — no Expand explosion.",
    ),
    (
        "q_pack_sequences",
        "Only (doc_id, ntok) pairs enter the per-shard window exchange —"
        " the text never leaves the scan projection; the cut arithmetic"
        " and the example rollup reuse the shard partitioning, and shards"
        " (not a global order) are the packing parallelism unit.",
    ),
    (
        "q_sql_recursive_tree",
        "UnionLoop iterative execution: O(log N) recursive steps, each a"
        " key-equi join of the bounded frontier against the customer"
        " dimension — the declarative twin of the connected-components"
        " driver loop, with the same bounded-iteration discipline.",
    ),
    (
        "q_snapshot_diff",
        "Both snapshot date cuts push into the parquet scan; the diff is"
        " ONE full-outer sort-merge join on the key (table-scale sides"
        " must not broadcast) and the verdict is a post-join projection"
        " into a four-group rollup.  Bucketed layouts make the same plan"
        " exchange-free.",
    ),
    (
        "q_interval_union",
        "Both gaps-and-islands windows, the island rollup, and the final"
        " per-user aggregate run on ONE user_id exchange; interval"
        " arithmetic is all epoch-micro longs — exact, no tolerance.",
    ),
    (
        "q_first_touch_attribution",
        "Sessionize, the rank-1 first-touch window, and the credited"
        " re-join all key on user_id (sid derives within the partition) —"
        " one exchange family end to end; the persisted session frame"
        " feeds both the first-touch pass and the purchase rollup.",
    ),
    (
        "q_retention_cohorts",
        "The distinct (user, epoch-week) projection collapses the event"
        " table FIRST (map-side combine), so the cohort MIN and the"
        " retention matrix aggregate an already-small frame; every"
        " shuffle keys on the user.",
    ),
    (
        "q_graph_triangles",
        "Edge generation explodes pairs only within a part (bounded"
        " per-part degree), dedups once, and is persisted so the wedge"
        " and closing joins read one materialization; every join keys on"
        " vertices/edge pairs — no unblocked N^2 anywhere.",
    ),
    (
        "q_markov_transitions",
        "One wide shuffle (the per-user lag window); the transition rollup"
        " reduces to |types|^2 rows and the P(next|prev) normalization"
        " window runs on that tiny aggregate.",
    ),
    (
        "q_anomaly_zscore",
        "The stats window and the final rollup share the single event_type"
        " exchange — one shuffle end-to-end; no join-back (window form"
        " keeps each row co-located with its segment stats).",
    ),
    (
        "q_ewma_smooth",
        "Both window passes (8 FIR lags asc + row_number desc) and the"
        " per-user rollup run inside ONE user_id exchange; two sorts, zero"
        " extra shuffles.",
    ),
    (
        "q_data_quality",
        "Six predicate rules + the duplicate-key distinct fold into ONE"
        " lineitem aggregation (Expand is the multi-distinct strategy); the"
        " FK check is a broadcast LEFT ANTI reduced to a count; both 1-row"
        " aggregates cross-join for free before the 7-row stack unpivot.",
    ),
    (
        "q_profile_table",
        "Entire profile is ONE aggregation pass: Expand replicates rows"
        " once per distinct-column group, partial aggregation collapses"
        " each stream map-side before the single exchange pair.",
    ),
    (
        "q_rfm_segmentation",
        "Per-customer rollup is one custkey hash-agg shuffle; the three"
        " ntile windows are single-partition sorts over the"
        " |customers|-row aggregate (exact global quantile rank semantics,"
        " deliberately pinned; approx_percentile cutpoints are the 100 TB"
        " swap).",
    ),
    (
        "q_curation_e2e",
        "Six-stage funnel: quality is a pushed scan filter; exact dedup"
        " one md5-fingerprint window shuffle; near-dup the banded-LSH"
        " bucket join from operators/dedup.py (persisted signature stage,"
        " never all-pairs); decontamination a broadcast LEFT SEMI against"
        " the benchmark 8-gram set; sampling a scan-side md5 threshold."
        "  Stage frames persist once (InMemoryTableScan reuse visible) and"
        " feed both the next stage and the 1-row rollups; the final union"
        " is 6 rows.",
    ),
    (
        "q_join_bloom_pruned",
        "The bitmap builds distributed (explode -> bit_or hash agg ->"
        " range left-join densify -> 1-row collect_list), broadcasts once,"
        " and the probe predicate (element_at + shiftleft masks) filters"
        " the fact scan BEFORE the join; the final BroadcastHashJoin sees"
        " only survivors.  Oracle is the plain join: identity =="
        " no-false-negatives.",
    ),
    (
        "q_spatial_polar_join",
        "REBUILT late r06 as one region-tagged join: each row emits its"
        " applicable (rg, cx, cy) keys in a single projection (degree-grid"
        " band at or below 85, planar cap grid per pole above; two entries"
        " only in the one-radius overlap strip) and ONE equi-join on the"
        " tagged key finds every pair, with disjoint region ownership"
        " keeping each pair unique.  sf0.1 plan: 6 exchanges / 2 joins /"
        " zero cartesian products, input read once per join side (the"
        " first cut unioned three scans — 18 exchanges / 6 joins).",
    ),
    (
        "q_dense_ids",
        "Global row_number SEMANTICS without the global window: the data"
        " crosses a parallel range exchange plus one pid-keyed exchange;"
        " the only Exchange SinglePartition in the plan feeds the"
        " prefix-sum over <= n_partitions COUNT rows (bytes, not data),"
        " and the offsets come back as a BroadcastHashJoin.  The ranged"
        " frame is persisted: the counts branch and the id branch both"
        " read the SAME materialization (InMemoryTableScan x2) — the"
        " first cut re-ran the scan + range exchange for the counts, a"
        " second full table pass at 100 TB.  The naive Window.orderBy"
        " spelling would funnel the whole table through one sort task.",
    ),
    (
        "q_gap_fill",
        "Bucket aggregate, span aggregate, grid left-join and both fill"
        " windows (LOCF preceding-frame + interpolation following-frame"
        " sharing one sort) all key on user_id — one exchange family;"
        " the dense grid regenerates from the span via explode(sequence),"
        " never a second scan of events.",
    ),
    (
        "q_resample_ohlc",
        "OHLC as ONE aggregate: min_by/max_by carry open/close through the"
        " map-side partial-merge tree, so the events table crosses exactly"
        " one (event_type, bucket)-keyed exchange and nothing is globally"
        " sorted.  The struct ordering key (ts, event_id tiebreak) demotes"
        " hash- to sort-aggregate — documented trade; drop the tiebreak"
        " when timestamps are unique per bucket and it plans HashAggregate"
        " (both shapes gated in tests/test_resample_ohlc.py).  The naive"
        " first/last-value window spelling (the oracle) pays a per-bucket"
        " sort plus a second aggregate.",
    ),
    (
        "q_dedup_lines",
        "Line dedup without pairwise comparison: posexplode, then ONE hash"
        " aggregate keyed on the 16-byte md5 digest elects distinct-doc"
        " spread and the min-(doc,pos) winner together — map-side partials"
        " absorb a banner line appearing a billion times, and the exchange"
        " never carries line text.  The tiny dup table joins back"
        " (broadcast under AQE) and one per-doc aggregate reassembles kept"
        " lines in position order.  The exploded frame is persisted: the"
        " dup aggregate and the join-back read one materialization.",
    ),
    (
        "q_sample_k_per_key",
        "Exact k-per-key with the WindowGroupLimit prune: the rank filter"
        " pushes a PARTIAL WindowGroupLimit below the exchange, so each"
        " map task pre-prunes to its local top-k and a billion-row source"
        " ships k rows per map task, not a billion.  Rank = md5(id):"
        " deterministic pseudo-random permutation, no rand(), no driver.",
    ),
    (
        "q_percentile_gate",
        "Both windows (per-source rank and group count) ride ONE"
        " source-keyed exchange + one sort.  At 100 TB the exact rank"
        " swaps to approx_percentile thresholds broadcast back (no"
        " per-group sort) — this face is the oracle-checkable spelling"
        " of the same decision.",
    ),
    (
        "q_source_copy_matrix",
        "Rides the banded-LSH pair plan unchanged (never all-pairs), then"
        " two doc-id joins against the narrow (id, source) projection and"
        " ONE aggregate whose key space is bounded by |sources|^2 — the"
        " rollup adds no new shuffle family to the pair face.",
    ),
    (
        "q_kmeans_embed",
        "Lloyd iteration after the r09 rewrite: assignment is a PURE MAP —"
        " array_min over a one-row broadcast centroid array (same (sqd,"
        " cid) tie rule as the old min_by) — so the N x k scored frame of"
        " the previous spelling is never materialized and the only"
        " exchange per iteration is the (cid, dim) centroid-mean update."
        "  k grows with the corpus under the SemDeDup deployment rule,"
        " which made the old N x k explode quadratic at scale.",
    ),
    (
        "q_similarity_ann_ivf",
        "IVF after the r09 rewrite: corpus list assignment is map-side"
        " array_min over the broadcast centroid array (zero exchanges"
        " before the list-id repartition) and query multi-probe is"
        " array_sort + slice + explode on the same per-row struct array —"
        " the old window/min_by spellings' (desc csim, asc id) order"
        " exactly, with centroid norms precomputed into the broadcast row.",
    ),
    (
        "q_dedup_semantic_rep",
        "SemDeDup with the paper's centroid-distance survivor: kmeans"
        " fit/assignment reused from the pair stage via sinks (zero"
        " refit), centroid table broadcast (k rows), components via"
        " O(log D) pointer jumping, and the representative election is"
        " one cluster-keyed window — beyond the cluster-scoped pair"
        " stage nothing is quadratic.",
    ),
    (
        "q_percentile_gate_approx",
        "The 100 TB spelling of the per-group quality gate: the threshold"
        " is ONE hash aggregate moving GK-sketch partials (bytes per"
        " (source, partition), not rows) and joins back as a broadcast —"
        " the corpus never sorts and never shuffles, where the exact"
        " face's rank window moves every row through a source-keyed"
        " exchange.  Sort-free shape plan-gated in"
        " tests/test_percentile_cut.py.",
    ),
    (
        "q_ohlc_candles",
        "The STREAMING OHLC spelling (window(ts) buckets) compiles to the"
        " same single (event_type, window)-keyed aggregate as the batch"
        " operator's integer arithmetic — min_by/max_by partials carry"
        " open/close through the merge tree, which is exactly what lets"
        " the identical function run under a watermark with bounded state"
        " (batch==stream proven in tests/test_stream_ohlc.py).",
    ),
    (
        "q_dedup_axes_report",
        "Three dedup axes composed without a new shuffle family: each axis"
        " keeps its own guarantees (md5-group window, banded LSH + CC,"
        " 16-bit-prefix simhash blocking), then the report is a doc-id-"
        "keyed join family + ONE hash aggregate over a <= 2^3 cell space"
        " — at 100 TB the axes dominate and the rollup is noise.",
    ),
    (
        "q_overlap_sections",
        "The corridor kernel's scalars under the oracle gate: identical"
        " exchanges to q_parallel_overlap (grid-bucket distance join, one"
        " (p1,p2)-keyed sessionization window), kept hits persisted ONCE"
        " for their two consumers (section aggregate + applyInPandas"
        " corridor kernel), and the kernel's groups are single sections —"
        " bounded size by construction, shuffled by their own key.",
    ),
    (
        "q_knn_graph",
        "The cosine-path kNN graph (oracle face): sign-prefix blocking,"
        " skew-salted unordered pairs, per-row norms hoisted so each"
        " vector's sqrt runs once — note the nrm double riding BOTH sides"
        " of the pair-stage exchange; the normalized-ingest variant below"
        " deletes it.",
    ),
    (
        "q_zorder_pruned_scan",
        "The file-skipping consumer of the Morton tile statistics: the"
        " <= 1024-row manifest aggregate prunes against the bbox and comes"
        " back as a BroadcastHashJoin onto the scan — the corpus never"
        " shuffles for the prune decision.  At 100 TB the manifest already"
        " exists (written at cluster time), so the query-time plan is"
        " broadcast-semi-join + read-only-surviving-files; here the"
        " manifest build shares the same single scan family.",
    ),
    (
        "q_similarity_ann_ivf_refine",
        "Two-stage ANN: centroids broadcast as one struct-array row, both"
        " assignment sides are pure maps (zero corpus exchanges before the"
        " list-id equi-join), the coarse join moves int8-style CODE arrays"
        " instead of float64 vectors, and the refine stage re-joins full"
        " vectors for exactly k_coarse rows per query — grep the plan: the"
        " uv doubles appear only behind the coarse row_number filter.",
    ),
    (
        "q_approx_group_buckets",
        "Per-group ntile without a corpus sort: ONE aggregate exchange"
        " moves GK-sketch partials (an array of 3 thresholds per group),"
        " the thresholds broadcast back, and the bucket id is a map-side"
        " fold over 3 comparisons — the exact face's rank window would"
        " sort every group end-to-end at 100 TB.",
    ),
    (
        "q_compaction_plan",
        "Table maintenance priced off the MANIFEST, never the data: one"
        " ordered window over the small-file subset of a file listing"
        " (thousands of rows/table), integer arithmetic end-to-end; the"
        " expensive thing it schedules — the rewrite — is exactly n_small"
        " file reads, decided here for the cost of a window over metadata.",
    ),
    (
        "q_phash_image_dedup",
        "Image near-dup at corpus scale: PNG encode + decode + 64-bit"
        " aHash all inside ONE MapInPandas pass (no Exchange below it —"
        " the image bytes never shuffle); only (id, two BIGINTs) rows"
        " reach the band explode, 4 rows per image, and the candidate"
        " join is an equi-join on the 16-bit (band, key) pair — no"
        " all-pairs comparison exists anywhere in the plan.",
    ),
    (
        "q_similarity_ann_ivf_pq",
        "IVF-PQ: the corpus side crosses ZERO exchanges end-to-end — one"
        " projection computes each vector's PQ code word AND coarse list"
        " id against two one-row broadcasts (codebook + centroid structs),"
        " the probe join is a BroadcastHashJoin on list_id (query side"
        " tiny by contract), and the only rows that ever shuffle are"
        " probed-list ADC survivors entering the per-query top-k window."
        " The float vectors reappear only in the k_coarse-bounded refine"
        " re-join.",
    ),
    (
        "q_postings_index",
        "Inverted-index build under head-term skew: occurrences collapse"
        " map-side in the (term, doc) partial aggregate; the posting cap"
        " runs as TWO stacked row_number windows — first partitioned by"
        " (term, doc_id % 32) so a term spanning the whole corpus never"
        " concentrates more than df/32 rows in one partition, then over"
        " the <= k*32 survivors per term; the top-terms cut is"
        " TakeOrderedAndProject over post-aggregate vocabulary rows and"
        " comes back as a broadcast semi-join.",
    ),
    (
        "q_winnow_code_dedup",
        "Winnowing: the per-document fingerprint selection is HOF-only"
        " (transform/slice/array_min over a STAGED gram-hash column —"
        " zero Python, zero Exchange below the explode); the corpus"
        " shuffles only (doc, 32-byte hex) fingerprint rows, and the"
        " df-cap aggregate runs BEFORE the pair self-join so every join"
        " bucket is bounded at C(max_df, 2) pairs regardless of corpus"
        " size.",
    ),
    (
        "q_phash_image_dedup",
        "The r13 hot-bucket fix in one plan: banding runs over DISTINCT"
        " hashes (identical images expand output-side through the"
        " multiplicity join at the end — their pairs are true Hamming-0"
        " pairs by definition), the band join is grp-keyed equi only, and"
        " any over-cap group leaves this plan entirely for the recursion"
        " frontier (a localCheckpoint side branch) instead of joining"
        " quadratically.  No key at any corpus size drives more than"
        " cap^2/2 candidate pairs; recall at Hamming <= 3 stays EXACT"
        " (pigeonhole holds at every recursion level).",
    ),
    (
        "q_audio_fingerprint_dedup",
        "Audio near-dup shares the capped banded-Hamming join verbatim:"
        " WAV encode + fingerprint are one Arrow map pass (zero exchanges"
        " below the band explode), only (id, two BIGINT words) rows reach"
        " any shuffle, and the transcoded plants surface as Hamming-0"
        " pairs through the identical-hash multiplicity join — the sample"
        " bytes themselves never cross an exchange.",
    ),
    (
        "q_k_anonymity",
        "Both phases are one hash aggregate each over the quasi tuple"
        " (map-side partials absorb hot event_type combinations); the"
        " enforcement join re-keys on the SAME tuple the audit grouped"
        " by — null-safe so NULL-pattern classes stay one class — and"
        " only class-size scalars move between stages, never row"
        " payloads.",
    ),
    (
        "q_optimize_dataset",
        "Write-path OPTIMIZE: planning is Column arithmetic over the"
        " file LISTING (one metadata row per file, partition-local"
        " cumulative windows); the rewrite scan reads EXACTLY the"
        " small-file set, shuffles it once keyed by (partition, __grp)"
        " so group boundaries survive task hashing, and writes one file"
        " per group; untouched files carry over as O(1) hardlinks and"
        " the validation is aggregate-only (order-independent checksums"
        " from the manifest).",
    ),
    (
        "q_video_fingerprint_dedup",
        "Video near-dup: frame hashing is one Arrow map pass (the video"
        " bytes never reach an exchange — only (id, frame_index, two"
        " BIGINTs) rows do); the frame-hash equi-join is bounded per"
        " bucket by the df-cap broadcast anti-join, and the temporal"
        " vote is two hash aggregates over (pair, delta) counting"
        " DISTINCT frame hashes — no corpus-quadratic stage anywhere.",
    ),
    (
        "q_hilbert_layout",
        "The xy2d transform is 16 chained projections of pure integer"
        " arithmetic inside ONE WholeStageCodegen span — no UDF, no"
        " exchange below the final <= 1024-tile hash aggregate (the"
        " nested-Column spelling grows ~5^bits expression nodes and"
        " hangs Catalyst analysis near bits=8; the chain is linear).",
    ),
    (
        "q_l_diversity",
        "Audit and post-enforcement audit are one count-distinct hash"
        " aggregate each over the quasi tuple; suppression joins class"
        " diversities back on the SAME null-safe tuple, reusing the"
        " shuffle partitioning; only (class, diversity) scalars move"
        " between stages.",
    ),
    (
        "q_entropy_profile",
        "The per-document entropy is a zero-Exchange scan: array_sort +"
        " one F.aggregate run-fold per row inside codegen (no (doc,"
        " term) explode exchange — the shuffle that dominates naive"
        " TF entropy at corpus scale); the profile aggregate's key"
        " domain is languages x ~dozens of buckets.",
    ),
    (
        "q_kn_bigram_lm",
        "One (ctx, nxt) hash aggregate over the exploded bigrams (map-"
        " side partials absorb within-doc repetition) is persisted and"
        " feeds three bounded derivations; the model joins are equi-"
        " joins over the vocab-pair-bounded table and the distinct-"
        " bigram total rides a one-row broadcast.",
    ),
    (
        "q_textnorm_impact",
        "NFC is a pure Arrow map (MapInPandas, zero exchanges below"
        " it); each duplicate-mass branch shuffles only (lang, 16-byte"
        " md5) pairs — the raw text never crosses an exchange after"
        " the fingerprint projection.",
    ),
    (
        "q_cohort_retention",
        "The event stream collapses to distinct (user, day) with map-"
        " side combine; cohort MIN and the matrix rollup both key on"
        " user (shared partitioning); cohort sizes come back via"
        " BroadcastHashJoin onto the <= days^2 matrix — nothing event-"
        " sized crosses a second exchange.",
    ),
]

# Non-registry plan notes: (title, why, builder(spark) -> DataFrame).
# knn_graph's normalized-ingest fast path is an operator variant, not a
# registry face (the oracle face keeps raw vectors + explicit norms), so
# its shuffle-width evidence is captured here (VERDICT r09 #4).
def _knn_unit_pair_stage(spark):
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.functions.vectors import unit_normalize
    from pipeline_calculator_v3_spark.operators.similarity import knn_graph

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # normalize-at-write severed from lineage the cheap way: checkpoint-
    # free localCheckpoint is overkill for a plan dump; re-read via a
    # temp view round trip keeps the dump hermetic
    normed = emb.select(
        "vec_id", unit_normalize(F.col("embedding")).alias("embedding")
    ).where(F.col("embedding").isNotNull())
    import tempfile

    d = tempfile.mkdtemp(prefix="knn_unit_plans_")
    normed.write.mode("overwrite").parquet(d)
    return knn_graph(
        spark.read.parquet(d), k=5, sign_dims=4, assume_unit=True
    )


EXTRA: list[tuple[str, str, object]] = [
    (
        "knn_graph — normalized ingest (assume_unit=True)",
        "A corpus written through functions.vectors.unit_normalize has"
        " every norm == 1, so cosine IS the dot product: the nrm column"
        " (one double per row per side) vanishes from the pair-stage"
        " shuffle and the per-row sqrt pass disappears entirely — grep"
        " this plan for 'nrm' or 'SQRT' and find neither, then compare"
        " the q_knn_graph oracle face above whose exchanges carry both."
        "  Gated in tests/test_knn_unit.py (same graph as the cosine"
        " path, plan free of norm machinery).",
        _knn_unit_pair_stage,
    ),
]


def main() -> None:
    from pipeline_calculator_v3_spark.queries import QUERIES
    from pipeline_calculator_v3_spark.session import get_spark

    spark = get_spark("pcv3-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical-plan audit of representative queries",
        "",
        f"Regenerate with `python scripts/dump_plans.py` (sf dir: `{SF_DIR}`).",
        "Each section: why the plan is the right one at 100 TB, then the",
        "formatted plan Catalyst actually produced (AQE initial plan; stage",
        "re-optimization can only improve it at runtime).",
        "",
    ]
    sections = [(name, why, None) for name, why in AUDIT] + EXTRA
    for name, why, builder in sections:
        df = QUERIES[name](spark, SF_DIR) if builder is None else builder(spark)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {name}")
        out.append("")
        out.append(why)
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(sections)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
