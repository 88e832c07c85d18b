"""r15 face candidates — built and driver-grade-gated BEFORE they are
registered (tests/test_staged_faces.py runs every pair below through the
same value comparison the driver applies).

NOT imported by ``queries.py`` and carrying no ``@query`` decorators ON
PURPOSE: the r14 window is frozen at exactly 50 slots, and a new
registry entry would silently evict the keep-list tail (the r06
review's window-arithmetic rule).  r15 wires these in by adding the
decorator + a ``_NEVER_CHECKED_FIRST`` slot per the slot plan in
queries.py — the face bodies, oracle SQL, and value gates are already
done here, so the window execution is a mechanical move.

Each entry: ``STAGED[name] = (fn, oracle_sql | None)`` with the exact
``queries()`` / ``oracle_sql()`` contract (callable takes
(spark, sf_dir), every computed column aliased identically on both
sides).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import TOKENS_SQL as _TOKENS
from .queries import t

_D = 0.75
_K_EXPR = "CAST(json_extract(props, '$.k') AS BIGINT)"


# ---------------------------------------------------------------------------
# q_kn_doc_ppl — per-document perplexity under the corpus-trained
# interpolated-KN bigram model (operators/ngram_lm.py::kn_doc_nll).
# ---------------------------------------------------------------------------
def q_kn_doc_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ngram_lm import kn_doc_nll

    return kn_doc_nll(t(spark, sf_dir, "documents"), discount=_D)


KN_DOC_PPL_ORACLE = f"""
WITH tk AS (
    SELECT doc_id, {_TOKENS} AS tok FROM documents
    WHERE len({_TOKENS}) > 1
),
bg AS (
    SELECT doc_id, split_part(b, ' ', 1) AS ctx, split_part(b, ' ', 2) AS nxt
    FROM (SELECT doc_id,
                 unnest(list_transform(
                     range(1, greatest(len(tok) - 1, 0) + 1),
                     i -> tok[i] || ' ' || tok[i + 1])) AS b
          FROM tk)
),
counts AS (
    SELECT ctx, nxt, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
),
ctx_stats AS (
    SELECT ctx, CAST(sum(c) AS BIGINT) AS c_ctx,
           CAST(count(*) AS BIGINT) AS n1p_ctx
    FROM counts GROUP BY 1
),
cont AS (
    SELECT nxt, CAST(count(*) AS BIGINT) AS n1p_w FROM counts GROUP BY 1
),
total AS (SELECT CAST(count(*) AS BIGINT) AS n1p_all FROM counts),
scored AS (
    SELECT b.doc_id,
           -ln(greatest(CAST(c.c AS DOUBLE) - {_D!r}, 0.0) / s.c_ctx
               + {_D!r} * s.n1p_ctx / s.c_ctx
                 * (CAST(w.n1p_w AS DOUBLE) / t2.n1p_all)) AS nll
    FROM bg b
    JOIN counts c USING (ctx, nxt)
    JOIN ctx_stats s USING (ctx)
    JOIN cont w USING (nxt)
    CROSS JOIN total t2
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(nll), 6) AS nll_nats,
       round(exp(round(avg(nll), 6)), 4) AS ppl
FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q_t_closeness / q_t_closeness_ordered — the skewness-attack audits
# over events (quasi = event_type x props-k decile, sensitive = k mod 7).
# ---------------------------------------------------------------------------
def _events_quasi(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("bigint")
    return t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(k / 10).cast("bigint").alias("k_bucket"),
        (k % 7).alias("sens"),
    )


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.anonymity import t_closeness_audit

    return t_closeness_audit(
        _events_quasi(spark, sf_dir),
        ["event_type", "k_bucket"], "sens", t=0.2,
    )


T_CLOSENESS_ORACLE = f"""
WITH q AS (
    SELECT event_type, {_K_EXPR} // 10 AS k_bucket, {_K_EXPR} % 7 AS sens
    FROM events
),
cells AS (
    SELECT event_type, k_bucket, sens, count(*) AS cc
    FROM q GROUP BY 1, 2, 3
),
gl AS (SELECT sens, count(*) AS gg FROM q GROUP BY 1),
tot AS (SELECT count(*) AS bign FROM q),
wn AS (
    SELECT cells.*, gg, bign,
           sum(cc) OVER (PARTITION BY event_type, k_bucket) AS clsn
    FROM cells
    JOIN gl ON cells.sens IS NOT DISTINCT FROM gl.sens
    CROSS JOIN tot
),
cl AS (
    SELECT event_type, k_bucket,
           CAST(max(clsn) AS BIGINT) AS class_size,
           CAST(sum(abs(cc * bign - gg * clsn))
                + (max(bign) - sum(gg)) * max(clsn) AS BIGINT) AS tvd_num,
           CAST(2 * max(clsn) * max(bign) AS BIGINT) AS tvd_den
    FROM wn GROUP BY 1, 2
)
SELECT event_type, k_bucket, class_size, tvd_num, tvd_den,
       tvd_num / tvd_den AS t_distance,
       tvd_num / tvd_den > 0.2 AS risky
FROM cl
"""


def q_t_closeness_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.anonymity import t_closeness_audit_ordered

    return t_closeness_audit_ordered(
        _events_quasi(spark, sf_dir).where(F.col("sens").isNotNull()),
        ["event_type", "k_bucket"], "sens", t=0.2,
    )


T_CLOSENESS_ORD_ORACLE = f"""
WITH q AS (
    SELECT event_type, {_K_EXPR} // 10 AS k_bucket, {_K_EXPR} % 7 AS sens
    FROM events WHERE {_K_EXPR} IS NOT NULL
),
cells AS (
    SELECT event_type, k_bucket, sens, count(*) AS cc
    FROM q GROUP BY 1, 2, 3
),
gl AS (SELECT sens, count(*) AS gg FROM q GROUP BY 1),
dom AS (
    SELECT sens, gg, row_number() OVER (ORDER BY sens) AS i,
           sum(gg) OVER () AS bign, count(*) OVER () AS m
    FROM gl
),
sizes AS (
    SELECT event_type, k_bucket, count(*) AS csz FROM q GROUP BY 1, 2
),
grid AS (
    SELECT s.event_type, s.k_bucket, s.csz, d.gg, d.i, d.bign, d.m,
           COALESCE(c.cc, 0) AS c0
    FROM sizes s CROSS JOIN dom d
    LEFT JOIN cells c
      ON c.event_type IS NOT DISTINCT FROM s.event_type
     AND c.k_bucket IS NOT DISTINCT FROM s.k_bucket
     AND c.sens = d.sens
),
cum AS (
    SELECT *, sum(c0 * bign - gg * csz)
              OVER (PARTITION BY event_type, k_bucket ORDER BY i) AS cm
    FROM grid
)
SELECT event_type, k_bucket,
       CAST(max(csz) AS BIGINT) AS class_size,
       CAST(sum(abs(cm)) AS BIGINT) AS emd_num,
       CAST(max(csz) * max(bign) * greatest(max(m) - 1, 1) AS BIGINT)
           AS emd_den,
       CAST(sum(abs(cm)) AS BIGINT)
           / (CAST(max(csz) * max(bign) * greatest(max(m) - 1, 1) AS BIGINT))
           AS t_distance,
       CAST(sum(abs(cm)) AS BIGINT)
           / (CAST(max(csz) * max(bign) * greatest(max(m) - 1, 1) AS BIGINT))
           > 0.2 AS risky
FROM cum WHERE i < m GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_dp_release — seeded-Laplace DP count release over the same quasi
# tuple; the noise SQL text is shared VERBATIM between the two engines.
# ---------------------------------------------------------------------------
_DP_EPS, _DP_SEED = 0.5, "r15-face"


def q_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.anonymity import dp_group_counts

    k = F.get_json_object("props", "$.k").cast("bigint")
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.floor(k / 10).cast("bigint").alias("k_bucket")
    )
    return dp_group_counts(
        ev, ["event_type", "k_bucket"], epsilon=_DP_EPS, seed=_DP_SEED
    )


def _dp_release_oracle() -> str:
    from .operators.anonymity import group_key_sql, laplace_noise_sql

    noise = laplace_noise_sql(
        group_key_sql(["event_type", "k_bucket"]), 1.0 / _DP_EPS, _DP_SEED
    )
    return f"""
WITH q AS (
    SELECT event_type, {_K_EXPR} // 10 AS k_bucket FROM events
),
c AS (
    SELECT event_type, k_bucket, CAST(count(*) AS BIGINT) AS _n
    FROM q GROUP BY 1, 2
)
SELECT event_type, k_bucket, round(_n + {noise}, 6) AS noisy_count
FROM c
"""


# ---------------------------------------------------------------------------
# q_split_leakage — the group-keyed-split proof over clustered documents
# (grp = doc_id // 10 stands in for a near-dup cluster id): the row-keyed
# anti-pattern flags leaky, the group-keyed assignment certifies clean.
# ---------------------------------------------------------------------------
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import split_assign, split_leakage_audit

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.floor(F.col("doc_id") / 10).alias("grp")
    )
    by_group = split_leakage_audit(
        d.withColumn("split", split_assign(F.col("grp"), 0.8, 0.1)),
        "grp", "split",
    ).withColumn("mode", F.lit("group_keyed"))
    by_row = split_leakage_audit(
        d.withColumn("split", split_assign(F.col("doc_id"), 0.8, 0.1)),
        "grp", "split",
    ).withColumn("mode", F.lit("row_keyed"))
    return by_group.unionByName(by_row)


SPLIT_LEAKAGE_ORACLE = """
WITH d AS (SELECT doc_id, doc_id // 10 AS grp FROM documents),
g AS (
    SELECT grp,
           CASE WHEN md5(CAST(grp AS STRING)) < 'cccccccc' THEN 'train'
                WHEN md5(CAST(grp AS STRING)) < 'e6666666' THEN 'val'
                ELSE 'test' END AS split
    FROM d
),
r AS (
    SELECT grp,
           CASE WHEN md5(CAST(doc_id AS STRING)) < 'cccccccc' THEN 'train'
                WHEN md5(CAST(doc_id AS STRING)) < 'e6666666' THEN 'val'
                ELSE 'test' END AS split
    FROM d
),
pg AS (
    SELECT n_splits, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(nr) AS BIGINT) AS n_rows, n_splits > 1 AS leaky,
           'group_keyed' AS mode
    FROM (SELECT grp, CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
                 count(*) AS nr FROM g GROUP BY grp)
    GROUP BY n_splits
),
pr AS (
    SELECT n_splits, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(nr) AS BIGINT) AS n_rows, n_splits > 1 AS leaky,
           'row_keyed' AS mode
    FROM (SELECT grp, CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
                 count(*) AS nr FROM r GROUP BY grp)
    GROUP BY n_splits
)
SELECT * FROM pg UNION ALL SELECT * FROM pr
"""


# ---------------------------------------------------------------------------
# q_temperature_mixture — n^(1/T) rebalancing with closed-form
# waterfilling over per-source document counts.
# ---------------------------------------------------------------------------
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.mixture import temperature_mixture_plan

    src = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    )
    return temperature_mixture_plan(
        src, budget_frac=0.5, temperature=2.0
    )


TEMPERATURE_MIXTURE_ORACLE = """
WITH src AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
tot AS (
    SELECT sum(CAST(n_tokens AS DOUBLE)) AS bign,
           sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS z
    FROM src
),
base AS (
    SELECT source, n_tokens,
           pow(CAST(n_tokens AS DOUBLE), 0.5) / z AS s,
           0.5 * bign AS b
    FROM src CROSS JOIN tot
),
cum AS (
    SELECT *,
           CAST(n_tokens AS DOUBLE) / s AS cap,
           sum(CAST(n_tokens AS DOUBLE))
               OVER (ORDER BY CAST(n_tokens AS DOUBLE) / s, source) AS cumn,
           sum(s)
               OVER (ORDER BY CAST(n_tokens AS DOUBLE) / s, source) AS cums
    FROM base
),
flagged AS (
    SELECT *, cap * (1.0 - cums) <= b - cumn AS clamped FROM cum
),
lev AS (
    SELECT *,
           coalesce(
               max(CASE WHEN clamped
                        THEN (b - cumn) / (1.0 - cums) END) OVER (),
               b) AS lam
    FROM flagged
)
SELECT source, n_tokens,
       round(s, 9) AS share,
       round(CASE WHEN clamped THEN 1.0
                  ELSE lam * s / CAST(n_tokens AS DOUBLE) END, 9) AS rate,
       clamped,
       round(CASE WHEN clamped THEN 1.0
                  ELSE lam * s / CAST(n_tokens AS DOUBLE) END
             * CAST(n_tokens AS DOUBLE), 3) AS expected_tokens
FROM lev
"""


# ---------------------------------------------------------------------------
# q_generalize_k — numeric generalization of the props-k attribute to
# k-anonymity, reported as the post-enforcement audit + chosen width.
# ---------------------------------------------------------------------------
_GEN_K, _GEN_J = 40, 12


def q_generalize_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.anonymity import generalize_to_k, k_anonymity_audit

    k = F.get_json_object("props", "$.k").cast("bigint")
    ev = t(spark, sf_dir, "events").select(
        "event_type", k.alias("kval")
    )
    out, width = generalize_to_k(
        ev, ["event_type"], "kval", k=_GEN_K,
        base_width=1.0, max_doublings=_GEN_J,
    )
    return k_anonymity_audit(out, ["event_type", "kval"], k=_GEN_K).select(
        "*", F.lit(width).alias("width")
    )


GENERALIZE_K_ORACLE = f"""
WITH q AS (
    SELECT event_type, {_K_EXPR} AS kval FROM events
),
widths AS (
    SELECT CAST(pow(2, j) AS DOUBLE) AS w
    FROM (SELECT unnest(range(0, {_GEN_J} + 1)) AS j)
),
worst AS (
    SELECT w, min(c) AS mc
    FROM (SELECT w, event_type, floor(kval / w) AS b, count(*) AS c
          FROM q, widths WHERE kval IS NOT NULL GROUP BY 1, 2, 3)
    GROUP BY w
),
chosen AS (
    SELECT coalesce(min(w), CAST(pow(2, {_GEN_J}) AS DOUBLE)) AS w
    FROM worst WHERE mc >= {_GEN_K}
),
bucketed AS (
    SELECT event_type,
           CAST(floor(kval / c.w) * c.w AS BIGINT) AS kval
    FROM q CROSS JOIN chosen c
),
classes AS (
    SELECT event_type, kval, count(*) AS n
    FROM bucketed GROUP BY 1, 2
),
kept AS (
    SELECT b.event_type, b.kval
    FROM bucketed b
    JOIN classes c ON c.event_type IS NOT DISTINCT FROM b.event_type
                  AND c.kval IS NOT DISTINCT FROM b.kval
    WHERE c.n >= {_GEN_K}
),
audit AS (
    SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           class_size < {_GEN_K} AS risky
    FROM (SELECT CAST(count(*) AS BIGINT) AS class_size
          FROM kept GROUP BY event_type, kval)
    GROUP BY class_size
)
SELECT a.*, c.w AS width FROM audit a CROSS JOIN chosen c
"""


# ---------------------------------------------------------------------------
# q_dataset_diff_rows — END-TO-END commit/upsert/diff against a
# closed-form oracle: v1 = documents without the %10==0 keys, the update
# batch rewrites every %7==0 key, so the change feed is exactly
# {%7==0}: 'added' where %10==0 (absent from v1), 'changed' otherwise.
# ---------------------------------------------------------------------------
def q_dataset_diff_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dataset_versions import commit_version, diff_rows, upsert_version

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.col("source").alias("payload"),
        F.lit(1).cast("bigint").alias("seq"),
    )
    out = os.path.join(
        tempfile.mkdtemp(prefix="pcv3_diffface_"), "store"
    )
    commit_version(
        spark, docs.where(F.col("doc_id") % 10 != 0), out,
        ["lang"], ["doc_id", "payload", "seq"],
    )
    upd = docs.where(F.col("doc_id") % 7 == 0).select(
        "doc_id", "lang",
        F.lit("v2-payload").alias("payload"),
        F.lit(2).cast("bigint").alias("seq"),
    )
    upsert_version(spark, upd, out, "doc_id", "seq", "seq")
    return diff_rows(spark, out, 1, 2, "doc_id")


DATASET_DIFF_ROWS_ORACLE = """
SELECT doc_id,
       CASE WHEN doc_id % 10 = 0 THEN 'added' ELSE 'changed' END AS change,
       CAST(CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 1 END AS BIGINT)
           AS n_rows_a,
       CAST(1 AS BIGINT) AS n_rows_b
FROM documents WHERE doc_id % 7 = 0
"""


def staged_queries() -> dict:
    """name -> (callable, oracle_sql | None), the exact registry shapes."""
    return {
        "q_kn_doc_ppl": (q_kn_doc_ppl, KN_DOC_PPL_ORACLE),
        "q_t_closeness": (q_t_closeness, T_CLOSENESS_ORACLE),
        "q_t_closeness_ordered": (
            q_t_closeness_ordered, T_CLOSENESS_ORD_ORACLE,
        ),
        "q_dp_release": (q_dp_release, _dp_release_oracle()),
        "q_split_leakage": (q_split_leakage, SPLIT_LEAKAGE_ORACLE),
        "q_temperature_mixture": (
            q_temperature_mixture, TEMPERATURE_MIXTURE_ORACLE,
        ),
        "q_generalize_k": (q_generalize_k, GENERALIZE_K_ORACLE),
        "q_dataset_diff_rows": (q_dataset_diff_rows, DATASET_DIFF_ROWS_ORACLE),
        "q_ahash_groups": (q_ahash_groups, _ahash_groups_oracle()),
        "q_video_exact_groups": (
            q_video_exact_groups, VIDEO_EXACT_GROUPS_ORACLE,
        ),
    }


# ---------------------------------------------------------------------------
# q_ahash_groups — identical-hash image group representatives (the
# m(m-1)/2 pair expansion skipped; operators/phash.py::ahash_groups) on
# the SAME planted corpus as q_phash_image_dedup.
# ---------------------------------------------------------------------------
def q_ahash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.phash import ahash64, ahash_groups
    from .queries_multimodal import _spread, synth_png_media

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    planted = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "n_chars"
    )
    media = synth_png_media(_spread(docs.unionByName(planted), spark))
    return ahash_groups(ahash64(media))


def _ahash_groups_oracle() -> str:
    from .queries_multimodal import _PHASH_CORPUS_CTE, _payload_bytes_cte

    return f"""
WITH {_PHASH_CORPUS_CTE},
{_payload_bytes_cte("corpus")},
dims AS (SELECT doc_id, n, frame // 8 AS w FROM m),
cells AS (
    SELECT d.doc_id, r.r, j.j,
           (r.r * d.w + (j.j * d.w) // 8) AS idx
    FROM dims d
    CROSS JOIN (SELECT unnest(range(8)) AS r) r
    CROSS JOIN (SELECT unnest(range(8)) AS j) j
),
sampled AS (
    SELECT c.doc_id, c.r, c.j, COALESCE(b.b, 0) AS s
    FROM cells c
    LEFT JOIN bytes b ON b.doc_id = c.doc_id AND b.i = c.idx
),
bits AS (
    SELECT doc_id, r, j,
           CASE WHEN 64 * s > SUM(s) OVER (PARTITION BY doc_id)
                THEN 1 ELSE 0 END AS bit
    FROM sampled
),
h AS (
    SELECT doc_id AS media_id,
           CAST(SUM(CASE WHEN r >= 4 THEN bit * (1::BIGINT << ((r - 4) * 8 + j))
                    ELSE 0 END) AS BIGINT) AS hi,
           CAST(SUM(CASE WHEN r < 4 THEN bit * (1::BIGINT << (r * 8 + j))
                    ELSE 0 END) AS BIGINT) AS lo
    FROM bits GROUP BY doc_id
)
SELECT hi AS ahash_hi, lo AS ahash_lo,
       CAST(min(media_id) AS BIGINT) AS rep_id,
       CAST(count(DISTINCT media_id) AS BIGINT) AS n_ids
FROM h GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_video_exact_groups — byte-identical video copies collapsed by the
# ordered frame-hash sequence digest (the df-cap blind-spot closer);
# every 9th document's video is re-planted VERBATIM under a shifted id.
# ---------------------------------------------------------------------------
def q_video_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.videofp import video_exact_groups, video_frame_hashes
    from .queries_multimodal import _spread, synth_media

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    media = synth_media(docs).select("media_id", "content")
    copies = media.where(F.col("media_id") % 9 == 0).select(
        (F.col("media_id") + 10_000_000).alias("media_id"), "content"
    )
    frames = video_frame_hashes(_spread(media.unionByName(copies), spark))
    return video_exact_groups(frames)


VIDEO_EXACT_GROUPS_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text, n_chars FROM documents
    UNION ALL
    SELECT doc_id + 10000000, text, n_chars
    FROM documents WHERE doc_id % 9 = 0
),
m AS (
    SELECT doc_id, hex(encode(text)) AS h,
           CAST(octet_length(encode(text)) AS BIGINT) AS n,
           CAST((n_chars % 64 + 1) * 8 AS BIGINT) AS frame
    FROM corpus
),
bytes AS (
    SELECT doc_id, n, frame, i,
           (strpos('0123456789ABCDEF', substr(h, CAST(2 * i + 1 AS INT), 1)) - 1) * 16
         + (strpos('0123456789ABCDEF', substr(h, CAST(2 * i + 2 AS INT), 1)) - 1) AS b
    FROM (SELECT doc_id, h, n, frame, unnest(range(n)) AS i FROM m)
),
vids AS (SELECT doc_id, frame, n // frame AS nf FROM m WHERE frame > 0),
fidx AS (SELECT doc_id, frame, unnest(range(nf)) AS f FROM vids),
samples AS (
    SELECT fi.doc_id, fi.f, j.j, b.b AS s
    FROM fidx fi
    CROSS JOIN (SELECT unnest(range(64)) AS j) j
    JOIN bytes b ON b.doc_id = fi.doc_id
              AND b.i = fi.f * fi.frame + (j.j * fi.frame) // 64
),
sums AS (SELECT doc_id, f, SUM(s) AS tot FROM samples GROUP BY 1, 2),
bits AS (
    SELECT s.doc_id, s.f, s.j,
           CASE WHEN 64 * s.s > t.tot THEN 1 ELSE 0 END AS bit
    FROM samples s JOIN sums t ON t.doc_id = s.doc_id AND t.f = s.f
),
fh AS (
    SELECT doc_id, f,
           CAST(SUM(CASE WHEN j >= 32 THEN bit * (1::BIGINT << (j - 32))
                    ELSE 0 END) AS BIGINT) AS fh_hi,
           CAST(SUM(CASE WHEN j < 32 THEN bit * (1::BIGINT << j)
                    ELSE 0 END) AS BIGINT) AS fh_lo
    FROM bits GROUP BY 1, 2
),
seq AS (
    SELECT doc_id,
           md5(string_agg(
               CAST(f AS STRING) || ':' ||
               CAST(fh_hi AS STRING) || ':' || CAST(fh_lo AS STRING),
               ',' ORDER BY f)) AS seq_digest,
           CAST(count(*) AS BIGINT) AS n_frames
    FROM fh GROUP BY doc_id
)
SELECT seq_digest, CAST(min(doc_id) AS BIGINT) AS rep_id,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
       CAST(max(n_frames) AS BIGINT) AS n_frames
FROM seq GROUP BY seq_digest
"""
