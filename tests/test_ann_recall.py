"""ANN self-certification: q_similarity_ann_recall's floors must hold on the
shared embeddings corpus, so the driver-visible row carries real signal
(VERDICT r03 'What's missing' #4)."""

from __future__ import annotations

from pipeline_calculator_v3_spark.queries import QUERIES
from pipeline_calculator_v3_spark.queries_textml import ANN_RECALL_FLOORS


def test_ann_recall_floors(spark, sf_dir):
    rows = {r.method: r for r in QUERIES["q_similarity_ann_recall"](spark, sf_dir).collect()}
    assert set(rows) == set(ANN_RECALL_FLOORS)
    for method, row in rows.items():
        assert row.n_queries == 8 and row.n_expected == 80
        assert row.meets_floor, (
            f"{method} recall@10 {row.recall_at_10:.3f} "
            f"< floor {ANN_RECALL_FLOORS[method]}"
        )
