"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship geodesic-length query at sf0.001;
``queries()``/``oracle_sql()`` re-export the engine's registry
(pipeline_calculator_v3_spark.queries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipeline_calculator_v3_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_geodesic_length"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
