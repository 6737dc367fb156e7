"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The catalog itself lives in :mod:`page_segmentation_spark.queries` — one
entry per implemented operator from SURVEY.md §2 plus the training-data
pipeline operators (dedup family, similarity search, text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship extraction on /root/testdata/sf0.001: parse -> score ->
    CC vote -> spans -> byte-exact main-content text."""
    from page_segmentation_spark.queries import QUERIES

    return QUERIES["extract_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from page_segmentation_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from page_segmentation_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
