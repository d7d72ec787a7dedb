"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline (H3-role cell encode -> spatial join
-> tiling with pixel decode) at sf0.001; ``queries`` / ``oracle_sql``
expose every implemented operator (SURVEY.md §2) with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from rsgislib_spark.queries import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rsgislib_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rsgislib_spark.oracles import ORACLES

    return dict(ORACLES)
