"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship top-k similarity search on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``vectordbfaiss_spark.registry`` (one entry per implemented SURVEY.md §2
operator, each with a DuckDB oracle unless listed rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vectordbfaiss_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exact cosine top-k search with text hydration — the Spark-native form
    of the reference's POST /search path (/root/reference/server.js:217-265).
    """
    return registry.queries()["topk_search"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
