"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship extraction over deterministic synthetic transcripts
                  (smoke check at sf0.001 scale).
queries()      -- one entry per implemented operator from SURVEY.md section 2
                  plus the training-data-pipeline operators.
oracle_sql()   -- DuckDB-equivalent SQL for every relationally-expressible
                  query (same column names/rounding on both sides).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from action_pdf_accessibility_paddle_docker_spark.plans import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-turn main-content extraction over a transcripts table."""
    return Q.q_extract_transcripts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
