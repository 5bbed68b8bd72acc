"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`elipdotter_spark.entry` — the PySpark-native full-text
index + BM25 engine with elipdotter's query semantics (see SURVEY.md §2 for
the operator inventory each entry maps to).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from elipdotter_spark import entry as _entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: boolean retrieval + BM25 top-k on sf0.001."""
    return _entry.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _entry.queries()


def oracle_sql() -> dict[str, str]:
    return _entry.oracle_sql()
