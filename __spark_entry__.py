"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (revenue-by-nation: the SCIP
pipeline skeleton in relational form — scan → filter → broadcast-join
dims → partial+final agg) on sf0.001. ``queries()``/``oracle_sql()``
expose the full operator registry (scip_spark/queries.py and the
functions/* extension modules), each mapped to a SURVEY.md §2 operator.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scip_spark.entry_queries  # noqa: E402,F401  populates the registry
from scip_spark.queries import REGISTRY  # noqa: E402


def _pin_session_confs(spark: SparkSession) -> None:
    """Runtime confs the queries depend on, set on the driver's own
    session: nanos-timestamp parquet reads (events table) and a fixed
    UTC session timezone so timestamp formatting matches the oracle's
    naive timestamps regardless of host TZ."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    # nanos-timestamp parquet needs this (harmless otherwise); the
    # driver supplies its own session so set it here, not in session.py
    _pin_session_confs(spark)
    return REGISTRY["q5_local_supplier_volume"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each SQL-expressible query."""
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
