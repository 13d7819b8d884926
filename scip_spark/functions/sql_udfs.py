"""SQL-callable user functions: the real PySpark UDF/UDAF/UDTF trio.

The engine's primary extension surface is the typed registry
(functions/registry.py — the reference's config-name dispatch,
reference src/scip/main.py:140,160,167,216). This module covers the
OTHER contract a Spark shop expects: functions registered into the SQL
session so ``spark.sql`` queries can call them directly.

- ``scip_token_count``   scalar pandas UDF (Arrow-vectorized, one
                         Python call per batch — never per row)
- ``scip_gini``          grouped-agg pandas UDF (UDAF): Gini impurity
                         of a grouped value column
- ``scip_shingles``      Python UDTF (Spark 4): 1→N character
                         n-gram expander, LATERAL-joinable in SQL

All three are demonstrated and checked against column-algebra
equivalents in tests/test_sql_udfs.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

# one regex, shared with functions/text.py's BPE-ish segmentation
_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@pandas_udf(T.IntegerType())
def _token_count(text: pd.Series) -> pd.Series:
    return text.str.count(_TOKEN_RE).fillna(0).astype("int32")


@pandas_udf(T.DoubleType())
def _gini(v: pd.Series) -> float:
    counts = v.value_counts(normalize=True)
    return float(1.0 - (counts**2).sum())


@udtf(returnType="pos int, shingle string")
class _Shingles:
    """Character n-gram expander: one output row per shingle."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        for i in range(max(len(text) - n + 1, 0)):
            yield i, text[i : i + n]


def register_sql_functions(spark: SparkSession) -> None:
    """Install the trio into the session's SQL function catalog."""
    spark.udf.register("scip_token_count", _token_count)
    spark.udf.register("scip_gini", _gini)
    spark.udtf.register("scip_shingles", _Shingles)
