"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side and
compares row count, column names, and an order-insensitive value
rendering. Used by tests and by ``tools/check_oracle.py`` so
mismatches are caught before the driver's CORRECTNESS run.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        # Dtype-faithful: a DuckDB HUGEINT surfacing as 939.0 must NOT match a
        # Spark bigint 939 — the driver's hash distinguishes them, and round 1
        # showed the old int-collapse here masked exactly that failure class.
        # float(v) strips numpy scalar wrappers so repr is engine-neutral.
        return repr(float(v))
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return rows


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> dict:
    out: dict[str, Any] = {
        "rows_spark": len(spark_pdf),
        "rows_oracle": len(oracle_pdf),
        "cols_spark": sorted(spark_pdf.columns),
        "cols_oracle": sorted(oracle_pdf.columns),
    }
    out["rows_match"] = out["rows_spark"] == out["rows_oracle"]
    out["cols_match"] = out["cols_spark"] == out["cols_oracle"]
    if not (out["rows_match"] and out["cols_match"]):
        out["values_match"] = False
        return out
    a = canonical_rows(spark_pdf)
    b = canonical_rows(oracle_pdf)
    out["values_match"] = a == b
    if not out["values_match"]:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        out["first_diffs"] = diffs[:5]
        out["n_diffs"] = len(diffs)
    return out


def check_query(spark, name: str, sf_dir: str) -> dict:
    """Run one registry entry against its oracle; returns compare() dict."""
    from scip_spark.queries import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.sql is None:
        # tensor-valued entries the SQL oracle can't express get a
        # committed golden-value check where one exists (scip_spark/
        # golden/) — same canonical-rows comparison, so kernel drift is
        # a hard value mismatch, not a rows-only shrug.
        from scip_spark.golden import load_golden

        gold = load_golden(name, sf_dir)
        if gold is not None:
            out = compare(sdf, gold)
            out["golden"] = True
            return out
        return {"rows_spark": len(sdf), "rows_only": True, "values_match": None}
    con = duck_connection(sf_dir)
    try:
        odf = con.execute(spec.sql).fetch_df()
    finally:
        con.close()
    return compare(sdf, odf)
