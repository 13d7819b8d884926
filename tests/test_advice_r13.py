"""Round-13 ADVICE regressions: cross-engine edge cases the sf corpora
happen not to contain — short/NULL documents through the Gopher
repetition rules, single-token blocking keys in edit-distance dedup,
and the decimal hi/lo split near the 2^30 remainder boundary."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from scip_spark.oracle import compare
from scip_spark.queries import REGISTRY

import scip_spark.entry_queries  # noqa: F401  (fills REGISTRY)


def _run_both(spark, tmp_path, name: str, docs_rows, extra_tables=None):
    """Write an adversarial `documents` table, run the registry entry's
    Spark fn and its DuckDB oracle SQL on it, and compare()."""
    sf = str(tmp_path)
    spark.createDataFrame(
        docs_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS"
            f" SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
        )
        odf = con.execute(spec.sql).fetch_df()
    finally:
        con.close()
    res = compare(sdf, odf)
    assert res["rows_match"] and res["cols_match"] and res["values_match"], res
    return sdf


def test_repetition_rules_short_and_null_docs(spark, tmp_path):
    """Docs with <n tokens have no s{n} oracle row; NULL-text docs have
    no tokens at all. Both must keep=TRUE-or-FALSE (never NULL) and
    hash-match the Spark fold, which sees empty gram arrays."""
    rows = [
        (1, None, "en", "web", 0),                # NULL text
        (2, "", "en", "web", 0),                  # empty text
        (3, "one", "en", "web", 3),               # 1 token: no 2..10-grams
        (4, "a b c", "en", "web", 5),             # 3 tokens: no 5..10-grams
        (5, "x y " * 30, "en", "web", 120),       # long + heavy repetition
        (6, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12", "en", "web", 47),
    ]
    sdf = _run_both(spark, tmp_path, "quality_repetition_rules", rows)
    # every keep is a real boolean — the NULL-propagation bug returned NaN
    assert sdf["keep"].notna().all()
    by_id = sdf.set_index("doc_id")
    assert bool(by_id.loc[3, "keep"]) is True    # absent levels pass
    assert bool(by_id.loc[5, "keep"]) is False   # repetition fails rules


def test_editdistance_blocking_single_token_docs(spark, tmp_path):
    """A single-token doc and its trailing-space near-duplicate must
    land in the SAME block in both engines (the substring_index key
    kept the trailing space on the DuckDB side only)."""
    long_tok = "z" * 200
    rows = [
        (1, long_tok, "en", "web", 200),
        (2, long_tok + " ", "en", "web", 201),      # trailing space
        (3, "  " + long_tok, "en", "web", 202),     # leading spaces
        (4, "alpha beta " + "q" * 180, "en", "web", 191),
        (5, "alpha beta " + "q" * 179 + "r", "en", "web", 191),
        # zero-token docs: DuckDB array_to_string([]) is NULL (no join
        # match) where Spark array_join is '' — both must block on ''
        (6, " " * 40, "en", "web", 40),
        (7, " " * 42, "en", "web", 42),
    ]
    sdf = _run_both(spark, tmp_path, "dedup_editdistance_pairs", rows)
    pairs = {(int(a), int(b)) for a, b in zip(sdf["id_a"], sdf["id_b"])}
    # the whitespace-token key puts all three z-docs in one block
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert (4, 5) in pairs
    assert (6, 7) in pairs  # whitespace-only docs share the '' block


@pytest.mark.parametrize(
    "v",
    [
        5 * (1 << 30) + ((1 << 30) - 1),   # remainder at modulus-1
        5 * (1 << 30) + ((1 << 30) - 537), # inside the HALF_UP danger zone
        -(5 * (1 << 30)) - ((1 << 30) - 1),
        -(5 * (1 << 30)) - 1,
        (1 << 30),
        -(1 << 30),
        0,
        123,
        -123,
    ],
)
def test_decimal_hilo_split_identity(spark, v):
    """The exact-division hi/lo split used by embedding_covariance_fp:
    hi*2^30 + lo == v with 0 <= lo < 2^30, even where floor(v/2^30) on
    Spark's scale-6 HALF_UP decimal division is off by one."""
    df = spark.createDataFrame([(v,)], "v long")
    cov = F.col("v").cast("decimal(38,0)")
    half = F.lit(1 << 30).cast("decimal(38,0)")
    lo = ((cov % half) + half) % half
    row = df.select(
        ((cov - lo) / half).cast("long").alias("hi"),
        lo.cast("long").alias("lo"),
    ).first()
    assert 0 <= row.lo < (1 << 30)
    assert row.hi * (1 << 30) + row.lo == v
