"""Column-form APIs (per-row expressions) must agree with the
table-scale (exploded/aggregated) plans that the registry queries use."""

import pandas as pd
from pyspark.sql import functions as F


def _docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "der hund ist nicht der beste und das ist gut",
                    "a a a b",
                    "xy",  # too short for 3-shingles
                ],
            }
        )
    )


def test_quality_columns_match_exploded_query(spark):
    from scip_spark.functions.text import quality_columns, tokens

    docs = _docs(spark)
    cols = quality_columns("text")
    closed = docs.select("doc_id", *[c.alias(n) for n, c in cols.items()]).toPandas()
    row = closed.set_index("doc_id").loc[0]
    assert row.n_tokens == 9
    assert row.n_stopwords == 2  # 'the' twice
    assert abs(row.stopword_ratio - 2 / 9) < 1e-12


def test_lang_id_column(spark):
    from scip_spark.functions.text import lang_id

    out = _docs(spark).select("doc_id", lang_id("text").alias("l")).toPandas()
    got = dict(zip(out.doc_id, out.l))
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[3] == "unknown"


def test_minhash_signature_closed_form_matches_table(spark):
    from scip_spark.functions.dedup import (
        N_MINHASH,
        minhash_signature,
        minhash_table,
        shingles,
    )

    docs = _docs(spark).filter(F.col("doc_id") < 3)
    sig_cols = minhash_signature(shingles("text"))
    closed = docs.select(
        "doc_id", *[c.alias(f"mh_{j}") for j, c in enumerate(sig_cols)]
    ).toPandas().set_index("doc_id").sort_index()
    table = minhash_table(docs).toPandas().set_index("doc_id").sort_index()
    for j in range(N_MINHASH):
        assert (closed[f"mh_{j}"] == table[f"mh_{j}"]).all()


def test_simhash_closed_form_matches_table(spark):
    from scip_spark.functions.dedup import simhash, simhash_table

    docs = _docs(spark)
    closed = (
        docs.select("doc_id", simhash("text").alias("s"))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    table = simhash_table(docs).toPandas().set_index("doc_id").sort_index()
    assert (closed["s"] == table["simhash"]).all()
