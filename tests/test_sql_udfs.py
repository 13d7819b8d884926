"""SQL-registered UDF / UDAF / UDTF: callable from spark.sql and
agreeing with the column-algebra equivalents."""

import pytest
from pyspark.sql import functions as F

from scip_spark.functions.sql_udfs import register_sql_functions

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register_sql_functions(spark)
    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView(
        "docs_udf"
    )


def test_scalar_pandas_udf_from_sql(spark):
    got = spark.sql(
        "SELECT doc_id, scip_token_count(text) AS n FROM docs_udf"
    ).collect()
    want = {
        r.doc_id: r.n
        for r in spark.table("docs_udf")
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all(
                    "text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
                )
            ).alias("n"),
        )
        .collect()
    }
    assert len(got) > 0
    for r in got:
        assert r.n == want[r.doc_id]


def test_grouped_agg_udaf_from_sql(spark):
    got = {
        r.lang: r.g
        for r in spark.sql(
            "SELECT lang, scip_gini(source) AS g FROM docs_udf GROUP BY lang"
        ).collect()
    }
    pdf = spark.table("docs_udf").select("lang", "source").toPandas()
    for lang, grp in pdf.groupby("lang"):
        p = grp.source.value_counts(normalize=True)
        assert got[lang] == pytest.approx(1.0 - (p**2).sum())


def test_python_udtf_lateral_join(spark):
    rows = spark.sql(
        """
        SELECT d.doc_id, s.pos, s.shingle
        FROM docs_udf d, LATERAL scip_shingles(substr(d.text, 1, 12), 5) s
        WHERE d.doc_id < 3
        """
    ).collect()
    texts = {
        r.doc_id: r.text[:12]
        for r in spark.table("docs_udf").filter(F.col("doc_id") < 3).collect()
    }
    want = {
        (did, i, t[i : i + 5])
        for did, t in texts.items()
        for i in range(max(len(t) - 4, 0))
    }
    assert {(r.doc_id, r.pos, r.shingle) for r in rows} == want and len(want) > 0


def test_pandas_on_spark_api_surface(spark):
    """pyspark.pandas (the pandas API on Spark) runs against the same
    session and must agree with the SQL aggregate — the third user
    entry point (DataFrame, SQL, pandas API) the engine exposes."""
    import pyspark.pandas as ps
    from pyspark.sql import functions as F

    sdf = spark.range(100).select(
        (F.col("id") % 5).alias("g"), (F.col("id") * 2).alias("v")
    )
    psdf = sdf.pandas_api()
    got = psdf.groupby("g")["v"].sum().sort_index().to_dict()
    want = {
        r.g: r.s
        for r in sdf.groupBy("g").agg(F.sum("v").alias("s")).collect()
    }
    assert got == want
    # roundtrip back to a Spark DataFrame
    assert psdf.to_spark().count() == 100
