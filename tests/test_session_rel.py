"""Session-shared relation store (queries.session_rel): the r15
materialized-view reuse that several registered operators derive from.
Wrong keying here would corrupt MANY oracles at once, so the store's
contract is pinned directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scip_spark.queries import _SHARED_REL, session_rel


@pytest.fixture(autouse=True)
def _clean_store():
    _SHARED_REL.clear()
    yield
    for df in _SHARED_REL.values():
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001
            pass
    _SHARED_REL.clear()


def test_build_once_per_kind(spark):
    calls = []

    def build():
        calls.append(1)
        return spark.range(10)

    a = session_rel(spark, "/sf/a", "k", build)
    b = session_rel(spark, "/sf/a", "k", build)
    assert a is b
    assert len(calls) == 1
    assert a.count() == 10


def test_keyed_by_sf_dir_and_kind(spark):
    a = session_rel(spark, "/sf/a", "k", lambda: spark.range(3))
    b = session_rel(spark, "/sf/b", "k", lambda: spark.range(5))
    c = session_rel(spark, "/sf/a", "other", lambda: spark.range(7))
    assert a.count() == 3 and b.count() == 5 and c.count() == 7
    assert len({id(a), id(b), id(c)}) == 3


def test_repersists_after_external_clear(spark):
    from pyspark.storagelevel import StorageLevel

    df = session_rel(spark, "/sf/a", "k", lambda: spark.range(4))
    df.count()  # materialize
    assert df.storageLevel != StorageLevel.NONE
    spark.catalog.clearCache()  # external actor drops the blocks
    again = session_rel(spark, "/sf/a", "k", lambda: spark.range(999))
    # same relation object, NOT a rebuild — values recompute correctly
    assert again is df
    assert again.count() == 4
    assert again.storageLevel != StorageLevel.NONE


def test_values_survive_reuse(spark):
    """A derived filter over the shared relation equals the direct
    computation — the exact contract the dedup/embedding families
    rely on (filter(min_band < k) == k-band candidate set)."""
    base = session_rel(
        spark,
        "/sf/vals",
        "k",
        lambda: spark.range(100).select(
            "id", (F.col("id") % 7).alias("band")
        ),
    )
    derived = base.filter(F.col("band") < 3)
    direct = spark.range(100).select("id", (F.col("id") % 7).alias("band")).filter(
        F.col("band") < 3
    )
    assert sorted(r.id for r in derived.collect()) == sorted(
        r.id for r in direct.collect()
    )
