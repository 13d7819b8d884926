"""Operators must survive empty inputs (a filter can legitimately kill
every record of a partition at scale)."""

from pyspark.sql import functions as F

from scip_spark.operators.features import extract_features
from scip_spark.operators.masking import apply_mask, compute_filters, get_mask
from scip_spark.operators.normalization import group_extents, quantile_normalization
from scip_spark.operators.segmentation import to_events


def test_empty_event_frame_through_stages(spark, full_events_df):
    empty = full_events_df.filter(F.lit(False))
    assert compute_filters(empty, "std").count() == 0
    assert get_mask(empty, "circle").count() == 0
    assert apply_mask(empty).count() == 0
    assert group_extents(empty).count() == 0
    assert quantile_normalization(empty).count() == 0
    assert to_events(empty).count() == 0
    assert extract_features(empty, nchannels=3).count() == 0


def test_all_null_pixels_through_features(spark, full_events_df):
    nulled = full_events_df.withColumn("pixels", F.lit(None).cast("array<float>"))
    out = extract_features(nulled, nchannels=3).toPandas()
    assert len(out) == 10  # metadata rows survive, features null


def test_empty_corpus_and_similarity_ops(spark):
    from scip_spark.functions.corpus import (
        hash_sample,
        mixture_upsample,
        pack_shards,
        quota_per_group,
        split_assign,
    )
    from scip_spark.functions.similarity import embedding_near_dup

    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert split_assign(docs).count() == 0
    assert hash_sample(docs, 0.5).count() == 0
    assert quota_per_group(docs).count() == 0
    assert mixture_upsample(docs, {"web": 2}).count() == 0
    assert pack_shards(docs, budget=1000).count() == 0
    from scip_spark.functions.corpus import chunk_tokens

    assert chunk_tokens(docs).count() == 0
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_near_dup(emb).count() == 0


def test_empty_inputs_round5_ops(spark):
    """Quantile sketch, distributed rank/selection, and boilerplate
    scrub must survive relations a filter emptied."""
    from pyspark.sql import functions as F

    from scip_spark.functions.dedup import boilerplate_scrub
    from scip_spark.functions.quantiles import qsketch
    from scip_spark.functions.ranking import (
        exact_values_at_fracs,
        with_global_rank,
        with_ntile,
    )

    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert boilerplate_scrub(docs).count() == 0

    empty_vals = spark.createDataFrame([], "k long, v long")
    assert qsketch(empty_vals, "v", "k", group=None).count() in (0, 1)
    # a 1-row result must carry an empty sketch
    for r in qsketch(empty_vals, "v", "k", group=None).collect():
        assert r.qsk == []
    assert exact_values_at_fracs(empty_vals, "v", [0.5]) == {}
    assert with_global_rank(empty_vals, "v", "k").count() == 0
    assert with_ntile(empty_vals, 4, "v", "k", "t").count() == 0


def test_empty_inputs_second_session_ops(spark):
    """Round-5 second-session operators on empty relations."""
    from scip_spark.advanced_queries import interval_self_overlap
    from scip_spark.functions.dedup import setsim_prefix_join
    from scip_spark.functions.text import phrase_match_positions

    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert setsim_prefix_join(docs, threshold=0.8).count() == 0
    assert (
        docs.select(phrase_match_positions("text", "a b c").alias("p")).count() == 0
    )
    iv = spark.createDataFrame([], "k long, id long, s long, e long")
    assert interval_self_overlap(iv, "k", "s", "e", "id").count() == 0

    # zero-token documents through setsim and phrase matching
    blank = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real tokens here")],
        ["doc_id", "text"],
    )
    assert setsim_prefix_join(blank, threshold=0.5).count() == 0
    got = {
        r.doc_id: r.p
        for r in blank.select(
            "doc_id", phrase_match_positions("text", "real tokens").alias("p")
        ).collect()
    }
    assert got == {1: [], 2: [], 3: [1]}


def test_empty_inputs_round8_ops(spark):
    """Dyadic histogram sketch + weighted systematic sampling on
    emptied relations: no rows, no division-by-zero, no crash."""
    from pyspark.sql import functions as F

    from scip_spark.functions.corpus import weighted_systematic_sample
    from scip_spark.functions.dyadic import (
        dyadic_merge,
        dyadic_quantile_cells,
        dyadic_sketch,
    )

    docs = spark.createDataFrame([], "doc_id long, g string, w long")
    cell = F.col("w")
    sk = dyadic_sketch(docs, cell, ["g"], k=8, max_level=16)
    assert sk.count() == 0
    assert dyadic_quantile_cells(sk, ["g"], [0.5]).count() == 0
    empty_parts = spark.createDataFrame(
        [], "g string, level int, cell bigint, cnt bigint"
    )
    assert dyadic_merge(empty_parts, ["g"], k=8, max_level=16).count() == 0
    assert weighted_systematic_sample(docs, 10, weight_col="w").count() == 0


def test_empty_input_kll(spark):
    """kll_build over an emptied relation: zero-count sketch (no rows
    collected), quantile() refuses rather than inventing a value."""
    import pytest

    from scip_spark.functions.kll import kll_build

    empty = spark.createDataFrame([], "v double")
    sk = kll_build(empty, "v")
    assert sk.count == 0 and sk._size() == 0
    with pytest.raises(ValueError):
        sk.quantile(0.5)


def test_empty_input_bloom(spark):
    """Bloom over an emptied relation: empty filter relation, probes
    all-miss, merge of empties stays empty."""
    from scip_spark.functions.bloom import (
        bloom_build,
        bloom_merge,
        bloom_probe,
        bloom_probe_inline,
    )

    empty = bloom_build(
        spark.createDataFrame([], "key string").filter("key IS NOT NULL"),
        "key",
    )
    assert empty.count() == 0
    assert bloom_merge(empty.unionByName(empty)).count() == 0
    probes = spark.createDataFrame([("a",), ("b",)], ["key"])
    assert not any(
        r["bloom_hit"] for r in bloom_probe(probes, "key", empty).collect()
    )
    assert not any(
        r["bloom_hit"]
        for r in bloom_probe_inline(probes, "key", empty).collect()
    )


def test_empty_input_round10_ops(spark):
    """Round-10 operators over emptied relations: temperature mixture
    and stratified sampling return zero rows (no divide-by-null blowup
    from the empty-agg totals row), auto-sized bloom falls back to the
    floor m, SQ8 handles an empty candidate side."""
    from scip_spark.functions.bloom import bloom_auto_m, bloom_build
    from scip_spark.functions.corpus import (
        stratified_exact_sample,
        temperature_mixture,
    )
    from scip_spark.functions.similarity import sq8_extents, sq8_topk

    docs = spark.createDataFrame([], "source string, n_chars bigint")
    assert temperature_mixture(docs).count() == 0

    d2 = spark.createDataFrame([], "doc_id string, lang string")
    assert stratified_exact_sample(d2, 10).count() == 0

    keys = spark.createDataFrame([], "key string")
    assert bloom_auto_m(keys, "key") == 1 << 10  # n=0 floor
    assert bloom_build(keys, "key", m="auto").count() == 0

    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    assert sq8_extents(emb) == []
    q = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(2)
    assert sq8_topk(q, emb, k=3).count() == 0


def test_empty_input_round11_ops(spark):
    """Round-11 operators over emptied relations: sharded bloom builds
    an empty (stamped) relation whose probes all-miss, the k-center
    coreset of nothing is the empty selection, and DSIR's rate/rollup
    pipeline returns zero rows without divide-by-null blowups."""
    from scip_spark.functions.bloom import (
        bloom_build_sharded,
        bloom_probe_sharded,
        bloom_probe_sharded_inline,
    )
    from scip_spark.functions.similarity import kcenter_coreset

    keys = spark.createDataFrame([], "key string")
    empty = bloom_build_sharded(keys, "key")
    assert empty.count() == 0
    assert set(empty.columns) == {"shard", "word", "bits", "m", "s"}
    probes = spark.createDataFrame([("a",), ("b",)], ["key"])
    assert not any(
        r["bloom_hit"]
        for r in bloom_probe_sharded(probes, "key", empty).collect()
    )
    assert not any(
        r["bloom_hit"]
        for r in bloom_probe_sharded_inline(probes, "key", empty).collect()
    )

    emb = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert kcenter_coreset(emb, k=3).count() == 0

    import os

    import pandas as pd

    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.functions.quality_queries import dsir_importance_weights

    d = "/tmp/empty_dsir_docs"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype="object"),
         "lang": pd.Series([], dtype="object"),
         "source": pd.Series([], dtype="object"),
         "n_chars": pd.Series([], dtype="int64")}
    ).to_parquet(f"{d}/documents.parquet")
    assert dsir_importance_weights(spark, d).count() == 0


def test_empty_inputs_round12_ops(spark, tmp_path):
    """Round-12 registry entries must survive EMPTY source tables (a
    filter can kill every row): the rule bundles, EWMA, JL/covariance,
    calibration, ES sampling, length batching, repetition rules, and
    keep-best dedup all return empty (or a degenerate-but-defined
    summary) instead of raising."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    sf = str(tmp_path)
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string, "
        "o_clerk string, o_shippriority int, o_comment string",
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [], "l_orderkey long, l_extendedprice double, l_quantity double"
    ).write.parquet(f"{sf}/lineitem.parquet")

    empty_ok = [
        "quality_gopher_rules",
        "quality_c4_filters",
        "quality_repetition_rules",
        "quality_score_calibration",
        "trigram_backoff_scores",
        "ewma_anomaly_days",
        "embedding_jl_projection",
        "embedding_covariance_fp",
        "ann_jl_topk",
        "corpus_es_sample",
        "corpus_length_batches",
        "dedup_keep_best_quality",
        "dedup_editdistance_pairs",
        "video_frame_plan",
        "balanced_range_splits",
    ]
    for name in empty_ok:
        assert REGISTRY[name].fn(spark, sf).count() == 0, name


def test_empty_inputs_round13_ops(spark, tmp_path):
    """Round-13 registry entries on EMPTY source tables: the substring
    family, decontamination, the embedding graph/keep/MMR ops and the
    governance audits all return empty (or a defined zero/expected-only
    summary) instead of raising."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    sf = str(tmp_path)
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate date",
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [], "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string"
    ).write.parquet(f"{sf}/customer.parquet")

    empty_ok = [
        "dedup_substring_spans",
        "dedup_substring_spans_stream",
        "dedup_substring_clean",
        "decontaminate_train_spans",
        "knn_graph_mutual",
        "embedding_semantic_keep",
        "mmr_diversified_topk",
        "dp_randomized_response",
        "pii_luhn_audit",
    ]
    for name in empty_ok:
        assert REGISTRY[name].fn(spark, sf).count() == 0, name
    # Benford: an empty table still reports the 9 expected-digit rows,
    # all zero
    rows = REGISTRY["benford_first_digit_audit"].fn(spark, sf).collect()
    assert len(rows) == 9
    assert all(r["n_obs"] == 0 and r["exp_cnt_fp"] == 0 for r in rows)


def test_empty_inputs_round14_ops(spark):
    """r14 ops: the graph-ANN build/search and the FUSED multi-branch
    pipeline must survive relations a filter emptied (kcenter finds no
    seed -> no entry points -> empty beam; the fused stats agg sees
    mu=None and skips the soft delete)."""
    from scip_spark.functions.similarity import graph_topk, neighbor_graph
    from scip_spark.plans.imaging_bench import (
        NCHANNELS,
        PIPELINE_CONFIG,
        synthetic_images,
    )
    from scip_spark.plans.pipeline import build

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert neighbor_graph(emb).count() == 0
    assert graph_topk(emb, emb, k=5).count() == 0

    cfg = dict(PIPELINE_CONFIG)
    cfg["feature_extraction"] = {"nchannels": NCHANNELS, "families": ["bbox"]}
    src = synthetic_images(spark, 100).filter(F.lit(False))
    assert build(src, cfg).count() == 0
