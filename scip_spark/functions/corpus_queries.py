"""Oracle-paired queries for the corpus-construction operators.

Every assignment is md5-deterministic, so the DuckDB SQL reproduces the
Spark result bit-exactly: same hash, same integer arithmetic, same
ordering. The pack_shards oracle is ONE global window — the point of
the comparison is that the distributed two-level cumsum (bucket-local
window + broadcast offsets) computes the identical shard ids.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scip_spark.functions.corpus import (
    SPLIT_BUCKETS,
    hash_sample,
    mixture_upsample,
    pack_shards,
    quota_per_group,
    split_assign,
    temperature_mixture,
)
from scip_spark.queries import register, tbl

# DuckDB twin of corpus.hash_bucket(seed|key)
_BUCKET = (
    "CAST(('0x' || substr(md5('{seed}|' || CAST({key} AS VARCHAR)), 1, 12)) "
    f"AS BIGINT) % {SPLIT_BUCKETS}"
)


@register(
    "corpus_split_assign",
    f"""
    SELECT doc_id, lang, source,
           CASE WHEN {_BUCKET.format(seed='split-v1', key='doc_id')} < 9800 THEN 'train'
                WHEN {_BUCKET.format(seed='split-v1', key='doc_id')} < 9900 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="deterministic hash-based train/val/test split (stable under backfill)",
)
def corpus_split_assign(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return split_assign(docs).select("doc_id", "lang", "source", "split")


@register(
    "corpus_hash_sample",
    f"""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE {_BUCKET.format(seed='sample-v1', key='doc_id')} < 1000
    """,
    doc="deterministic 10%% hash sample (rerun-stable, join-correlated)",
)
def corpus_hash_sample(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return hash_sample(docs, fraction=0.10).select("doc_id", "lang", "n_chars")


@register(
    "corpus_lang_quota",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_BUCKET.format(seed='quota-v1', key='doc_id')}, doc_id
             ) AS qrank
      FROM documents
    ) WHERE qrank <= 50
    """,
    doc="per-language cap: unbiased hash-ordered quota subset",
)
def corpus_lang_quota(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return quota_per_group(docs, group_col="lang", cap=50).select("doc_id", "lang")


_EPOCHS = {"web": 1, "wiki": 3, "books": 2}


@register(
    "corpus_mixture_upsample",
    f"""
    SELECT doc_id, source,
           CAST(unnest(generate_series(1,
             CASE source {' '.join(f"WHEN '{g}' THEN {n}" for g, n in sorted(_EPOCHS.items()))}
                  ELSE 1 END)) AS INT) AS epoch
    FROM documents
    """,
    doc="mixture construction: integer-epoch upsampling per source (map-side explode)",
)
def corpus_mixture_upsample(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return mixture_upsample(docs, _EPOCHS).select("doc_id", "source", "epoch")


_STRAT_K = 60
# DuckDB twin of the strat-v1 hash order
_STRAT_ORDER = _BUCKET.format(seed="strat-v1", key="doc_id")


@register(
    "corpus_stratified_eval",
    f"""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM c),
    seats AS (
      SELECT lang, ({_STRAT_K} * c) // total AS base,
             ({_STRAT_K} * c) % total AS rem
      FROM c, t
    ),
    bt AS (SELECT CAST(SUM(base) AS BIGINT) AS base_tot FROM seats),
    quotas AS (
      SELECT lang,
             base + CASE WHEN ROW_NUMBER()
                            OVER (ORDER BY rem DESC, lang ASC)
                          <= {_STRAT_K} - base_tot
                    THEN 1 ELSE 0 END AS quota
      FROM seats, bt
    ),
    ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_STRAT_ORDER} ASC, doc_id ASC
             ) AS srank
      FROM documents
    )
    SELECT r.doc_id, r.lang
    FROM ranked r JOIN quotas q USING (lang)
    WHERE r.srank <= q.quota
    ORDER BY r.lang, r.doc_id
    """,
    doc="EXACTLY-K stratified eval set via Hamilton largest-remainder "
    "apportionment: floor(K*c_g/C) seats per lang plus residual seats "
    "to the largest (K*c_g) mod C remainders, members chosen by "
    "deterministic md5 order — every step integer/md5 arithmetic, "
    "hash-matched cross-engine. Plan: counts are one map-side-combined "
    "agg to G rows; the apportionment window is partition-less over "
    "that BOUNDED G-row relation (whitelisted with proof in "
    "tests/test_plans.py); the data-scale rank is keyed by lang with "
    "a literal-K rank filter that triggers WindowGroupLimit map-local "
    "pushdown before the exchange.",
)
def corpus_stratified_eval(spark, sf_dir):
    from scip_spark.functions.corpus import stratified_exact_sample

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_exact_sample(docs, _STRAT_K)


_TEMP_MIX_SQL = """
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY 1
    ),
    q AS (
      SELECT *, CAST(floor(sqrt(CAST(chars AS DOUBLE)) * 256) AS BIGINT)
               AS sqrtfp
      FROM s
    ),
    t AS (
      SELECT CAST(SUM(sqrtfp) AS BIGINT) AS t_sqrt,
             CAST(SUM(chars) AS BIGINT) AS t_chars
      FROM q
    )
    SELECT source, n_docs, chars,
           -- HUGEINT intermediates mirror Spark's DECIMAL(38,0): the
           -- epochs numerator ~1024*C^1.5 passes int64 at ~40 GB of
           -- chars; quotients are bounded so BIGINT outputs are exact
           CAST((sqrtfp::HUGEINT * 1073741824) // t_sqrt AS BIGINT)
             AS weight_fp,
           CAST((4::HUGEINT * sqrtfp * t_chars)
                // (t_sqrt::HUGEINT * chars) AS BIGINT) AS epochs_x4
    FROM q, t ORDER BY source
    """


@register(
    "corpus_temperature_mix",
    _TEMP_MIX_SQL,
    doc="temperature-sampled mixture weights at T=2 (α=0.5 — the "
    "multilingual-pretraining flattening): per-source weight ∝ "
    "√(token mass). √ is the ONE power IEEE requires correctly "
    "rounded, so both engines take the identical double; everything "
    "downstream is exact integer arithmetic (floor to a power-of-two "
    "grid, order-free integer sums, integer division) — the weights "
    "AND quarter-epoch upsample factors hash-match bit-exactly. Plan: "
    "one map-side-combined groupBy to G rows + a 1-row broadcast; no "
    "data-scale shuffle at any corpus size.",
)
def corpus_temperature_mix(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return temperature_mixture(docs)


@register(
    "corpus_temperature_mix_stream",
    _TEMP_MIX_SQL,
    doc="corpus_temperature_mix with its per-source size statistics "
    "built by STRUCTURED STREAMING: each micro-batch contributes "
    "(source, n_docs, chars) count partials, folded through an "
    "integer-sum merge (order-free and exact — counts are the "
    "simplest mergeable statistic), then the shared "
    "mixture_weights_from_sizes tail computes identical weights, so "
    "the streaming entry shares the batch oracle SQL verbatim and "
    "the driver hash-checks streamed mixture weights. Extends the "
    "driver-checked streaming family (bloom/dyadic/CMS/KMV) to the "
    "corpus-construction operators.",
)
def corpus_temperature_mix_stream(spark, sf_dir):
    import shutil

    from scip_spark.functions.corpus import mixture_weights_from_sizes
    from scip_spark.functions.sketch_queries import (
        _split_to_tmp,
        _stream_fold,
    )

    docs = tbl(spark, sf_dir, "documents").select("source", "n_chars")
    tmp = _split_to_tmp(docs, key="n_chars")
    try:
        sizes = _stream_fold(
            spark,
            tmp,
            "source string, n_chars bigint",
            lambda bdf: bdf.groupBy("source").agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars"),
            ),
            lambda parts: parts.groupBy("source").agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                F.sum("chars").cast("long").alias("chars"),
            ),
            "source string, n_docs bigint, chars bigint",
            lambda df: [
                (r["source"], r["n_docs"], r["chars"]) for r in df.collect()
            ],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return mixture_weights_from_sizes(sizes)


_PACK_BUDGET = 50_000


@register(
    "corpus_pack_shards",
    f"""
    WITH ordered AS (
      SELECT doc_id, n_chars,
             {_BUCKET.format(seed='pack-v1', key='doc_id')} AS ok
      FROM documents
    )
    SELECT doc_id, n_chars,
           CAST((SUM(n_chars) OVER (
              ORDER BY ok, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) - n_chars) // {_PACK_BUDGET} AS BIGINT) AS shard_id
    FROM ordered
    """,
    doc="token-budget shard packing: distributed prefix sum == single global window",
)
def corpus_pack_shards(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return pack_shards(docs, budget=_PACK_BUDGET).select(
        "doc_id", "n_chars", "shard_id"
    )


_CHUNK_W, _CHUNK_S = 64, 48
_CHUNK_SQL_TOKS = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"


@register(
    "corpus_chunk_windows",
    f"""
    WITH t AS (
      SELECT doc_id, {_CHUNK_SQL_TOKS} AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
    ),
    c AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0,
               CASE WHEN n <= {_CHUNK_W} THEN 0
                    ELSE (n - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S} END
             )) AS chunk_id
      FROM s
    )
    SELECT doc_id, chunk_id,
           len(list_slice(toks, chunk_id*{_CHUNK_S}+1, chunk_id*{_CHUNK_S}+{_CHUNK_W})) AS chunk_n_tokens,
           array_to_string(list_slice(toks, chunk_id*{_CHUNK_S}+1, chunk_id*{_CHUNK_S}+{_CHUNK_W}), ' ') AS chunk_text
    FROM c
    """,
    doc=f"context-window chunking: overlapping {_CHUNK_W}-token windows "
    f"at stride {_CHUNK_S} (training-sequence prep); pure per-row "
    "explode, zero shuffle at any scale",
)
def corpus_chunk_windows(spark, sf_dir):
    from scip_spark.functions.corpus import chunk_tokens

    docs = tbl(spark, sf_dir, "documents")
    return chunk_tokens(docs, window=_CHUNK_W, stride=_CHUNK_S)


_CHUNK_PACK_BUDGET = 512


@register(
    "corpus_chunk_pack",
    f"""
    WITH t AS (
      SELECT doc_id, {_CHUNK_SQL_TOKS} AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
    ),
    c AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0,
               CASE WHEN n <= {_CHUNK_W} THEN 0
                    ELSE (n - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S} END
             )) AS chunk_id
      FROM s
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             len(list_slice(toks, chunk_id*{_CHUNK_S}+1, chunk_id*{_CHUNK_S}+{_CHUNK_W})) AS chunk_n_tokens,
             doc_id || ':' || chunk_id AS key
      FROM c
    ),
    keyed AS (
      SELECT *, {_BUCKET.format(seed='pack-v1', key='key')} AS ok FROM chunks
    )
    SELECT doc_id, chunk_id, CAST(chunk_n_tokens AS BIGINT) AS chunk_n_tokens,
           CAST((SUM(chunk_n_tokens) OVER (
              ORDER BY ok, key
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) - chunk_n_tokens) // {_CHUNK_PACK_BUDGET} AS BIGINT) AS shard_id
    FROM keyed
    """,
    doc=f"end-to-end trainer prep: documents → overlapping "
    f"{_CHUNK_W}-token chunks → {_CHUNK_PACK_BUDGET}-token shards via "
    "the distributed prefix sum; the oracle's single global window "
    "must equal the bucketed two-level cumsum",
)
def corpus_chunk_pack(spark, sf_dir):
    from pyspark.sql import functions as F

    from scip_spark.functions.corpus import chunk_tokens, pack_shards

    docs = tbl(spark, sf_dir, "documents")
    chunks = chunk_tokens(docs, window=_CHUNK_W, stride=_CHUNK_S).select(
        "doc_id",
        "chunk_id",
        F.col("chunk_n_tokens").cast("long").alias("chunk_n_tokens"),
        F.concat_ws(":", "doc_id", "chunk_id").alias("key"),
    )
    packed = pack_shards(
        chunks, budget=_CHUNK_PACK_BUDGET, cost_col="chunk_n_tokens", key_col="key"
    )
    return packed.select("doc_id", "chunk_id", "chunk_n_tokens", "shard_id")


_WS_K = 500


@register(
    "corpus_weighted_sample",
    f"""
    WITH w AS (
      SELECT doc_id, GREATEST(CAST(n_chars AS BIGINT), 1) AS w,
             {_BUCKET.format(seed='wsample-v1', key='doc_id')} AS ok
      FROM documents
    ),
    cum AS (
      SELECT doc_id, w,
             SUM(w) OVER (ORDER BY ok, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS c,
             SUM(w) OVER () AS total
      FROM w
    ),
    m AS (
      SELECT doc_id, w,
             (CASE WHEN {2 * _WS_K} * c <= total THEN 0
                   ELSE LEAST({_WS_K}, ({2 * _WS_K} * c - total - 1)
                              // (2 * total) + 1) END)
             - (CASE WHEN {2 * _WS_K} * (c - w) <= total THEN 0
                     ELSE LEAST({_WS_K}, ({2 * _WS_K} * (c - w) - total - 1)
                                // (2 * total) + 1) END)
             AS multiplicity
      FROM cum
    )
    SELECT doc_id, w, CAST(multiplicity AS BIGINT) AS multiplicity
    FROM m WHERE multiplicity > 0
    """,
    doc="exact weight-proportional corpus sampling (systematic / SUS on "
    "the deterministic hash order): k picks with multiplicity, every "
    "doc floor-or-ceil of its expected share, pure BIGINT arithmetic "
    "(no engine-libm keys) — distributed prefix sum == one global "
    "window in the oracle",
)
def corpus_weighted_sample(spark, sf_dir):
    from pyspark.sql import functions as F

    from scip_spark.functions.corpus import weighted_systematic_sample

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.greatest(F.col("n_chars").cast("long"), F.lit(1)).alias("w")
    )
    return weighted_systematic_sample(docs, _WS_K, weight_col="w").select(
        "doc_id", "w", F.col("multiplicity").cast("long").alias("multiplicity")
    )


_ORDER_SEED, _ORDER_STEP = "order-v1", 128
_ORDER_H = (
    "CAST(('0x' || substr(md5('order-v1|' || CAST(doc_id AS VARCHAR)), 1, 12)) "
    "AS BIGINT)"
)


@register(
    "corpus_training_order",
    f"""
    WITH h AS (SELECT doc_id, {_ORDER_H} AS hk FROM documents)
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY hk, doc_id) AS BIGINT) AS order_id,
           CAST((ROW_NUMBER() OVER (ORDER BY hk, doc_id) - 1)
                // {_ORDER_STEP} AS BIGINT) AS step_shard
    FROM h ORDER BY order_id
    """,
    doc="deterministic resumable training order: every document gets a "
    "global 1-based order_id by md5(seed|doc_id) — a seeded global "
    "shuffle that is a pure function of (seed, key), so a restarted "
    "job reproduces the identical permutation and `WHERE step_shard "
    ">= k` resumes mid-epoch without replaying. The rank comes from "
    "the distributed construction (functions/ranking.py) — no "
    "single-partition window over the corpus, unlike the oracle's "
    "ROW_NUMBER, which is the point: identical output, cluster-safe "
    "plan.",
)
def corpus_training_order(spark, sf_dir):
    from scip_spark.functions.ranking import with_global_rank

    docs = tbl(spark, sf_dir, "documents").select("doc_id")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(_ORDER_SEED), F.col("doc_id").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    ranked = with_global_rank(
        docs.withColumn("hk", h), "hk", "doc_id", out_col="order_id"
    )
    return ranked.select(
        "doc_id",
        F.col("order_id").cast("long").alias("order_id"),
        ((F.col("order_id") - 1) / _ORDER_STEP).cast("long").alias("step_shard"),
    )


_DRIFT_GRID = 1 << 20


_DRIFT_SQL = f"""
    WITH snap AS (
      SELECT source, n_chars,
             {_BUCKET.format(seed='drift-v1', key='doc_id')} % 2 AS half
      FROM documents
    ),
    cells AS (
      SELECT source,
             -- exact-integer floor(log2): bit length via the binary
             -- string (no libm log2 — Spark's Log2 is an ln-ratio,
             -- DuckDB's std::log2; last-ulp drift could flip a floor
             -- at bucket boundaries)
             CAST(length(bin(GREATEST(n_chars, 1))) - 1 AS BIGINT) AS bkt,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM snap GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM cells GROUP BY 1
    ),
    contrib AS (
      SELECT c.source, c.a, c.b,
             -- two-step fixed-point: q = D*2^20 // (na*nb) is bounded by
             -- 2^21 (|D| <= na*nb), so q*D // (a+b) never passes int128.
             -- The HUGEINT cast is INSIDE the multiply (a::HUGEINT*nb),
             -- not on ABS's result — cast-after-ABS would evaluate the
             -- product in BIGINT and overflow at ~3e9-row snapshots,
             -- diverging from the Spark decimal(38,0) intermediates.
             ((ABS(c.a::HUGEINT * t.nb - c.b::HUGEINT * t.na) * {_DRIFT_GRID})
                // (t.na::HUGEINT * t.nb))
               * ABS(c.a::HUGEINT * t.nb - c.b::HUGEINT * t.na)
               // (c.a + c.b) AS x
      FROM cells c JOIN tot t USING (source)
      WHERE t.na > 0 AND t.nb > 0
    )
    SELECT c.source,
           CAST(SUM(c.a) AS BIGINT) AS n_a,
           CAST(SUM(c.b) AS BIGINT) AS n_b,
           CAST(SUM(x) AS BIGINT) AS chi2_fp
    FROM contrib c GROUP BY 1 ORDER BY 1
    """


@register(
    "corpus_drift_chi2",
    _DRIFT_SQL,
    doc="two-snapshot distribution-DRIFT monitor (the ingestion health "
    "check a 100-TB pipeline runs between batches): per source, the "
    "two-sample chi-square statistic between snapshot A and snapshot "
    "B (md5 hash-half of doc_id as the stand-in batch split — doc_id "
    "PARITY would correlate perfectly with the source assignment in "
    "this testdata) over log2-length "
    "cells, via the all-integer identity chi2 = sum_i D_i^2 / "
    "(Na*Nb*(a_i+b_i)) with D_i = a_i*Nb - b_i*Na. Fixed-point on the "
    "2^20 grid in TWO divisions per cell — q = |D|*2^20 div (Na*Nb) "
    "is bounded by 2^21 since |D| <= Na*Nb, so q*|D| div (a_i+b_i) "
    "stays inside int128 even at 10^10-row snapshots where a "
    "single-division D^2 numerator (~N^4) would overflow; both "
    "engines floor identically at each step so the statistic "
    "hash-matches. The length bucket is the exact-integer bit length "
    "(length(bin(n))-1, n_chars >= 1 clamped) — no libm log2 in "
    "either engine. Scale shape: one map-side-combined agg "
    "to (source x ~40 length-bucket) cells, a G-row totals join, "
    "projection — no data-scale shuffle beyond the cell aggregation.",
)
def corpus_drift_chi2(spark, sf_dir):
    cells = _drift_cells(tbl(spark, sf_dir, "documents"))
    return _drift_tail(cells)


def _drift_cells(docs):
    """(source, log2-length bucket, a, b) — the bounded cell counts
    (G sources x ~40 buckets), a mergeable statistic: integer sums
    fold exactly across any partition of the corpus."""
    from scip_spark.functions.corpus import hash_bucket

    snap = docs.select(
        "source",
        "n_chars",
        (hash_bucket(F.col("doc_id"), "drift-v1") % 2).alias("half"),
    )
    return snap.groupBy(
        "source",
        # exact-integer floor(log2(n)) = bit_length(n) - 1 via the
        # binary-string length: Spark's Log2 is an ln-ratio while
        # DuckDB uses std::log2, so a float floor could flip in the
        # last ulp at bucket boundaries; bin() is pure integer in both
        (F.length(F.bin(F.greatest(F.col("n_chars"), F.lit(1)))) - 1)
        .cast("long").alias("bkt"),
    ).agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long").alias("a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long").alias("b"),
    )


def _drift_tail(cells):
    """chi-square pricing over a folded cell relation — shared by the
    batch op and its streaming twin."""
    tot = cells.groupBy("source").agg(
        F.sum("a").cast("long").alias("na"),
        F.sum("b").cast("long").alias("nb"),
    )
    contrib = (
        cells.join(tot, "source")
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "source",
            "a",
            "b",
            F.expr(
                f"(abs(cast(a as decimal(38,0)) * nb - cast(b as decimal(38,0)) * na)"
                f" * {_DRIFT_GRID}"
                f" div (cast(na as decimal(38,0)) * nb))"
                f" * abs(cast(a as decimal(38,0)) * nb - cast(b as decimal(38,0)) * na)"
                f" div (a + b)"
            ).alias("x"),
        )
    )
    return (
        contrib.groupBy("source")
        .agg(
            F.sum("a").cast("long").alias("n_a"),
            F.sum("b").cast("long").alias("n_b"),
            F.sum("x").cast("long").alias("chi2_fp"),
        )
    )


@register(
    "corpus_drift_chi2_stream",
    _DRIFT_SQL,
    doc="corpus_drift_chi2 with its (source, length-bucket, a, b) CELL "
    "COUNTS built by STRUCTURED STREAMING: each micro-batch "
    "contributes cell-count partials folded through an integer-sum "
    "merge (order-free and exact), then the shared _drift_tail prices "
    "the identical chi-square — tenth driver-hash-checked streaming "
    "entry, batch oracle shared verbatim. The realistic shape: drift "
    "cells accrete per ingestion batch; the alarm query is a bounded "
    "G-row pass over the current cells.",
)
def corpus_drift_chi2_stream(spark, sf_dir):
    import shutil

    from scip_spark.functions.sketch_queries import (
        _split_to_tmp,
        _stream_fold,
    )

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    tmp = _split_to_tmp(docs, key="doc_id")
    try:
        cells = _stream_fold(
            spark,
            tmp,
            "doc_id bigint, source string, n_chars bigint",
            _drift_cells,
            lambda parts: parts.groupBy("source", "bkt").agg(
                F.sum("a").cast("long").alias("a"),
                F.sum("b").cast("long").alias("b"),
            ),
            "source string, bkt bigint, a bigint, b bigint",
            lambda df: [
                (r["source"], r["bkt"], r["a"], r["b"]) for r in df.collect()
            ],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return _drift_tail(cells)


_ES_K = 50
_ES_SEED = "es-v1"


@register(
    "corpus_es_sample",
    f"""
    WITH w AS (
      SELECT doc_id,
             LEAST(1 + n_chars // 512, 8) AS w
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, w,
             (SELECT MAX(CAST(('0x' || substr(md5(
                      '{_ES_SEED}|' || CAST(doc_id AS VARCHAR)
                      || '|' || CAST(u.j AS VARCHAR)), 1, 12)) AS BIGINT))
              FROM UNNEST(generate_series(1, w)) AS u(j)) AS es_key
      FROM w
    )
    SELECT doc_id, CAST(w AS BIGINT) AS w, es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT {_ES_K}
    """,
    doc="weighted sampling WITHOUT replacement, distribution-exact and "
    "hash-exact: Efraimidis-Spirakis (2006) selects the top-k by "
    "u^(1/w) — and max of w iid uniforms has exactly the U^(1/w) "
    "CDF (P(max<=x) = x^w), so the key is the MAX of w integer md5 "
    "draws: no libm pow/ln anywhere, both engines agree to the bit. "
    "Integer weights are clamped to [1,8] (1 + n_chars div 512); the "
    "w-draw max is a per-row array fold, so key construction is "
    "zero-shuffle and the top-k is one TakeOrdered — O(k) driver "
    "rows at any corpus size. The systematic-multiplicity twin "
    "(corpus_weighted_sample) covers the with-replacement/quota "
    "shape; this is the exact no-duplicate draw an eval-set builder "
    "needs.",
)
def corpus_es_sample(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.least(1 + F.col("n_chars") / F.lit(512), F.lit(8))
        .cast("long")
        .alias("w"),
    )
    draw = lambda j: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(_ES_SEED),
                    F.col("doc_id").cast("string"),
                    j.cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    keyed = docs.select(
        "doc_id",
        "w",
        F.array_max(
            F.transform(F.sequence(F.lit(1), F.col("w")), draw)
        ).alias("es_key"),
    )
    return keyed.orderBy(F.col("es_key").desc(), "doc_id").limit(_ES_K)


_LB_CAP = 1024  # tokens per training batch
_LB_SEED = "lenbatch-v1"
_LB_NB = 64  # cumsum hash buckets (two-level prefix sum)


@register(
    "corpus_length_batches",
    f"""
    WITH t AS (
      SELECT doc_id,
             GREATEST(CAST(len({_CHUNK_SQL_TOKS}) AS BIGINT), 1) AS t
      FROM documents
    ),
    o AS (
      SELECT doc_id, t,
             CAST(length(bin(t)) - 1 AS BIGINT) AS len_bucket,
             {_BUCKET.format(seed=_LB_SEED, key='doc_id')} AS ord
      FROM t
    ),
    c AS (
      SELECT *,
             SUM(t) OVER (PARTITION BY len_bucket ORDER BY ord, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM o
    )
    SELECT len_bucket,
           CAST((cum - t) // {_LB_CAP} AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(t) AS BIGINT) AS sum_tokens,
           CAST(MAX(t) AS BIGINT) AS max_tokens,
           CAST(SUM(t) * 1048576 // (COUNT(*) * MAX(t)) AS BIGINT)
             AS pad_efficiency_fp
    FROM c GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="LENGTH-BUCKETED training-batch packing (the fairseq/HF "
    "group-by-length dynamic batching that cuts padding waste): docs "
    "bucket by exact integer token-count bit length, pack within "
    "each bucket into ~1024-token batches along a deterministic md5 "
    "order (batch = preceding-total div capacity), and each batch "
    "reports its padding efficiency sum/(n*max) on the 2^20 grid. "
    "Scale shape: the within-bucket running sum is the pack_shards "
    "two-level cumsum — a (len_bucket, hash-range) local window plus "
    "an exclusive prefix over the BOUNDED (buckets x {_LB_NB})-row "
    "offsets relation, never a single-partition data-scale window; "
    "verified batch-identical to the oracle's one-window-per-bucket "
    "formulation.",
)
def corpus_length_batches(spark, sf_dir):
    from pyspark.sql.window import Window as W

    from scip_spark.functions.corpus import SPLIT_BUCKETS, hash_bucket
    from scip_spark.functions.text import token_count

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.greatest(token_count("text"), F.lit(1)).alias("t"),
    )
    o = docs.select(
        "doc_id",
        "t",
        (F.length(F.bin("t")) - 1).cast("long").alias("len_bucket"),
        hash_bucket(F.col("doc_id"), _LB_SEED).alias("ord"),
    ).withColumn(
        # contiguous hash ranges: pack_bucket is monotone in ord, so
        # ordering by (len_bucket, pack_bucket, ord, doc_id) IS the
        # per-len-bucket (ord, doc_id) order
        "pb",
        F.expr(f"ord * {_LB_NB} div {SPLIT_BUCKETS}"),
    )
    local_w = (
        W.partitionBy("len_bucket", "pb")
        .orderBy(F.col("ord").asc(), F.col("doc_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = o.withColumn("local_cum", F.sum("t").over(local_w))
    totals = o.groupBy("len_bucket", "pb").agg(
        F.sum("t").cast("long").alias("pb_total")
    )
    # exclusive prefix over the bounded (len_buckets x NB)-row relation
    off_w = (
        W.partitionBy("len_bucket")
        .orderBy("pb")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "pb_offset", F.coalesce(F.sum("pb_total").over(off_w), F.lit(0))
    ).select("len_bucket", "pb", "pb_offset")
    c = local.join(F.broadcast(offsets), ["len_bucket", "pb"]).withColumn(
        "cum", F.col("pb_offset") + F.col("local_cum")
    )
    return (
        c.groupBy(
            "len_bucket",
            F.expr(f"(cum - t) div {_LB_CAP}").cast("long").alias("batch_id"),
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("t").cast("long").alias("sum_tokens"),
            F.max("t").cast("long").alias("max_tokens"),
        )
        .select(
            "len_bucket",
            "batch_id",
            "n_docs",
            "sum_tokens",
            "max_tokens",
            F.expr("sum_tokens * 1048576L div (n_docs * max_tokens)")
            .cast("long")
            .alias("pad_efficiency_fp"),
        )
    )
