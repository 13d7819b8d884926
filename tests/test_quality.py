"""Repetition filters, contamination check, and mixture accounting:
known-value assertions on hand-built documents plus invariants on the
synthetic corpus."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scip_spark.functions.quality_queries import (
    contamination_ngram,
    quality_repetition,
    token_budget_by_domain,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def toy_sf(spark, tmp_path_factory):
    """A tiny documents.parquet with exactly known repetition stats."""
    d = tmp_path_factory.mktemp("toy")
    pdf = pd.DataFrame(
        {
            # doc 0: "a a a b" -> top token a:3/4; bigrams [a a, a a, a b]
            #   top bigram 2/3; trigrams [a a a, a a b] all unique -> dup 0
            # doc 50: benchmark row (50 % 50 == 0)
            # doc 1: shares the 5-gram "x y z w v" with the benchmark doc
            # doc 2: no 5-gram overlap with doc 50
            "doc_id": [0, 50, 1, 2],
            "text": [
                "a a a b",
                "x y z w v q r s t u",
                "x y z w v one two three four five",
                "p q r s a t u m n o",
            ],
            "lang": ["en", "en", "de", "de"],
            "source": ["s0", "s0", "s1", "s1"],
            "n_chars": [7, 19, 33, 19],
        }
    )
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


def test_repetition_known_values(spark, toy_sf):
    rows = {r.doc_id: r for r in quality_repetition(spark, toy_sf).collect()}
    r0 = rows[0]
    assert r0.n_tokens == 4
    assert r0.top_token_frac == 3 / 4
    assert r0.top_bigram_frac == 2 / 3
    assert r0.dup_trigram_frac == 0.0
    # doc 50: ten distinct tokens, no repetition anywhere
    r5 = rows[50]
    assert r5.top_token_frac == 1 / 10 and r5.dup_trigram_frac == 0.0


def test_contamination_flags_overlapping_doc(spark, toy_sf):
    rows = {r.doc_id: r for r in contamination_ngram(spark, toy_sf).collect()}
    assert 50 not in rows  # benchmark docs are not scored
    assert rows[1].contaminated and rows[1].n_matched == 1  # "x y z w v"
    # doc 2 shares tokens (q r s t) but no aligned run of 5
    assert not rows[2].contaminated and rows[2].n_matched == 0
    assert rows[1].n_grams == 6  # 10 tokens -> 6 distinct 5-grams


def test_token_budget_shares_sum_to_one(spark, toy_sf):
    out = token_budget_by_domain(spark, toy_sf).orderBy("cum_tokens").collect()
    assert abs(sum(r.token_share for r in out) - 1.0) < 1e-12
    assert out[-1].cum_tokens == sum(r.n_tokens for r in out)
    assert out[-1].cum_share == 1.0
    # cumulative ordering is by descending token mass
    masses = [r.n_tokens for r in out]
    assert masses == sorted(masses, reverse=True)


def test_repetition_fracs_bounded_on_corpus(spark):
    out = quality_repetition(spark, SF)
    bad = out.filter(
        (F.col("top_token_frac") <= 0)
        | (F.col("top_token_frac") > 1)
        | (F.col("top_bigram_frac") > 1)
        | (F.col("dup_trigram_frac") > 1)
        | (F.col("dup_trigram_frac") < 0)
    ).count()
    assert bad == 0
    assert out.count() == 500


def test_contamination_plan_broadcasts_benchmark(spark):
    plan = contamination_ngram(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_score_documents_injectable_model_and_cache(spark):
    """The scoring seam: a custom model factory is called at most once
    per python worker (cached), batching covers every row exactly once,
    and scores land row-aligned."""
    from scip_spark.functions.scoring import score_documents

    rows = [(i, f"doc number {i} " + "pad " * (i % 7)) for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def factory():
        def model(texts):
            return [float(len(t)) for t in texts]

        return model

    out = score_documents(
        docs, model_factory=factory, model_name="len-model", batch_size=8
    )
    got = {r.doc_id: r.model_score for r in out.collect()}
    want = {i: float(len(t)) for i, t in rows}
    assert got == want


def test_score_documents_null_text(spark):
    from scip_spark.functions.scoring import score_documents

    docs = spark.createDataFrame([(1, None), (2, "ab")], ["doc_id", "text"])
    got = {r.doc_id: r.model_score for r in score_documents(
        docs, model_factory=lambda: (lambda ts: [float(len(t)) for t in ts]),
        model_name="len-model-2",
    ).collect()}
    assert got == {1: 0.0, 2: 2.0}  # null text scores as empty, never crashes


def test_contamination_normalized_catches_variants(spark, tmp_path):
    """norm_hit ⊇ exact_hit, and case/whitespace/punctuation variants
    of a train doc — which exact matching misses — are norm-flagged."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    rows = []
    # train docs (doc_id % 10 < 8)
    rows.append((0, "The quick brown fox jumps over the lazy dog"))
    rows.append((1, "completely unrelated training text"))
    # eval docs (doc_id % 10 >= 8)
    rows.append((8, "The quick brown fox jumps over the lazy dog"))   # exact
    rows.append((18, "the QUICK  brown fox, jumps over the lazy dog!"))  # variant
    rows.append((28, "genuinely novel evaluation document"))           # clean
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(f"{sf}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in REGISTRY["contamination_normalized"].fn(spark, sf).collect()
    }
    assert out[8]["exact_hit"] and out[8]["norm_hit"]
    assert not out[18]["exact_hit"] and out[18]["norm_hit"]  # the point
    assert not out[28]["exact_hit"] and not out[28]["norm_hit"]
    assert all(r["norm_hit"] or not r["exact_hit"] for r in out.values())


def test_bigram_surprisal_ranks_gibberish_above_repetition(spark, tmp_path):
    """A doc of improbable transitions (every bigram unique) must
    out-score a doc that repeats one high-frequency pattern, and
    per-bigram surprisal is exactly c(w1)*2^20 div c(bigram)."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    common = "the cat sat on the mat " * 20           # probable transitions
    gibberish = " ".join(f"w{i} q{i * 7 % 13}" for i in range(40))
    rows = [(0, common.strip()), (1, gibberish)]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(f"{sf}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in REGISTRY["bigram_surprisal_scores"].fn(spark, sf).collect()
    }
    assert out[1]["mean_surprisal_fp"] > out[0]["mean_surprisal_fp"]
    # exact check on a tiny corpus: doc "a b a b" -> c(a)=c(b)=2,
    # c('a b')=2, c('b a')=1 -> s('a b')=2*2^20//2=2^20, s('b a')=2*2^20
    spark.createDataFrame(
        [(0, "a b a b", "en", "s0", 7)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    r = REGISTRY["bigram_surprisal_scores"].fn(spark, sf).collect()[0]
    assert r["n_bigrams"] == 3
    assert r["surprisal_fp"] == (1 << 20) * 2 + (1 << 21)  # 2x 'a b' + 1x 'b a'
    assert r["mean_surprisal_fp"] == r["surprisal_fp"] // 3


def test_dsir_importance_separates_target_domain(spark, tmp_path):
    """DSIR-shaped importance: with disjoint target/pool vocabularies,
    every target-vocabulary document must outscore every
    pool-vocabulary document (its bigram buckets carry target mass),
    and a held-out doc MIXING both lands strictly between the pure
    extremes' means."""
    import pandas as pd

    from scip_spark.functions.quality_queries import dsir_importance_weights

    t_text = "alpha beta gamma delta alpha beta gamma delta"
    p_text = "zeta eta theta iota zeta eta theta iota"
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": [t_text, t_text, p_text, p_text, p_text, p_text,
                     "alpha beta zeta eta alpha beta zeta eta",
                     t_text],
            "lang": ["en"] * 8,
            "source": ["src0", "src1", "src5", "src6", "src7", "src8",
                       "src9", "src9"],
            "n_chars": [len(t_text)] * 2 + [len(p_text)] * 4 + [40, 47],
        }
    )
    d = tmp_path / "dsir"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")
    rows = {
        r["doc_id"]: r["mean_importance_fp"]
        for r in dsir_importance_weights(spark, str(d)).collect()
    }
    target_like = rows[7]       # pure target vocabulary, pool source
    pool_like = min(rows[i] for i in (2, 3, 4, 5))
    mixed = rows[6]
    assert target_like > mixed > max(rows[i] for i in (2, 3, 4, 5))
    assert all(v > 0 for v in rows.values())
    assert len(rows) == 8
    assert pool_like < target_like


def test_kn_surprisal_continuation_mass_beats_raw(spark, tmp_path):
    """The KN property raw inverse-frequency cannot express: two docs
    each end in a count-1 bigram with the same left context, but one
    continuation word follows MANY distinct contexts (high N1+(·w2))
    while the other follows only this one. Raw bigram surprisal scores
    the two bigrams identically (same c1/c2); interpolated KN gives
    the versatile continuation more probability mass, so that doc must
    score a strictly LOWER mean surprisal."""
    import pandas as pd

    from scip_spark.functions.quality_queries import (
        bigram_surprisal_scores,
        kn_surprisal_scores,
    )

    # "hub" follows a b c d (4 distinct contexts); "spoke" follows only
    # x. Docs 10/11 differ ONLY in their final bigram: "x hub" vs
    # "x spoke" — both count-1 bigrams with the identical left context.
    texts = {
        0: "a hub b hub c hub d hub",
        10: "q q q x hub",
        11: "q q q x spoke",
    }
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    d = tmp_path / "kn"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    kn = {
        r["doc_id"]: r["mean_kn_surprisal_fp"]
        for r in kn_surprisal_scores(spark, str(d)).collect()
    }
    raw = {
        r["doc_id"]: r["mean_surprisal_fp"]
        for r in bigram_surprisal_scores(spark, str(d)).collect()
    }
    assert raw[10] == raw[11]  # raw scoring is blind to continuations
    assert kn[10] < kn[11]     # KN rewards the versatile continuation

    # exact value vs the all-integer KN rational for one bigram:
    # corpus bigrams: (a hub)(hub b)(b hub)(hub c)(c hub)(hub d)(d hub)
    # + (q q)x2 (q x)(x hub) for doc 10 + (q q)x2 (q x)(x spoke) -> N
    # distinct = 11; "x hub": c2=1, ctx(x)=2, nfollow(x)=2,
    # nprec(hub)=5, n=11 -> P=(1*11+3*2*5)/(4*2*11)=41/88
    rate_x_hub = (4 * 2 * 11 * 65536) // (1 * 11 + 3 * 2 * 5)
    assert rate_x_hub == (88 * 65536) // 41


def test_kn_and_dsir_match_exact_python_reference(spark, tmp_path):
    """Randomized (seeded) corpora vs pure-Python EXACT integer
    references for both round-11 scoring kernels — every division is
    floor-division on the same grid, so equality is exact, not
    approximate."""
    import random

    import pandas as pd

    from scip_spark.functions.quality_queries import (
        _DSIR_B,
        _DSIR_GRID,
        _DSIR_TARGET,
        dsir_importance_weights,
        kn_surprisal_scores,
    )
    import hashlib

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = {}
    sources = {}
    for i in range(14):
        docs[i] = [rng.choice(vocab) for _ in range(rng.randint(3, 12))]
        sources[i] = "src0" if i % 5 == 0 else f"src{2 + i % 4}"
    pdf = pd.DataFrame(
        {
            "doc_id": list(docs),
            "text": [" ".join(t) for t in docs.values()],
            "lang": ["en"] * len(docs),
            "source": [sources[i] for i in docs],
            "n_chars": [len(" ".join(t)) for t in docs.values()],
        }
    )
    d = tmp_path / "ref"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    bigrams = {
        i: [f"{t[j]} {t[j+1]}" for j in range(len(t) - 1)]
        for i, t in docs.items()
    }

    # --- KN reference (all-integer rational, D = 3/4, 2^16 grid) ---
    from collections import Counter

    c2 = Counter(bg for bs in bigrams.values() for bg in bs)
    ctx = Counter()
    nfollow = Counter()
    nprec = Counter()
    for bg in c2:
        w1, w2 = bg.split(" ")
        ctx[w1] += c2[bg]
        nfollow[w1] += 1
        nprec[w2] += 1
    n = len(c2)

    def kn_rate(bg):
        w1, w2 = bg.split(" ")
        num = max(4 * c2[bg] - 3, 0) * n + 3 * nfollow[w1] * nprec[w2]
        return (4 * ctx[w1] * n * 65536) // num

    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_kn_surprisal_fp"])
        for r in kn_surprisal_scores(spark, str(d)).collect()
    }
    for i, bs in bigrams.items():
        if not bs:
            assert i not in got
            continue
        assert got[i] == (len(bs), sum(kn_rate(bg) for bg in bs) // len(bs)), i

    # --- DSIR reference (Laplace ratio on the 2^20 grid) ---
    def bucket(bg):
        return int(hashlib.md5(bg.encode()).hexdigest()[:6], 16) % _DSIR_B

    ct = Counter()
    cs = Counter()
    for i, bs in bigrams.items():
        tgt = sources[i] in _DSIR_TARGET
        for bg in bs:
            (ct if tgt else cs)[bucket(bg)] += 1
    nt, ns = sum(ct.values()), sum(cs.values())

    def ratio(b):
        return ((ct[b] + 1) * (ns + _DSIR_B) * _DSIR_GRID) // (
            (cs[b] + 1) * (nt + _DSIR_B)
        )

    got2 = {
        r["doc_id"]: (r["n_bigrams"], r["mean_importance_fp"])
        for r in dsir_importance_weights(spark, str(d)).collect()
    }
    for i, bs in bigrams.items():
        if not bs:
            continue
        want = sum(ratio(bucket(bg)) for bg in bs) // len(bs)
        assert got2[i] == (len(bs), want), i


def _write_docs(spark, tmp_path, rows):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_gopher_rules_each_branch(spark, tmp_path):
    """Plant one doc per Gopher rule violation (the synthetic corpus
    exercises only a few branches) and one fully-passing doc; every
    flag must flip exactly where planted."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    good = ("the cat and the dog have been to the house of that "
            "friend with many fine words ") * 3  # 51+ words, stopwords
    rows = [
        (0, good),                                    # passes everything
        (1, "short doc with the and of that"),        # word count < 50
        (2, "a b c d e " * 12 + "the of"),            # mean word len < 3
        (3, good + " " + "# " * 10),                  # symbol ratio >= 0.1
        (4, good.replace("the", "123").replace("and", "456")
             .replace("of", "789").replace("that", "000")
             .replace("to", "111").replace("have", "222")
             .replace("with", "333").replace("be", "444")),  # stopwords < 2
        (5, "\n".join(["- " + good[:40]] * 10)),      # 100% bullet lines
        (6, "\n".join([good[:40] + "..."] * 10)),     # 100% ellipsis lines
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in REGISTRY["quality_gopher_rules"].fn(spark, sf).collect()
    }
    assert out[0]["keep"], out[0]
    assert not out[1]["f_word_count"] and not out[1]["keep"]
    assert not out[2]["f_mean_word_len"]
    assert not out[3]["f_symbol_ratio"]
    assert out[0]["f_symbol_ratio"]
    assert not out[4]["f_stopwords"] and out[0]["f_stopwords"]
    assert not out[5]["f_bullet_lines"] and out[0]["f_bullet_lines"]
    assert not out[6]["f_ellipsis_lines"] and out[0]["f_ellipsis_lines"]
    # alpha-fraction flag: mostly-numeric doc fails
    sf2 = _write_docs(
        spark, tmp_path, [(0, good), (1, ("12 34 56 78 90 " * 12) + "the of x")]
    )
    out2 = {
        r["doc_id"]: r
        for r in REGISTRY["quality_gopher_rules"].fn(spark, sf2).collect()
    }
    assert out2[0]["f_alpha_words"] and not out2[1]["f_alpha_words"]


def test_c4_filters_each_branch(spark, tmp_path):
    """C4 line retention and page-level flags flip exactly where
    planted: terminal-punctuation+5-word lines retained, short or
    unpunctuated lines dropped; lorem/brace/javascript kill the page."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    keepable = ("This line has five good words.\n"
                "Another proper sentence sits right here!\n"
                "Does this question line also count?")
    rows = [
        (0, keepable),                                  # 3 sentences, keep
        (1, "Too short.\nNo punctuation line here five\nTiny."),  # no 5-word terminal line
        (2, keepable + "\nlorem ipsum dolor sit amet."),  # lorem
        (3, keepable + "\nvar x = {a: 1};"),              # brace
        (4, keepable + "\nenable JavaScript to continue."),  # javascript
        (5, "One sentence only right here."),             # < 3 sentences
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in REGISTRY["quality_c4_filters"].fn(spark, sf).collect()
    }
    assert out[0]["keep"] and out[0]["n_retained_lines"] == 3
    assert out[1]["n_retained_lines"] == 0 and not out[1]["keep"]
    assert out[2]["has_lorem"] and not out[2]["keep"]
    assert out[3]["has_brace"] and not out[3]["keep"]
    assert out[4]["has_js"] and not out[4]["keep"]
    assert out[5]["n_sentences"] < 3 and not out[5]["keep"]


def test_ewma_fold_matches_pure_python_and_flags_spike(spark, tmp_path):
    """The EWMA recurrence must equal the pure-Python integer fold
    exactly (e_t = (e_{t-1}+x_t)>>1) and flag exactly the planted
    50%+ deviation days."""
    import datetime

    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    revs = [10000] * 10 + [40000] + [10000] * 5 + [100] + [10000] * 3
    base = datetime.date(2024, 1, 1)
    rows = [
        (i, 1, "O", revs[i] / 100.0, base + datetime.timedelta(days=i),
         "1-URGENT", "c", 0, "x")
        for i in range(len(revs))
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority",
         "o_comment"],
    ).write.parquet(f"{sf}/orders.parquet")

    out = sorted(
        REGISTRY["ewma_anomaly_days"].fn(spark, sf).collect(),
        key=lambda r: r["day"],
    )
    # pure-Python reference fold
    e, want_e, want_flag = None, [], []
    for x in revs:
        flag = e is not None and 2 * abs(x - e) > e
        e = x if e is None else (e + x) >> 1
        want_e.append(e)
        want_flag.append(flag)
    assert [r["ewma"] for r in out] == want_e
    assert [r["anomaly"] for r in out] == want_flag
    flagged = {r["day"] for r in out if r["anomaly"]}
    # spike + crash days, each followed by one echo flag (alpha=1/2
    # pulls the level halfway to the outlier, so the return-to-normal
    # day also deviates > 50% — inherent to heavy smoothing)
    assert flagged == {"2024-01-11", "2024-01-12", "2024-01-17", "2024-01-18"}


def test_trigram_backoff_matches_pure_python(spark, tmp_path):
    """Stupid-backoff pricing must equal the pure-Python integer
    reference on a planted corpus that exercises every backoff level
    (trigram hit, bigram backoff, unigram backoff, OOV -> 0)."""
    from collections import Counter

    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.functions.quality_queries import _SB_GRID
    from scip_spark.queries import REGISTRY

    train = [
        (0, "a b c a b c a b d"),
        (1, "x y z x y w"),
    ]
    evals = [
        (8, "a b c"),          # trigram hit
        (18, "c a b d x"),     # mix: hits + bigram-level
        (28, "b d y z qqq"),   # bigram + unigram + OOV
    ]
    sf = _write_docs(spark, tmp_path, train + evals)
    out = {
        r["doc_id"]: r
        for r in REGISTRY["trigram_backoff_scores"].fn(spark, sf).collect()
    }

    toks = {i: t.split() for i, t in train + evals}
    tri = Counter(
        " ".join(toks[i][j:j + 3])
        for i, _ in train for j in range(len(toks[i]) - 2)
    )
    bi = Counter(
        " ".join(toks[i][j:j + 2])
        for i, _ in train for j in range(len(toks[i]) - 1)
    )
    uni = Counter(w for i, _ in train for w in toks[i])
    N = sum(uni.values())

    def price(tg):
        w1, w2, w3 = tg.split()
        if tri[tg] > 0:
            return tri[tg] * _SB_GRID // bi[f"{w1} {w2}"], 0
        if bi[f"{w2} {w3}"] > 0:
            return 2 * bi[f"{w2} {w3}"] * _SB_GRID // (5 * uni[w2]), 1
        if uni[w3] > 0:
            return 4 * uni[w3] * _SB_GRID // (25 * N), 2
        return 0, 3

    seen_lvls = set()
    for i, _ in evals:
        tgs = [" ".join(toks[i][j:j + 3]) for j in range(len(toks[i]) - 2)]
        priced = [price(t) for t in tgs]
        seen_lvls |= {l for _, l in priced}
        assert out[i]["score_fp"] == sum(s for s, _ in priced), i
        assert out[i]["n_trigrams"] == len(tgs)
        for lvl, col in [(0, "n_tri"), (1, "n_bi"), (2, "n_uni"), (3, "n_oov")]:
            assert out[i][col] == sum(1 for _, l in priced if l == lvl), (i, col)
    assert seen_lvls == {0, 1, 2, 3}  # every backoff level exercised


def test_score_calibration_cdf_properties(spark, tmp_path):
    """Calibrated values must be a valid per-source CDF: monotone in
    the raw score within each source, in (0, 2^20], hitting exactly
    2^20 at each source's max bucket — and equal scores in DIFFERENT
    sources calibrate differently when the distributions differ (the
    operator's whole point)."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    rows = []
    # source A: short docs (5..20 tokens); source B: long docs (100..400)
    for i in range(100):
        rows.append((i * 2, "w " * (5 + i % 16), "en", "A", 1))
        rows.append((i * 2 + 1, "w " * (100 + (i * 3) % 300), "en", "B", 1))
    # one doc in B with a SHORT text: low CDF in B though mid-pack in A
    rows.append((9999, "w " * 10, "en", "B", 1))
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = REGISTRY["quality_score_calibration"].fn(spark, sf).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["t"], r["cdf_fp"], r["doc_id"]))
    for src, vals in by_src.items():
        vals.sort()
        cdfs = [c for _, c, _ in vals]
        assert all(0 < c <= (1 << 20) for c in cdfs), src
        assert cdfs == sorted(cdfs), src          # monotone in score
        assert cdfs[-1] == (1 << 20), src          # max bucket -> 1.0
    short_b = next(c for t, c, i in by_src["B"] if i == 9999)
    same_t_a = [c for t, c, _ in by_src["A"] if t == 10]
    assert short_b < min(same_t_a)  # same raw score, different calibration


def test_repetition_rules_each_level(spark, tmp_path):
    """Plant one doc per repetition-rule violation: a repeated bigram
    heavy doc (top-2gram), a doc that repeats one 5-gram block
    (dup-5..10), duplicated lines, and a clean doc; fractions also
    pinned against a pure-Python per-gram count on the planted docs."""
    from collections import Counter

    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    clean = " ".join(f"u{i} v{i * 3 % 17}" for i in range(40))
    bigram_heavy = "ab cd " * 30 + clean[:40]
    block = "p q r s t "
    block_heavy = block * 12 + clean[:30]
    dup_lines = "\n".join(["same line here"] * 8 + [clean[:30]])
    rows = [(0, clean), (1, bigram_heavy), (2, block_heavy), (3, dup_lines)]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(f"{sf}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in REGISTRY["quality_repetition_rules"].fn(spark, sf).collect()
    }
    assert out[0]["keep"], out[0]
    assert not out[1]["f_top2"] and not out[1]["keep"]
    for n in range(5, 11):
        assert not out[2][f"f_dup{n}"], n
    assert not out[3]["f_lines"] and out[3]["dup_lines"] == 8

    # exact fraction pin on the bigram-heavy doc
    toks = bigram_heavy.split()
    bigrams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
    cnt = Counter(bigrams)
    tot = sum(c * len(g) for g, c in cnt.items())
    top = max(c * len(g) for g, c in cnt.items())
    assert out[1]["top2_fp"] == top * (1 << 20) // tot


def test_blocklist_filter_token_vs_phrase_semantics(spark, tmp_path):
    """Token matches must be exact-token (no substring false positives
    — 'classics' contains 'xxx'? no; 'maxxx' must NOT hit), phrase
    matches must be substring-level, and keep flips on either."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    rows = [
        (0, "a perfectly clean document with words"),
        (1, "spam spam CASINO spam"),                 # token hit, case-folded
        (2, "do not maxxx out or use casinos here"),  # substrings only -> clean
        (3, "act now Limited Time Offer expires"),    # phrase hit, case-folded
        (4, "casino and click here to win twice"),    # both
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(f"{sf}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in REGISTRY["quality_blocklist_filter"].fn(spark, sf).collect()
    }
    assert out[0]["keep"]
    assert out[1]["n_blocked_tokens"] == 1 and not out[1]["keep"]
    assert out[2]["n_blocked_tokens"] == 0 and out[2]["keep"]  # no substring FPs
    assert out[3]["n_blocked_phrases"] == 1 and not out[3]["keep"]
    assert out[4]["n_blocked_tokens"] == 1
    assert out[4]["n_blocked_phrases"] == 1 and not out[4]["keep"]


def test_repetition_kernel_matches_catalyst_fold(spark):
    """The Arrow kernel (_rep_stats_kernel, the registry path since r13)
    must be bit-identical to the Catalyst sorted-run fold twin on the
    real corpus — every s{n}_top/dup/tot and line stat, every doc."""
    from scip_spark.functions.quality_queries import (
        _rep_stats_fold,
        _rep_stats_kernel,
        _REP_KERNEL_SCHEMA,
    )
    from scip_spark.queries import tbl

    sf = "/root/testdata/sf0.001"
    docs = tbl(spark, sf, "documents").select("doc_id", "text")
    kern = (
        docs.mapInPandas(_rep_stats_kernel, schema=_REP_KERNEL_SCHEMA)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    fold = (
        _rep_stats_fold(spark, sf)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sorted(kern.columns) == sorted(fold.columns)
    for c in kern.columns:
        mism = (kern[c].astype("int64") != fold[c].astype("int64"))
        assert not mism.any(), (c, kern.loc[mism, ["doc_id", c]].head())
