"""Corpus-construction operators: determinism, stability-under-growth,
and the distributed-prefix-sum == serial-window equivalence that makes
pack_shards safe at cluster scale."""

import pytest
from pyspark.sql import functions as F

from scip_spark.functions.corpus import (
    hash_sample,
    mixture_upsample,
    pack_shards,
    quota_per_group,
    split_assign,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_split_stable_under_growth(spark, docs):
    """A document's split must not change when the corpus grows — the
    property that makes hash splits (unlike rand()) backfill-safe."""
    small = split_assign(docs.filter(F.col("doc_id") < 100))
    full = split_assign(docs)
    s = {r.doc_id: r.split for r in small.select("doc_id", "split").collect()}
    f = {r.doc_id: r.split for r in full.select("doc_id", "split").collect()}
    assert all(f[k] == v for k, v in s.items())
    # proportions: train dominates, all three present at 500 docs is not
    # guaranteed for 1% slices — just check train ~ 98% +- 4pts
    n = len(f)
    train = sum(1 for v in f.values() if v == "train")
    assert abs(train / n - 0.98) < 0.04


def test_hash_sample_correlated_and_disjoint_seeds(spark, docs):
    a1 = {r.doc_id for r in hash_sample(docs, 0.2).select("doc_id").collect()}
    a2 = {r.doc_id for r in hash_sample(docs, 0.2).select("doc_id").collect()}
    assert a1 == a2 and 0.1 < len(a1) / 500 < 0.3
    b = {
        r.doc_id
        for r in hash_sample(docs, 0.2, seed="other").select("doc_id").collect()
    }
    assert b != a1  # different seed, different subset
    # nesting: a 10% sample with the same seed is a subset of the 20%
    c = {r.doc_id for r in hash_sample(docs, 0.1).select("doc_id").collect()}
    assert c <= a1


def test_quota_caps_every_group(spark, docs):
    out = quota_per_group(docs, group_col="lang", cap=30)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    orig = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(30, orig[lang])
    # deterministic subset
    a = sorted(r.doc_id for r in out.select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in quota_per_group(docs, group_col="lang", cap=30).select("doc_id").collect()
    )
    assert a == b


def test_quota_plan_pushes_group_limit_below_exchange(spark, docs):
    """The rank<=cap filter must become a map-side WindowGroupLimit
    (before the Exchange) — shuffle volume per group is then bounded by
    cap x tasks, so a 90%-hot language cannot melt one reducer."""
    plan = (
        quota_per_group(docs, cap=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan[:1500]
    # partial (map-side) limit: a WindowGroupLimit appears below the
    # shuffle — its string form lists it after Exchange in the tree
    pre, _, post = plan.partition("Exchange")
    assert "WindowGroupLimit" in post, plan[:1500]


def test_mixture_upsample_counts_and_no_shuffle(spark, docs):
    epochs = {"web": 1, "wiki": 3, "books": 2}
    out = mixture_upsample(docs, epochs)
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    orig = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in orig.items():
        assert got[src] == n * epochs.get(src, 1)
    # replication is map-side: no Exchange below the Generate
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pack_shards_distributed_equals_serial(spark, docs):
    """The two-level cumsum (bucket windows + broadcast offsets) must
    produce byte-identical shard ids to a 1-bucket (serial) run."""
    dist = {
        r.doc_id: r.shard_id
        for r in pack_shards(docs, budget=50_000, n_buckets=64)
        .select("doc_id", "shard_id")
        .collect()
    }
    serial = {
        r.doc_id: r.shard_id
        for r in pack_shards(docs, budget=50_000, n_buckets=1)
        .select("doc_id", "shard_id")
        .collect()
    }
    assert dist == serial


def test_pack_shards_budget_respected(spark, docs):
    out = pack_shards(docs, budget=50_000).select("doc_id", "n_chars", "shard_id")
    rows = out.collect()
    totals = {}
    maxdoc = 0
    for r in rows:
        totals[r.shard_id] = totals.get(r.shard_id, 0) + r.n_chars
        maxdoc = max(maxdoc, r.n_chars)
    sids = sorted(totals)
    assert sids == list(range(len(sids)))  # contiguous from 0
    # a shard only overflows by the document that straddles its boundary
    for sid in sids:
        assert totals[sid] < 50_000 + maxdoc
    # every full shard is actually full (no premature cut): all but the
    # last shard must reach the budget once its straddling doc lands
    for sid in sids[:-1]:
        assert totals[sid] + 1 > 50_000 - maxdoc


def test_chunk_tokens_semantics(spark):
    """Window/stride coverage rules: short docs give one chunk, longer
    docs tile with the configured overlap, every token is covered, and
    no chunk starts at/past the end."""
    import pandas as pd

    from scip_spark.functions.corpus import chunk_tokens

    rows = [
        (1, " ".join(f"t{i}" for i in range(5))),    # n < window: 1 chunk
        (2, " ".join(f"t{i}" for i in range(8))),    # n == window: 1 chunk
        (3, " ".join(f"t{i}" for i in range(9))),    # 1 past: 2 chunks
        (4, " ".join(f"t{i}" for i in range(20))),   # (20-8+5)//6+1 = 3 chunks
        (5, ""),                                     # empty: dropped
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = chunk_tokens(docs, window=8, stride=6).toPandas()
    by_doc = out.groupby("doc_id")

    assert 5 not in set(out["doc_id"])
    assert by_doc.size().to_dict() == {1: 1, 2: 1, 3: 2, 4: 3}
    # full coverage + tail truncation for the 9-token doc
    c3 = out[out.doc_id == 3].sort_values("chunk_id")
    assert list(c3.chunk_n_tokens) == [8, 3]
    assert c3.iloc[1].chunk_text == "t6 t7 t8"  # starts at stride=6, truncated
    # overlap: chunk k starts at k*stride
    c4 = out[out.doc_id == 4].sort_values("chunk_id")
    assert [t.split()[0] for t in c4.chunk_text] == ["t0", "t6", "t12"]
    assert list(c4.chunk_n_tokens) == [8, 8, 8]


def test_chunk_tokens_no_shuffle(spark):
    """Chunking must stay narrow: no Exchange in the physical plan."""
    from scip_spark.functions.corpus import chunk_tokens

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        chunk_tokens(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_boilerplate_scrub_removes_shared_chunks(spark):
    """A chunk repeated across >max_docs docs is scrubbed everywhere;
    unique chunks survive and reassemble in original order."""
    from pyspark.sql import functions as F

    from scip_spark.functions.dedup import boilerplate_scrub

    boiler = "all rights reserved legal"
    rows = [
        (1, f"{boiler} alpha beta gamma delta"),
        (2, f"{boiler} epsilon zeta eta theta"),
        (3, f"{boiler} iota kappa lamda mu"),
        (4, "nu xi omicron pi rho sigma tau upsilon"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in boilerplate_scrub(docs, chunk=4, max_docs=2).collect()
    }
    assert len(out) == 4
    # the shared 4-token chunk is removed from all three carriers
    for d in (1, 2, 3):
        assert out[d].n_removed == 1 and out[d].n_kept == 1
    # untouched doc keeps both its chunks
    assert out[4].n_removed == 0 and out[4].n_kept == 2
    import hashlib

    assert out[1].clean_md5 == hashlib.md5(b"alpha beta gamma delta").hexdigest()
    assert (
        out[4].clean_md5
        == hashlib.md5(b"nu xi omicron pi rho sigma tau upsilon").hexdigest()
    )


def test_boilerplate_scrub_fully_scrubbed_doc_emits_row(spark):
    """A doc whose every chunk is boilerplate still emits (md5(''))."""
    import hashlib

    from scip_spark.functions.dedup import boilerplate_scrub

    rows = [(i, "same four token chunk") for i in range(1, 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = boilerplate_scrub(docs, chunk=4, max_docs=2).collect()
    assert len(out) == 4
    for r in out:
        assert r.n_kept == 0 and r.n_removed == 1
        assert r.clean_md5 == hashlib.md5(b"").hexdigest()


def test_boilerplate_scrub_zero_token_doc_still_emits(spark):
    """A doc with no tokens has no chunks, hence no flag rows — the
    left join must still surface it as (0, 0, md5(''))."""
    import hashlib

    from scip_spark.functions.dedup import boilerplate_scrub

    rows = [(1, "alpha beta gamma delta"), (2, "   "), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in boilerplate_scrub(docs, chunk=4, max_docs=2).collect()}
    assert set(out) == {1, 2, 3}
    for d in (2, 3):
        assert out[d].n_kept == 0 and out[d].n_removed == 0
        assert out[d].clean_md5 == hashlib.md5(b"").hexdigest()


def test_audio_windows_edges(spark):
    """Window plan edge cases: exact multiple, sub-window item, zero
    duration, stride < window (overlap)."""
    from scip_spark.functions.multimodal import audio_windows

    media = spark.createDataFrame(
        [(1, 10.0), (2, 3.0), (3, 0.0), (4, 12.5)],
        ["media_id", "meta_duration_s"],
    )
    got = {
        (r.media_id, r.window_idx): (r.start_s, r.end_s)
        for r in audio_windows(media, window_s=5.0, stride_s=5.0).collect()
    }
    assert got == {
        (1, 0): (0.0, 5.0), (1, 1): (5.0, 10.0),
        (2, 0): (0.0, 3.0),
        (4, 0): (0.0, 5.0), (4, 1): (5.0, 10.0), (4, 2): (10.0, 12.5),
    }
    # overlapping windows: stride 2.5 over 10 s -> starts 0,2.5,5,7.5(partial? (10-5)/2.5+1=3 -> 0,2.5,5)
    ov = audio_windows(
        spark.createDataFrame([(1, 10.0)], ["media_id", "meta_duration_s"]),
        window_s=5.0, stride_s=2.5,
    ).collect()
    assert [(r.start_s, r.end_s) for r in sorted(ov, key=lambda r: r.window_idx)] == [
        (0.0, 5.0), (2.5, 7.5), (5.0, 10.0)
    ]


def _reference_bpe(word_freqs, n_merges):
    """Pure-Python BPE (Sennrich 2016) over a word-frequency dict —
    the single-node truth the distributed trainer must reproduce."""
    END = "</w>"
    table = {w: (list(w) + [END], f) for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for seq, f in table.values():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        top = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if top[1] < 2:
            break
        (l, r), _n = top
        merges.append((l, r))
        for w, (seq, f) in table.items():
            res, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(seq[i])
                    i += 1
            table[w] = (res, f)
    return merges


def test_bpe_train_matches_reference(spark):
    """The distributed trainer (one corpus scan + iterations over the
    compressed word table) must learn the exact merge list the
    single-node reference derives, including tie-breaks."""
    from scip_spark.functions.bpe import bpe_encode, bpe_train, word_freq_table

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    wf = {
        r.w: r.freq for r in word_freq_table(docs).collect()
    }
    want = _reference_bpe(wf, n_merges=8)
    got = bpe_train(docs, n_merges=8)
    assert got == want and len(got) == 8
    # the learned merges actually compress: frequent word becomes 1 unit
    enc = bpe_encode("newest", got)
    assert len(enc) < len("newest") + 1


def test_bpe_train_stops_when_no_pair_repeats(spark):
    from scip_spark.functions.bpe import bpe_train

    docs = spark.createDataFrame([(0, "ab cd ef")], ["doc_id", "text"])
    merges = bpe_train(docs, n_merges=20)
    # every pair occurs once; min-support 2 stops the loop immediately
    assert merges == []


def test_bpe_batched_rounds_match_sequential(spark):
    """Round-batched training (greedy independent-prefix selection) must
    emit the exact sequential merge list on a corpus engineered to hold
    ≥2 independent argmaxes per round ('lo'+'w' vs 'ne'+'st' families
    share no symbols), AND on a corpus engineered so consecutive
    argmaxes overlap (forcing the batch to degrade to 1 merge/round)."""
    from scip_spark.functions.bpe import bpe_train, word_freq_table

    texts = [
        "low low low low low low lowest lowest",
        "newest newest newest newest newest fewest fewest",
        "wider wider ride ride ride",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    wf = {r.w: r.freq for r in word_freq_table(docs).collect()}
    want = _reference_bpe(wf, n_merges=10)
    for b in (2, 4, 16):
        assert bpe_train(docs, n_merges=10, batch=b) == want, f"batch={b}"

    # chain corpus: each merge's product feeds the next argmax
    # (a+a→aa, aa+aa→aaaa, ...) — every round may only take one merge
    chain = spark.createDataFrame([(0, "aaaaaaaa aaaaaaaa aaaaaaaa")], ["doc_id", "text"])
    cwf = {r.w: r.freq for r in word_freq_table(chain).collect()}
    cwant = _reference_bpe(cwf, n_merges=4)
    assert bpe_train(chain, n_merges=4, batch=8) == cwant


def test_bpe_batch_stops_at_symbol_collision():
    """If a selected merge's product string already exists as a symbol
    (reachable via a different decomposition), later selections in the
    batch are unsound: pairs containing that symbol touch neither side
    of the merge, so the threat scan never bounds them, and after the
    merge their occurrences combine with the freshly created pairs.
    The guard must end the batch AT the colliding merge.

    Concrete counterexample the unguarded selection gets wrong:
    rows (a,b)=100, (c,d)=60, (x,ab)=55 with symbol "ab" live. The old
    code selected (c,d) second (nothing in the list touches {a,b}),
    but sequentially, merging (a,b) can push (x,"ab") to
    55 + count(x,a) > 60 — so (c,d) is NOT the next sequential merge."""
    from scip_spark.functions.bpe import _select_independent

    rows = [
        {"n": 100, "left": "a", "right": "b"},
        {"n": 60, "left": "c", "right": "d"},
        {"n": 55, "left": "x", "right": "ab"},
    ]
    known = {"a", "b", "c", "d", "x", "ab", "</w>"}
    assert _select_independent(rows, 0, 8, known) == [("a", "b")]
    # the guard is defensive: "ab" is live by virtue of appearing in a
    # candidate pair, so the batch stops even if the caller's
    # vocabulary omitted it
    assert _select_independent(rows, 0, 8, known - {"ab"}) == [("a", "b")]
    # genuinely collision-free variant: both independent pairs batch
    clean = [
        {"n": 100, "left": "a", "right": "b"},
        {"n": 60, "left": "c", "right": "d"},
        {"n": 55, "left": "x", "right": "e"},
    ]
    assert _select_independent(clean, 0, 8, {"a", "b", "c", "d", "x", "e"}) == [
        ("a", "b"),
        ("c", "d"),
        ("x", "e"),
    ]
    # two in-batch products colliding with each other: (p,qr) then
    # (pq,r) are symbol-disjoint yet both produce "pqr" — batch must
    # end at the second product even though no pre-existing symbol
    # matches (first product joins the known set mid-batch)
    rows2 = [
        {"n": 100, "left": "p", "right": "qr"},
        {"n": 60, "left": "pq", "right": "r"},
    ]
    assert _select_independent(rows2, 0, 8, {"p", "qr", "pq", "r"}) == [
        ("p", "qr"),
        ("pq", "r"),
    ]


def test_bpe_batched_matches_reference_on_collision_heavy_corpora(spark):
    """Single-letter run corpora maximize same-string-different-
    decomposition collisions ((a,aa) vs (aa,a) → \"aaa\", …); batched
    training must still emit the byte-exact sequential merge list."""
    from scip_spark.functions.bpe import bpe_train, word_freq_table

    corpora = [
        "aaaa aaa aaa aa aa aa a",
        "aaaaaa aaaaa aaaa aaa aa aaaaaa aaa",
        "aaab aab aaab ab aaab bba bba abb aaab",
        # r07 judge falsifier (wf a:4, bbbbbb:3): the (b,b) self-merge
        # creates (bb,bb) count 6 > (a,</w>) count 4 — the self-pair
        # threat bound must end the batch after (b,b)
        "a a a a bbbbbb bbbbbb bbbbbb",
    ]
    for text in corpora:
        docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
        wf = {r.w: r.freq for r in word_freq_table(docs).collect()}
        want = _reference_bpe(wf, n_merges=6)
        for b in (2, 8):
            assert bpe_train(docs, n_merges=6, batch=b) == want, (text, b)


def _batched_bpe_sim(word_freqs, n_merges, batch=8, top_k=None):
    """Driver-side mirror of bpe_train's per-round logic (pair count →
    top-K with tail cap → _select_independent with the live symbol
    vocabulary → apply the whole prefix) so the batching math can be
    property-tested without Spark in the loop."""
    from scip_spark.functions.bpe import _select_independent

    END = "</w>"
    top_k = top_k or max(64, 8 * batch)
    table = {w: (list(w) + [END], f) for w, f in word_freqs.items()}
    known = {s for seq, _ in table.values() for s in seq}
    merges = []
    while len(merges) < n_merges:
        counts = {}
        for seq, f in table.values():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        top = [
            {"n": n, "left": l, "right": r}
            for (l, r), n in top[:top_k]
            if n >= 2
        ]
        if not top:
            break
        tail_cap = top[-1]["n"] if len(top) == top_k else 0
        room = n_merges - len(merges)
        chosen = _select_independent(top, tail_cap, min(batch, room), known)
        if not chosen:
            break
        merges.extend(chosen)
        known.update(l + r for l, r in chosen)
        for w, (seq, f) in table.items():
            for l, r in chosen:
                res, i = [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(seq[i])
                        i += 1
                seq = res
            table[w] = (seq, f)
    return merges


def test_bpe_batching_property():
    """Property: for RANDOM word-frequency tables over a tiny alphabet
    (maximal collision pressure: products like 'aa'+'a' vs 'a'+'aa'
    constantly coincide), the batched selection emits the byte-exact
    sequential merge list — at full horizon AND at a tiny top-K horizon
    (exercising the tail-cap bound)."""
    from hypothesis import example, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="ab", min_size=1, max_size=7)
    tables = st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=8)

    # r07 judge-found falsifier: merging (b,b) creates (bb,bb) with
    # count 6 > count(a,</w>)=4, bounded only by (b,b)'s own count —
    # the batch must END after the self-merge, not select (a,</w>).
    @example({"a": 4, "bbbbbb": 3}, 2)
    @example({"bbbbbbb": 2, "ab": 3}, 8)  # odd run: (bb,b) pair
    @settings(max_examples=300, deadline=None)
    @given(tables, st.integers(1, 8))
    def check(wf, batch):
        want = _reference_bpe(wf, n_merges=8)
        assert _batched_bpe_sim(wf, 8, batch=batch) == want
        assert _batched_bpe_sim(wf, 8, batch=batch, top_k=3) == want

    check()


def test_weighted_systematic_sample_properties(spark, docs):
    """Exactly k picks; every doc's multiplicity is floor-or-ceil of
    its expected share k*w/W (the classic SUS guarantee); and the
    distributed bucketed prefix sum gives the same sample at any
    bucket count (the scale-safety equivalence pack_shards pins)."""
    import math

    from scip_spark.functions.corpus import weighted_systematic_sample

    k = 500
    d = docs.select(
        "doc_id", F.greatest(F.col("n_chars").cast("long"), F.lit(1)).alias("w")
    )
    out = weighted_systematic_sample(d, k, weight_col="w")
    rows = out.collect()
    assert sum(r["multiplicity"] for r in rows) == k
    W_total = d.agg(F.sum("w")).collect()[0][0]
    mult = {r["doc_id"]: r["multiplicity"] for r in rows}
    for r in d.collect():
        exp = k * r["w"] / W_total
        m = mult.get(r["doc_id"], 0)
        assert math.floor(exp) <= m <= math.ceil(exp), (r["doc_id"], exp, m)
    for nb in (3, 256):
        alt = weighted_systematic_sample(d, k, weight_col="w", n_buckets=nb)
        assert sorted(
            (r["doc_id"], r["multiplicity"]) for r in alt.collect()
        ) == sorted((r["doc_id"], r["multiplicity"]) for r in rows), nb


def test_weighted_sample_heavy_doc_multiplicity(spark):
    """A document holding half the total weight must be picked ~k/2
    times — multiplicity > 1 is the point of weighted SUS (a
    distinct-sample API can't express epoch-style oversampling)."""
    from scip_spark.functions.corpus import weighted_systematic_sample

    rows = [("heavy", 1000)] + [(f"d{i}", 10) for i in range(100)]
    d = spark.createDataFrame(rows, ["doc_id", "w"])
    out = {
        r["doc_id"]: r["multiplicity"]
        for r in weighted_systematic_sample(d, 100, weight_col="w").collect()
    }
    assert out["heavy"] in (50, 51)  # 1000/2000 of 100 picks
    assert sum(out.values()) == 100


def test_temperature_mixture_flattens(spark):
    """T=2 mixing: weight ∝ √mass — a source with 4× the token mass
    gets exactly 2× the weight (integer-grid exact), every weight_fp
    sums to ~2^30, and upsample factors are inverse-monotone in size
    (small sources boosted above 1 epoch, big ones capped below)."""
    from scip_spark.functions.corpus import temperature_mixture

    rows = (
        [("big", "x" * 100) for _ in range(400)]
        + [("mid", "x" * 100) for _ in range(100)]
        + [("small", "x" * 100) for _ in range(25)]
    )
    d = spark.createDataFrame(
        [(s, len(t)) for s, t in rows], ["source", "n_chars"]
    )
    out = {r["source"]: r for r in temperature_mixture(d).collect()}
    # masses 40000 / 10000 / 2500: perfect squares -> √ ratios 4:2:1
    assert out["big"]["weight_fp"] == 2 * out["mid"]["weight_fp"]
    assert out["mid"]["weight_fp"] == 2 * out["small"]["weight_fp"]
    total_w = sum(r["weight_fp"] for r in out.values())
    assert 0 <= (1 << 30) - total_w < len(out)  # floor-division remainder
    # upsample factor: natural shares 40/52.5k=76%, weight 4/7=57% ->
    # big is downsampled; small: share 4.8%, weight 14.3% -> ~3x boost
    assert out["big"]["epochs_x4"] < 4 <= out["mid"]["epochs_x4"]
    assert out["small"]["epochs_x4"] >= 8  # >= 2 epochs
    # exact quarter-epoch values: u_d = (w_d / share_d)
    assert out["small"]["epochs_x4"] == 12  # 3.0x exactly (4*(1/7)/(2500/52500))


def test_stratified_exact_sample(spark):
    """Hamilton apportionment: exactly k rows total, per-group counts
    within 1 of the exact proportional share (the largest-remainder
    guarantee), rerun-stable membership, and the data-scale rank keeps
    its WindowGroupLimit map-local pushdown (literal-k filter)."""
    import math

    from scip_spark.functions.corpus import stratified_exact_sample

    rows = [(i, f"lang{i % 7}") for i in range(997)]  # uneven shares
    d = spark.createDataFrame(rows, ["doc_id", "lang"])
    k = 100
    out = stratified_exact_sample(d, k)
    got = out.collect()
    assert len(got) == k
    by_lang = {}
    for r in got:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    from collections import Counter

    sizes = Counter(lang for _, lang in rows)
    total = sum(sizes.values())
    for lang, c in sizes.items():
        exact = k * c / total
        assert math.floor(exact) <= by_lang.get(lang, 0) <= math.ceil(exact)
    # deterministic: rerun picks the same doc_ids
    again = sorted(r["doc_id"] for r in stratified_exact_sample(d, k).collect())
    assert again == sorted(r["doc_id"] for r in got)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:1500]


def test_hamilton_apportionment_property(spark):
    """stratified_exact_sample's seat allocation equals a pure-Python
    Hamilton reference across randomized strata shapes (exact-k,
    floor/ceil quota rule, remainder tie-break by group name)."""
    import random

    rng = random.Random(5)
    for trial in range(6):
        g = rng.randint(2, 9)
        sizes = {f"s{j}": rng.randint(1, 120) for j in range(g)}
        total = sum(sizes.values())
        k = rng.randint(1, total)
        rows = [
            (f"{lang}_{i}", lang) for lang, c in sizes.items() for i in range(c)
        ]
        d = spark.createDataFrame(rows, ["doc_id", "lang"])
        from scip_spark.functions.corpus import stratified_exact_sample

        got = {}
        for r in stratified_exact_sample(d, k).collect():
            got[r["lang"]] = got.get(r["lang"], 0) + 1
        # pure-Python Hamilton reference
        base = {lang: k * c // total for lang, c in sizes.items()}
        rem = {lang: (k * c) % total for lang, c in sizes.items()}
        extra = k - sum(base.values())
        order = sorted(sizes, key=lambda lang: (-rem[lang], lang))
        want = {
            lang: base[lang] + (1 if i < extra else 0)
            for i, lang in enumerate(order)
        }
        want = {lang: n for lang, n in want.items() if n}
        assert got == want, (trial, k, sizes, got, want)


def test_temperature_mixture_matches_python_reference(spark):
    """weight_fp / epochs_x4 equal the exact integer reference across
    randomized source masses (including span-dominant and near-equal
    mixes)."""
    import math
    import random

    rng = random.Random(11)
    from scip_spark.functions.corpus import temperature_mixture

    for trial in range(5):
        g = rng.randint(2, 8)
        masses = {f"d{j}": rng.randint(1, 5000) for j in range(g)}
        rows = []
        for s, m in masses.items():
            # split mass into a few docs
            left, i = m, 0
            while left > 0:
                take = min(left, rng.randint(1, max(1, m // 3)))
                rows.append((s, take))
                left -= take
                i += 1
        d = spark.createDataFrame(rows, ["source", "n_chars"])
        got = {r["source"]: r for r in temperature_mixture(d).collect()}
        sq = {s: math.floor(math.sqrt(float(m)) * 256) for s, m in masses.items()}
        T, C = sum(sq.values()), sum(masses.values())
        for s, m in masses.items():
            assert got[s]["chars"] == m
            assert got[s]["weight_fp"] == sq[s] * (1 << 30) // T, s
            assert got[s]["epochs_x4"] == (4 * sq[s] * C) // (T * m), s


def test_temperature_mixture_past_int64_overflow(spark):
    """ADVICE r10 (medium): the epochs_x4 numerator 4·sqrtfp·t_chars
    grows as 1024·C^1.5 and passes 2^63 near C ≈ 40 GB of chars when
    one source dominates — int64 arithmetic would wrap silently in
    Spark and raise in DuckDB. The DECIMAL(38,0) intermediates must
    match Python's exact bignum reference well past that point."""
    import math

    from scip_spark.functions.corpus import mixture_weights_from_sizes

    # one dominant 60 GB source (past the ~2^35.3-char wrap point) plus
    # small tails — the exact shape the advisory flags
    masses = {
        "web": 60_000_000_000,
        "code": 3_000_000_000,
        "wiki": 40_000_000,
        "tiny": 12_345,
    }
    sizes = spark.createDataFrame(
        [(s, 1, c) for s, c in masses.items()],
        "source string, n_docs long, chars long",
    )
    got = {r["source"]: r for r in mixture_weights_from_sizes(sizes).collect()}
    sq = {s: math.floor(math.sqrt(float(c)) * 256) for s, c in masses.items()}
    T, C = sum(sq.values()), sum(masses.values())
    assert 4 * sq["web"] * C > 2**63  # the numerator really is past int64
    for s, c in masses.items():
        assert got[s]["weight_fp"] == sq[s] * (1 << 30) // T, s
        assert got[s]["epochs_x4"] == (4 * sq[s] * C) // (T * c), s
    # flattening still holds: the tiny source is upsampled, the giant
    # source downsampled below one epoch-quarter granularity unit
    assert got["tiny"]["epochs_x4"] > 4 > got["web"]["epochs_x4"]


def test_cluster_safe_split_has_zero_cross_split_pairs(spark):
    """The leakage-safe split's defining property: no LSH candidate
    pair straddles a split boundary (every cluster member follows its
    root), and the split respects the 98/1/1 hash boundaries."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.functions.dedup import lsh_candidate_pairs
    from scip_spark.queries import REGISTRY, tbl

    sf = "/root/testdata/sf0.001"
    split = REGISTRY["corpus_cluster_safe_split"].fn(spark, sf)
    pairs = lsh_candidate_pairs(tbl(spark, sf, "documents"))
    sa = split.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = split.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    crossing = (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert crossing == 0
    assert pairs.count() > 0  # the property is non-vacuous
    # every doc assigned exactly once; all three splits nonempty at
    # 98/1/1 is not guaranteed on 500 docs, but train must dominate
    n = split.count()
    n_train = split.filter(F.col("split") == "train").count()
    assert n == 500 and n_train > 0.9 * n
    # cluster members share their root's split
    per_root = split.groupBy("root").agg(
        F.count_distinct("split").alias("k")
    )
    assert per_root.filter(F.col("k") > 1).count() == 0


def test_drift_chi2_detects_planted_shift(spark, tmp_path):
    """Plant a length-distribution shift in one source's snapshot-B
    half (the md5 hash-half the operator splits on, computed here in
    Python) and none in another: the drifted source's chi-square must
    dominate, the stable source's must stay near zero."""
    import hashlib

    import pandas as pd

    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    def half(doc_id):
        h = hashlib.md5(f"drift-v1|{doc_id}".encode()).hexdigest()[:12]
        return (int(h, 16) % 10_000) % 2

    rows = []
    for i in range(400):
        src = "stable" if i < 200 else "drifted"
        if src == "stable" or half(i) == 0:
            n = 64 + (i % 7)          # one tight length bucket
        else:
            n = 4096 + (i % 7)        # snapshot B of "drifted" shifts
        rows.append((i, "x " * 3, "en", src, n))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = tmp_path / "drift"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    got = {
        r["source"]: r
        for r in REGISTRY["corpus_drift_chi2"].fn(spark, str(d)).collect()
    }
    assert got["stable"]["chi2_fp"] == 0  # identical length buckets
    # the drifted source's halves occupy DISJOINT buckets: chi2 = N
    nd = got["drifted"]["n_a"] + got["drifted"]["n_b"]
    assert abs(got["drifted"]["chi2_fp"] - nd * (1 << 20)) < nd * 16
    assert got["drifted"]["chi2_fp"] > 100 * (1 << 20)


def test_drift_oracle_int128_safe_at_3e9_snapshots():
    """ADVICE r11: the DuckDB oracle's chi-square numerator must cast
    to HUGEINT BEFORE the multiply (a::HUGEINT*nb), not on ABS's
    result — cast-after-ABS evaluates a*nb in BIGINT and overflows at
    ~3e9-row snapshots. Drive the exact oracle expression at planted
    3e9-scale cell counts and pin it to pure-Python int math."""
    import duckdb

    a, b = 2_900_000_000, 3_100_000_000
    na, nb = 3_000_000_000, 3_050_000_000
    grid = 1 << 20
    d = abs(a * nb - b * na)
    want = (d * grid) // (na * nb) * d // (a + b)
    got = duckdb.sql(
        f"""
        SELECT ((ABS(c.a::HUGEINT * t.nb - c.b::HUGEINT * t.na) * {grid})
                  // (t.na::HUGEINT * t.nb))
                 * ABS(c.a::HUGEINT * t.nb - c.b::HUGEINT * t.na)
                 // (c.a + c.b) AS x
        FROM (SELECT {a}::BIGINT a, {b}::BIGINT b) c,
             (SELECT {na}::BIGINT na, {nb}::BIGINT nb) t
        """
    ).fetchone()[0]
    assert int(got) == want
    # and the expression actually appears in the shipped oracle SQL
    from scip_spark.functions.corpus_queries import _DRIFT_SQL

    assert "ABS(c.a::HUGEINT * t.nb - c.b::HUGEINT * t.na)" in _DRIFT_SQL
    assert "ABS(c.a * t.nb" not in _DRIFT_SQL  # the overflowing shape


def test_drift_length_bucket_exact_integer(spark):
    """ADVICE r11: the log2-length bucket is computed as the exact
    integer bit length (length(bin(n))-1) in BOTH engines — no libm
    log2 whose last-ulp drift could flip a floor at power-of-two
    boundaries. Sweep every boundary up to 2^40 plus off-boundary
    values and pin both engines to Python's n.bit_length()-1."""
    import duckdb

    vals = sorted(
        {1, 2, 3}
        | {(1 << p) + d for p in range(1, 41) for d in (-1, 0, 1)}
    )
    want = [v.bit_length() - 1 for v in vals]
    got_spark = [
        r["bkt"]
        for r in spark.createDataFrame([(v,) for v in vals], "n_chars long")
        .select(
            (F.length(F.bin(F.greatest(F.col("n_chars"), F.lit(1)))) - 1)
            .cast("long").alias("bkt")
        )
        .collect()
    ]
    assert got_spark == want
    got_duck = [
        int(r[0])
        for r in duckdb.sql(
            "SELECT CAST(length(bin(GREATEST(n, 1))) - 1 AS BIGINT) "
            "FROM (SELECT unnest(?::BIGINT[]) n)",
            params=[vals],
        ).fetchall()
    ]
    assert got_duck == want


def test_es_sample_matches_pure_python_and_weight_monotone(spark, tmp_path):
    """The ES-via-max-of-w-uniforms keys must equal the pure-Python
    reference (max of w md5 draws) exactly, and a weight-8 clone of a
    doc must receive a key >= its weight-1 clone's (the max over a
    superset of the same draws — the monotonicity the U^(1/w) identity
    guarantees pointwise here by construction)."""
    import hashlib

    import pandas as pd

    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.functions.corpus_queries import _ES_K, _ES_SEED
    from scip_spark.queries import REGISTRY

    rows = [(i, "t " * 40, "en", "s0", (i % 8) * 512 + 10) for i in range(120)]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = tmp_path / "es"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    got = REGISTRY["corpus_es_sample"].fn(spark, str(d)).collect()
    assert len(got) == min(_ES_K, 120)

    def key(doc_id, w):
        return max(
            int(hashlib.md5(f"{_ES_SEED}|{doc_id}|{j}".encode()).hexdigest()[:12], 16)
            for j in range(1, w + 1)
        )

    weights = {i: min(1 + n // 512, 8) for i, _, _, _, n in rows}
    want = sorted(
        ((key(i, w), i, w) for i, w in weights.items()),
        key=lambda t: (-t[0], t[1]),
    )[:_ES_K]
    assert [(r["es_key"], r["doc_id"], r["w"]) for r in got] == want
    # per-doc monotonicity: the same doc's key at w=8 dominates w=1
    for i in range(20):
        assert key(i, 8) >= key(i, 1)


def test_length_batches_match_pure_python_packing(spark, tmp_path):
    """The two-level distributed cumsum packing must equal the
    single-threaded reference: per length bucket, docs in md5 order,
    batch = preceding-total div capacity; per-batch stats and padding
    efficiency exact."""
    import hashlib

    import pandas as pd

    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.functions.corpus import SPLIT_BUCKETS
    from scip_spark.functions.corpus_queries import _LB_CAP, _LB_SEED
    from scip_spark.queries import REGISTRY

    rows = [
        (i, "w " * (3 + (i * 37) % 400), "en", "s0", 1) for i in range(300)
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = tmp_path / "lb"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    got = {
        (r["len_bucket"], r["batch_id"]): r
        for r in REGISTRY["corpus_length_batches"].fn(spark, str(d)).collect()
    }

    def ordkey(i):
        h = hashlib.md5(f"{_LB_SEED}|{i}".encode()).hexdigest()[:12]
        return int(h, 16) % SPLIT_BUCKETS

    per_bucket: dict = {}
    for i, text, *_ in rows:
        t = max(len(text.split()), 1)
        per_bucket.setdefault(t.bit_length() - 1, []).append((ordkey(i), i, t))
    want: dict = {}
    for lb, docs in per_bucket.items():
        cum = 0
        for _, _, t in sorted(docs):
            bid = cum // _LB_CAP
            cum += t
            key = (lb, bid)
            n, s, m = want.get(key, (0, 0, 0))
            want[key] = (n + 1, s + t, max(m, t))
    assert set(got) == set(want)
    for key, (n, s, m) in want.items():
        r = got[key]
        assert (r["n_docs"], r["sum_tokens"], r["max_tokens"]) == (n, s, m), key
        assert r["pad_efficiency_fp"] == s * (1 << 20) // (n * m)
        assert 0 < r["pad_efficiency_fp"] <= (1 << 20)
