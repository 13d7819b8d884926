"""SCD2 interval chaining, pseudonymization/k-anonymity invariants, and
the grouping-sets / unpivot relational shapes."""

from pyspark.sql import functions as F

from scip_spark.advanced_queries import grouping_sets_revenue, unpivot_part_metrics
from scip_spark.governance_queries import pseudonymize_events, scd2_customer_orders

SF = "/root/testdata/sf0.01"


def test_scd2_intervals_chain(spark):
    out = scd2_customer_orders(spark, SF).cache()
    # exactly one open (is_current) interval per customer
    open_per_cust = out.filter("is_current").groupBy("o_custkey").count()
    assert open_per_cust.filter("count != 1").count() == 0
    # version n's valid_to == version n+1's valid_from (gap-free chain)
    nxt = out.select(
        "o_custkey", (F.col("version") - 1).alias("version"), F.col("valid_from").alias("nf")
    )
    joined = out.join(nxt, ["o_custkey", "version"])
    assert joined.filter(F.col("valid_to") != F.col("nf")).count() == 0
    # closed intervals are properly ordered
    closed = out.filter("NOT is_current")
    assert closed.filter(F.col("valid_from") > F.col("valid_to")).count() == 0
    out.unpersist()


def test_pseudonymize_suppresses_small_groups(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = pseudonymize_events(spark, SF).cache()
    assert out.filter(F.col("grp_n") < 5).count() == 0
    assert out.count() < ev.count()  # something was actually suppressed
    # pseudonym is a stable function of user_id: distinct pseudonyms
    # cannot exceed distinct user ids
    n_users = ev.select("user_id").distinct().count()
    assert out.select("user_pseudo").distinct().count() <= n_users
    # no raw identifier or full-precision timestamp columns leak through
    assert set(out.columns) == {"user_pseudo", "hour", "event_type", "grp_n"}
    out.unpersist()


def test_grouping_sets_levels(spark):
    rows = grouping_sets_revenue(spark, SF).collect()
    gids = {r.gid for r in rows}
    assert gids == {0, 1, 3}  # (rf,ls), (rf), () — and no ls-only set
    total = [r for r in rows if r.gid == 3]
    assert len(total) == 1 and total[0].n == sum(r.n for r in rows if r.gid == 0)


def test_unpivot_roundtrip(spark):
    part = spark.read.parquet(f"{SF}/part.parquet")
    out = unpivot_part_metrics(spark, SF)
    assert out.count() == 2 * part.count()
    back = (
        out.groupBy("p_partkey")
        .pivot("metric")
        .agg(F.first("value"))
        .select("p_partkey", "p_size", "p_retailprice")
    )
    orig = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    assert back.exceptAll(orig).count() == 0 and orig.exceptAll(back).count() == 0


def test_table_checksum_detects_single_row_change(spark, tmp_path):
    """The reconciliation property: equal data -> equal checksum; one
    changed cell -> different checksum, same row count."""
    from scip_spark.governance_queries import table_checksum

    base = {r.tbl: r for r in table_checksum(spark, SF).collect()}
    # copy sf dir with one mutated supplier row
    import duckdb

    for t in ["orders", "customer", "supplier"]:
        if t == "supplier":
            duckdb.connect().execute(
                f"COPY (SELECT s_suppkey, CASE WHEN s_suppkey = 1 THEN 'MUTATED' "
                f"ELSE s_name END AS s_name, s_nationkey, s_acctbal "
                f"FROM '{SF}/{t}.parquet') TO '{tmp_path}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            duckdb.connect().execute(
                f"COPY (SELECT * FROM '{SF}/{t}.parquet') TO '{tmp_path}/{t}.parquet' "
                f"(FORMAT PARQUET)"
            )
    mutated = {r.tbl: r for r in table_checksum(spark, str(tmp_path)).collect()}
    for t in ["orders", "customer"]:
        assert mutated[t].checksum == base[t].checksum
    assert mutated["supplier"].n_rows == base["supplier"].n_rows
    assert mutated["supplier"].checksum != base["supplier"].checksum


def test_snapshot_diff_classes(spark):
    from scip_spark.governance_queries import snapshot_diff_orders

    out = snapshot_diff_orders(spark, SF).cache()
    by_type = {r.change_type: r["count"] for r in out.groupBy("change_type").count().collect()}
    assert set(by_type) == {"added", "removed", "changed"}
    # added rows: in new only => keys divisible by 7 but not 11
    added_bad = out.filter("change_type = 'added' AND (o_orderkey % 7 != 0 OR o_orderkey % 11 = 0)")
    assert added_bad.count() == 0
    assert out.filter("change_type = 'added' AND old_price IS NOT NULL").count() == 0
    assert out.filter("change_type = 'removed' AND new_price IS NOT NULL").count() == 0
    # changed rows are exactly the repriced (%5) keys present in both
    chg_bad = out.filter("change_type = 'changed' AND o_orderkey % 5 != 0")
    assert chg_bad.count() == 0
    assert out.filter("change_type = 'changed' AND new_price - old_price != 10").count() == 0
    out.unpersist()


def test_interval_self_overlap_sweep_equals_bruteforce(spark):
    """The one-pass sweep must agree with quadratic pair checking on
    planted shapes: chains, nesting, a long interval dominating several
    short followers (running max, not lag), equal starts, singletons."""
    from itertools import combinations

    from scip_spark.advanced_queries import interval_self_overlap

    rows = [
        # key, id, start, end
        ("chain", 1, 0, 30), ("chain", 2, 10, 40), ("chain", 3, 100, 130),
        ("nested", 1, 0, 30), ("nested", 2, 5, 35), ("nested", 3, 200, 230),
        ("single", 1, 0, 30),
        ("tie", 1, 0, 30), ("tie", 2, 0, 5),
        # long first interval dominates; immediate predecessor of C ends
        # before C starts -> lag(end) would miss the overlap, max must not
        ("dominate", 1, 0, 100), ("dominate", 2, 1, 2), ("dominate", 3, 50, 60),
        ("disjoint", 1, 0, 10), ("disjoint", 2, 20, 30), ("disjoint", 3, 40, 50),
        # touching endpoints: closed intervals DO overlap at the boundary
        ("touch", 1, 0, 10), ("touch", 2, 10, 20),
        # degenerate (end < start) = empty interval: overlaps NOTHING,
        # and must not poison its neighbors' running max
        ("degen", 1, 0, 10), ("degen", 2, 5, -1), ("degen", 3, 8, 20),
    ]
    df = spark.createDataFrame(rows, ["k", "id", "s", "e"])
    got = {
        (r.k, r.id): r.has_overlap
        for r in interval_self_overlap(df, "k", "s", "e", "id").collect()
    }
    by_key: dict = {}
    for k, i, s, e in rows:
        by_key.setdefault(k, []).append((i, s, e))
    want = {}
    for k, ivs in by_key.items():
        for i, s, e in ivs:
            want[(k, i)] = any(
                s <= e2 and s2 <= e for j, s2, e2 in ivs if j != i
            )
    assert want[("degen", 2)] is False  # the empty interval itself
    assert want[("degen", 1)] is True and want[("degen", 3)] is True
    assert got == want
    assert want[("dominate", 3)] is True  # the running-max case
    assert want[("touch", 1)] is True


def test_rtbf_cascade_invariants(spark):
    """Erasure accounting must be complete and consistent: per table
    purged+remaining == row count, lineitem purges exactly the
    lineitems of purged orders, and the remaining checksum equals an
    independently computed pure-Python checksum of the surviving keys."""
    import hashlib

    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.governance_queries import _M61, _RTBF_MOD
    from scip_spark.queries import REGISTRY, tbl as _tbl

    sf = "/root/testdata/sf0.001"
    out = {r["tbl"]: r for r in REGISTRY["rtbf_cascade_delete"].fn(spark, sf).collect()}

    counts = {t: _tbl(spark, sf, t).count()
              for t in ["customer", "orders", "lineitem", "events"]}
    for t, n in counts.items():
        assert out[t]["n_purged"] + out[t]["n_remaining"] == n, t

    purged_cust = {
        r["c_custkey"]
        for r in _tbl(spark, sf, "customer").collect()
        if r["c_custkey"] % _RTBF_MOD == 0
    }
    orders = _tbl(spark, sf, "orders").select("o_orderkey", "o_custkey").collect()
    purged_orders = {r["o_orderkey"] for r in orders if r["o_custkey"] % _RTBF_MOD == 0}
    assert out["orders"]["n_purged"] == len(purged_orders)
    assert out["customer"]["n_purged"] == len(purged_cust)

    li = _tbl(spark, sf, "lineitem").select("l_orderkey", "l_linenumber").collect()
    assert out["lineitem"]["n_purged"] == sum(
        1 for r in li if r["l_orderkey"] in purged_orders
    )
    # independent pure-Python checksum of the surviving lineitem keys
    s = sum(
        int(hashlib.md5(f"{r['l_orderkey']}|{r['l_linenumber']}".encode())
            .hexdigest()[:12], 16)
        for r in li if r["l_orderkey"] not in purged_orders
    )
    assert out["lineitem"]["remaining_checksum"] == s % _M61


def test_dp_randomized_response_mechanism(spark):
    """The ε=ln3 randomized-response release: flip rate near 1-p=1/4,
    de-biased estimate within sampling error of the true count, and
    the estimator identity est = (4·obs − n)/2 exact on every row."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    rows = REGISTRY["dp_randomized_response"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    n_tot = sum(r["n"] for r in rows)
    assert n_tot >= 500
    for r in rows:
        assert r["est_true_fp"] == (4 * r["obs_true"] - r["n"]) * (1 << 20) // 2
        # de-biased estimate within 4·sqrt(n) of truth (RR variance
        # bound p(1-p)n/(2p-1)^2 = 3n/4 -> sd ~ 0.87*sqrt(n))
        est = (4 * r["obs_true"] - r["n"]) / 2
        assert abs(est - r["true_count"]) <= 4 * (r["n"] ** 0.5) + 2, r


def test_luhn_audit_known_checksums(spark, tmp_path):
    """The Luhn fold must agree with hand-checked checksums: a real
    test PAN (4539578763621486) passes, off-by-one fails, and the
    short-digit gate keeps sparse strings out of the numerator."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    rows = [
        (1, "Cust#4539578763621486", 0, 10.0, "A"),   # valid PAN
        (2, "Cust#4539578763621487", 0, 10.0, "A"),   # checksum off by 1
        (3, "Cust#79927398713", 0, 10.0, "B"),        # classic Luhn example
        (4, "Cust#123", 0, 10.0, "B"),                # too short: gated out
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, "
              "c_acctbal double, c_mktsegment string"
    ).write.parquet(f"{sf}/customer.parquet")
    got = {
        r["c_nationkey"]: (r["n_customers"], r["n_luhn_valid"])
        for r in REGISTRY["pii_luhn_audit"].fn(spark, sf).collect()
    }
    assert got == {0: (4, 2)}


def test_benford_audit_invariants(spark):
    """Benford audit: digits 1..9 all present, counts total to n, and
    the fixed-point identity dev = obs*2^20 - exp holds per row."""
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    rows = REGISTRY["benford_first_digit_audit"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    n = sum(r["n_obs"] for r in rows)
    assert n > 0
    for r in rows:
        assert r["dev_fp"] == r["n_obs"] * (1 << 20) - r["exp_cnt_fp"]
    # expected-count fps sum to ~n*2^20 (floor loss < 9 grid units)
    s = sum(r["exp_cnt_fp"] for r in rows)
    assert 0 <= n * (1 << 20) - s < 9 * n
