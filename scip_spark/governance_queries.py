"""Data-governance operators: SCD2 dimension-history construction and
privacy-preserving pseudonymization with k-anonymity suppression.

These are the warehouse-side twins of the reference's export stage
(reference src/scip/main.py:214-243 writes derived, user-facing
tables): a training-data platform additionally needs versioned
dimension history (reproducible "as-of" joins against mutable
metadata) and identifier scrubbing before a corpus leaves the
trust boundary.

Scale notes (100 TB):
- SCD2 is one window pass partitioned by the dimension key — shuffle
  on o_custkey only, lead() within the sorted partition, no joins.
- Pseudonymization is pure per-row column algebra (keyed md5). The
  k-anonymity group counts aggregate map-side first; the count table
  (one row per (event_type, hour) — bounded, tiny) broadcasts back,
  so the event stream itself shuffles zero bytes for the suppression.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scip_spark.queries import register, tbl

_SCD2_SQL = """
    SELECT o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           COALESCE(strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d'), '9999-12-31') AS valid_to,
           LEAD(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register(
    "scd2_customer_orders",
    _SCD2_SQL,
    doc="SCD2 dimension-history build: each customer's orders become "
    "versioned validity intervals [valid_from, valid_to) with an "
    "is_current flag — one window pass, shuffle on the dimension "
    "key only, open intervals closed by lead()",
)
def scd2_customer_orders(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        F.row_number().over(w).cast("long").alias("version"),
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(F.date_format(nxt, "yyyy-MM-dd"), F.lit("9999-12-31")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


_K = 5

_PSEUDO_SQL = f"""
    WITH p AS (
      SELECT md5('pseudo-v1:' || CAST(user_id AS VARCHAR)) AS user_pseudo,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             event_type
      FROM events
    ),
    k AS (
      SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS grp_n
      FROM p GROUP BY event_type, hour
    )
    SELECT p.user_pseudo, p.hour, p.event_type, k.grp_n
    FROM p JOIN k USING (event_type, hour)
    WHERE k.grp_n >= {_K}
"""


@register(
    "pseudonymize_events",
    _PSEUDO_SQL,
    doc=f"privacy scrub: keyed-hash pseudonymization of user ids, "
    f"timestamp coarsened to the hour, and k-anonymity suppression "
    f"(rows in (event_type, hour) groups smaller than k={_K} are "
    f"dropped); group counts broadcast back so the event stream "
    f"never shuffles",
)
def pseudonymize_events(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    p = ev.select(
        F.md5(F.concat(F.lit("pseudo-v1:"), F.col("user_id").cast("string"))).alias(
            "user_pseudo"
        ),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
    )
    k = p.groupBy("event_type", "hour").agg(F.count("*").cast("long").alias("grp_n"))
    return (
        p.join(F.broadcast(k.filter(F.col("grp_n") >= _K)), ["event_type", "hour"])
        .select("user_pseudo", "hour", "event_type", "grp_n")
    )


# ---------------------------------------------------------------------------
# Reconciliation: order-independent table checksums + CDC snapshot diff
# ---------------------------------------------------------------------------

# 2^61 - 1 (Mersenne): checksum modulus. Row hashes are 48-bit md5
# prefixes summed EXACTLY as decimals, then reduced — identical integer
# arithmetic on both engines, independent of aggregation order.
_M61 = (1 << 61) - 1


def _row_hash_sql(cols: str) -> str:
    return f"CAST(('0x' || substr(md5({cols}), 1, 12)) AS BIGINT)"


def _checksum_sql(tbl: str, cols: str) -> str:
    return f"""
      SELECT '{tbl}' AS tbl,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(CAST(SUM(CAST({_row_hash_sql(cols)} AS DECIMAL(38, 0))) AS DECIMAL(38,0))
                  % {_M61} AS BIGINT) AS checksum
      FROM {tbl}
    """


# Canonical row representation: every column rendered engine-neutrally
# (decimals for money, strftime for dates) and joined with '|'.
_CHECKSUM_TABLES = {
    "orders": "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), "
    "o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), "
    "strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)",
    "customer": "concat_ws('|', CAST(c_custkey AS VARCHAR), c_name, "
    "CAST(c_nationkey AS VARCHAR), CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR), "
    "c_mktsegment)",
    "supplier": "concat_ws('|', CAST(s_suppkey AS VARCHAR), s_name, "
    "CAST(s_nationkey AS VARCHAR), CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS VARCHAR))",
}

_CHECKSUM_SQL = " UNION ALL ".join(
    _checksum_sql(t, cols) for t, cols in _CHECKSUM_TABLES.items()
)


@register(
    "table_checksum",
    _CHECKSUM_SQL,
    doc="cross-system reconciliation: order-independent table "
    "fingerprint (48-bit md5 row-hash prefixes summed exactly as "
    "decimals, reduced mod 2^61-1) — map-side combinable, so a "
    "100 TB table checksums in one scan with a 16-byte shuffle "
    "per partition",
)
def table_checksum(spark, sf_dir):
    from pyspark.sql import types as T

    outs = []
    for t in _CHECKSUM_TABLES:
        df = tbl(spark, sf_dir, t)
        if t == "orders":
            repr_col = F.concat_ws(
                "|",
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                "o_orderstatus",
                F.col("o_totalprice").cast(T.DecimalType(18, 2)).cast("string"),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
                "o_orderpriority",
            )
        elif t == "customer":
            repr_col = F.concat_ws(
                "|",
                F.col("c_custkey").cast("string"),
                "c_name",
                F.col("c_nationkey").cast("string"),
                F.col("c_acctbal").cast(T.DecimalType(18, 2)).cast("string"),
                "c_mktsegment",
            )
        else:
            repr_col = F.concat_ws(
                "|",
                F.col("s_suppkey").cast("string"),
                "s_name",
                F.col("s_nationkey").cast("string"),
                F.col("s_acctbal").cast(T.DecimalType(18, 2)).cast("string"),
            )
        h = F.conv(F.substring(F.md5(repr_col), 1, 12), 16, 10).cast("long")
        outs.append(
            df.agg(
                F.count("*").cast("long").alias("n_rows"),
                (F.sum(h.cast(T.DecimalType(38, 0))) % _M61).cast("long").alias("checksum"),
            ).select(F.lit(t).alias("tbl"), "n_rows", "checksum")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# CDC snapshot diff: two deterministic snapshots derived from orders
# (old misses keys %7==0; new misses %11==0 and reprices %5==0), then a
# single full-outer join on the key classifies added/removed/changed.
_DIFF_SQL = """
    WITH old AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2))
               + CASE WHEN o_orderkey % 5 = 0 THEN CAST(10 AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END AS price
      FROM orders WHERE o_orderkey % 11 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           CAST(o.price AS DOUBLE) AS old_price,
           CAST(n.price AS DOUBLE) AS new_price
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.price <> n.price
"""


@register(
    "snapshot_diff_orders",
    _DIFF_SQL,
    doc="CDC snapshot diff: one full-outer join on the key classifies "
    "rows as added/removed/changed between two table versions; "
    "unchanged rows are filtered pre-output so only the delta "
    "leaves the join",
)
def snapshot_diff_orders(spark, sf_dir):
    from pyspark.sql import types as T

    orders = tbl(spark, sf_dir, "orders")
    dec = T.DecimalType(18, 2)
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.col("o_totalprice").cast(dec).alias("price")
    )
    new = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        (
            F.col("o_totalprice").cast(dec)
            + F.when(F.col("o_orderkey") % 5 == 0, F.lit(10).cast(dec)).otherwise(
                F.lit(0).cast(dec)
            )
        ).alias("price"),
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    return joined.filter(
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("o.price") != F.col("n.price"))
    ).select(
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("o.o_orderkey").isNull(), "added")
        .when(F.col("n.o_orderkey").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        F.col("o.price").cast("double").alias("old_price"),
        F.col("n.price").cast("double").alias("new_price"),
    )


@register(
    "pii_scrub_customers",
    """
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', 'X', 'g') AS name_masked,
           CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT) AS digits_redacted,
           regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS name_tokenized
    FROM customer
    """,
    doc="PII scrubbing pass over identifying strings: mask every digit, "
    "count redactions, and collapse numeric identifier runs to a "
    "placeholder token — per-row regex column algebra (JVM-side "
    "regexp_replace, no UDF, no shuffle); the training-data analogue "
    "is scrubbing emails/phones/ids from documents before tokenization",
)
def pii_scrub_customers(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    name = F.col("c_name")
    return cust.select(
        "c_custkey",
        F.regexp_replace(name, "[0-9]", "X").alias("name_masked"),
        (F.length(name) - F.length(F.regexp_replace(name, "[0-9]", "")))
        .cast("long")
        .alias("digits_redacted"),
        F.regexp_replace(name, "[0-9]+", "<ID>").alias("name_tokenized"),
    )


@register(
    "cdc_apply_merge",
    """
    WITH old AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    changes AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN 'delete' ELSE 'upsert' END AS op,
             CAST(o_totalprice AS DECIMAL(18,2)) + 10 AS price
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    merged AS (
      SELECT coalesce(c.o_orderkey, o.o_orderkey) AS o_orderkey,
             CASE WHEN c.op = 'delete' THEN NULL
                  WHEN c.op = 'upsert' THEN c.price
                  ELSE o.price END AS price,
             CASE WHEN c.op = 'delete' THEN 'deleted'
                  WHEN c.op = 'upsert' AND o.o_orderkey IS NULL THEN 'inserted'
                  WHEN c.op = 'upsert' THEN 'updated'
                  ELSE 'kept' END AS outcome
      FROM old o FULL OUTER JOIN changes c USING (o_orderkey)
    )
    SELECT CAST(SUM(CASE WHEN outcome <> 'deleted' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rows,
           CAST(SUM(CASE WHEN outcome <> 'deleted' THEN price END) AS DOUBLE)
             AS total_price,
           CAST(SUM(CASE WHEN outcome = 'inserted' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inserted,
           CAST(SUM(CASE WHEN outcome = 'updated' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_updated,
           CAST(SUM(CASE WHEN outcome = 'deleted' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_deleted
    FROM merged
    """,
    doc="MERGE semantics (the companion to snapshot_diff_orders): a "
    "changeset of upserts+deletes applied to a snapshot in ONE "
    "key-partitioned full-outer join — changeset wins, deletes drop, "
    "inserts surface; the decimal-exact post-merge rollup is what an "
    "incremental 100 TB table-maintenance job verifies against",
)
def cdc_apply_merge(spark, sf_dir):
    from pyspark.sql import types as T

    dec = T.DecimalType(18, 2)
    orders = tbl(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.col("o_totalprice").cast(dec).alias("price")
    )
    changes = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 13 == 0, "delete")
        .otherwise("upsert")
        .alias("op"),
        (F.col("o_totalprice").cast(dec) + 10).alias("cprice"),
    )
    merged = old.join(changes, "o_orderkey", "full_outer").select(
        F.when(F.col("op") == "delete", F.lit(None).cast(dec))
        .when(F.col("op") == "upsert", F.col("cprice"))
        .otherwise(F.col("price"))
        .alias("price"),
        F.when(F.col("op") == "delete", "deleted")
        .when((F.col("op") == "upsert") & F.col("price").isNull(), "inserted")
        .when(F.col("op") == "upsert", "updated")
        .otherwise("kept")
        .alias("outcome"),
    )
    return merged.agg(
        F.sum(F.when(F.col("outcome") != "deleted", 1).otherwise(0))
        .cast("long")
        .alias("n_rows"),
        F.sum(F.when(F.col("outcome") != "deleted", F.col("price")))
        .cast("double")
        .alias("total_price"),
        F.sum(F.when(F.col("outcome") == "inserted", 1).otherwise(0))
        .cast("long")
        .alias("n_inserted"),
        F.sum(F.when(F.col("outcome") == "updated", 1).otherwise(0))
        .cast("long")
        .alias("n_updated"),
        F.sum(F.when(F.col("outcome") == "deleted", 1).otherwise(0))
        .cast("long")
        .alias("n_deleted"),
    )


@register(
    "l_diversity_audit",
    """
    WITH q AS (
      SELECT c_nationkey AS nation,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             c_mktsegment AS sensitive
      FROM customer
    ),
    g AS (
      SELECT nation, bal_band,
             CAST(COUNT(*) AS BIGINT) AS grp_n,
             CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_distinct
      FROM q GROUP BY nation, bal_band
    )
    SELECT nation, bal_band, grp_n, l_distinct,
           l_distinct >= 3 AS l_diverse
    FROM g
    """,
    doc="l-diversity audit on top of k-anonymity: for each "
    "quasi-identifier group (nation x account-balance band), the "
    "number of DISTINCT sensitive values (market segment) — groups "
    "below l=3 are re-identification risks even when k-anonymous "
    "(homogeneity attack). One groupBy pass; the quasi-group relation "
    "is bounded by quasi-key cardinality, not data size",
)
def l_diversity_audit(spark, sf_dir):
    q = tbl(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        F.col("c_mktsegment").alias("sensitive"),
    )
    return (
        q.groupBy("nation", "bal_band")
        .agg(
            F.count("*").cast("long").alias("grp_n"),
            F.count_distinct("sensitive").cast("long").alias("l_distinct"),
        )
        .select(
            "nation",
            "bal_band",
            "grp_n",
            "l_distinct",
            (F.col("l_distinct") >= 3).alias("l_diverse"),
        )
    )


@register(
    "pit_join_lineitem_scd2",
    """
    WITH dim AS (
      SELECT o_custkey AS custkey,
             ROW_NUMBER() OVER w AS version,
             CAST(o_orderdate AS DATE) AS valid_from
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    probe AS (
      SELECT DISTINCT l.l_orderkey, l.l_linenumber,
             CAST(l.l_shipdate AS DATE) AS d, o.o_custkey AS custkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    matched AS (
      SELECT p.l_orderkey, p.l_linenumber, p.d, dim.version, dim.valid_from,
             ROW_NUMBER() OVER (
               PARTITION BY p.l_orderkey, p.l_linenumber, p.d
               ORDER BY dim.valid_from DESC NULLS LAST, dim.version DESC NULLS LAST
             ) AS rn
      FROM probe p
      LEFT JOIN dim ON dim.custkey = p.custkey AND dim.valid_from <= p.d
    )
    SELECT l_orderkey, l_linenumber, strftime(d, '%Y-%m-%d') AS ship_day,
           CAST(version AS BIGINT) AS version,
           strftime(valid_from, '%Y-%m-%d') AS valid_from
    FROM matched WHERE rn = 1
    """,
    doc="point-in-time (as-of) join of a fact stream against the SCD2 "
    "dimension history: which customer order-version was current when "
    "each lineitem SHIPPED. Scalable form = ONE union sweep per "
    "dimension key (dim rows and probe rows interleaved by date, "
    "version carried forward) — never the probe x versions "
    "theta-join the oracle runs. Probes are DISTINCT "
    "(orderkey, linenumber, ship-day) tuples — the synthetic lineitem "
    "repeats line numbers — and a probe shipping before the "
    "customer's first version carries NULL (left semantics)",
)
def pit_join_lineitem_scd2(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    w = W.partitionBy("custkey").orderBy("valid_from", "version")
    dim = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.to_date("o_orderdate").alias("valid_from"),
        "o_orderkey",
    ).select(
        "custkey",
        "valid_from",
        F.row_number()
        .over(W.partitionBy("custkey").orderBy("valid_from", "o_orderkey"))
        .cast("long")
        .alias("version"),
    )
    probe = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == orders.o_orderkey,
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.to_date("l_shipdate").alias("d"),
            "l_orderkey",
            "l_linenumber",
        )
        .distinct()
    )
    # union sweep: dim rows sort BEFORE probes on the same date (kind 0
    # vs 1: valid_from <= d is inclusive), versions ascending so the
    # carried value is the max version effective at each probe date
    dim_u = dim.select(
        "custkey",
        F.col("valid_from").alias("d"),
        F.lit(0).alias("kind"),
        F.col("version").alias("tb"),
        "version",
        "valid_from",
        F.lit(None).cast("long").alias("l_orderkey"),
        F.lit(None).cast("int").alias("l_linenumber"),
    )
    probe_u = probe.select(
        "custkey",
        "d",
        F.lit(1).alias("kind"),
        (F.col("l_orderkey") * 1000 + F.col("l_linenumber")).cast("long").alias("tb"),
        F.lit(None).cast("long").alias("version"),
        F.lit(None).cast("date").alias("valid_from"),
        "l_orderkey",
        "l_linenumber",
    )
    sweep = W.partitionBy("custkey").orderBy("d", "kind", "tb").rowsBetween(
        W.unboundedPreceding, 0
    )
    carried = dim_u.unionByName(probe_u).select(
        "kind",
        "l_orderkey",
        "l_linenumber",
        "d",
        F.last("version", ignorenulls=True).over(sweep).alias("version"),
        F.last("valid_from", ignorenulls=True).over(sweep).alias("vf"),
    )
    return carried.filter(F.col("kind") == 1).select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        F.date_format("d", "yyyy-MM-dd").alias("ship_day"),
        "version",
        F.date_format("vf", "yyyy-MM-dd").alias("valid_from"),
    )


# ---------------------------------------------------------------------------
# Right-to-be-forgotten cascade: the GDPR erasure audit a 100-TB
# warehouse runs — purge a deterministic forget-set of customers and
# every row reachable from them (orders -> lineitem; events by user),
# reporting per-table purge counts plus an order-independent checksum
# of what REMAINS (the proof-of-erasure artifact).
# ---------------------------------------------------------------------------
_RTBF_MOD = 97  # forget set: custkey % 97 == 0 (deterministic stand-in)


def _rtbf_branch_sql(tbl_name: str, src: str, purged: str, key: str) -> str:
    """One per-table branch: purge/remaining counts + the
    order-independent checksum of the REMAINING keys (48-bit md5
    prefixes summed exactly as decimals, reduced mod 2^61-1)."""
    return f"""
      SELECT '{tbl_name}' AS tbl,
             CAST(SUM(CASE WHEN {purged} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purged,
             CAST(SUM(CASE WHEN {purged} THEN 0 ELSE 1 END) AS BIGINT)
               AS n_remaining,
             CAST(CAST(SUM(CASE WHEN {purged} THEN 0
                           ELSE CAST({_row_hash_sql(key)} AS DECIMAL(38,0))
                      END) AS DECIMAL(38,0)) % {_M61} AS BIGINT)
               AS remaining_checksum
      FROM {src}
    """


_RTBF_SQL = f"""
    WITH ords AS (
      SELECT o_orderkey, o_custkey % {_RTBF_MOD} = 0 AS purged
      FROM orders
    ),
    li AS (
      SELECT concat_ws('|', CAST(l_orderkey AS VARCHAR),
                       CAST(l_linenumber AS VARCHAR)) AS k,
             o.purged
      FROM lineitem l JOIN ords o ON l.l_orderkey = o.o_orderkey
    )
    SELECT * FROM (
    {_rtbf_branch_sql("customer", "customer",
                      f"c_custkey % {_RTBF_MOD} = 0",
                      "CAST(c_custkey AS VARCHAR)")}
    UNION ALL
    {_rtbf_branch_sql("orders", "ords", "purged",
                      "CAST(o_orderkey AS VARCHAR)")}
    UNION ALL
    {_rtbf_branch_sql("lineitem", "li", "purged", "k")}
    UNION ALL
    {_rtbf_branch_sql("events", "events",
                      f"user_id % {_RTBF_MOD} = 0",
                      "CAST(event_id AS VARCHAR)")}
    ) ORDER BY tbl
    """


@register(
    "rtbf_cascade_delete",
    _RTBF_SQL,
    doc="right-to-be-forgotten CASCADE audit (GDPR art. 17 erasure "
    "over a warehouse): purge a deterministic customer forget-set "
    "and everything reachable from it — their orders, those orders' "
    "lineitems (one key-only join), their events — and emit, per "
    "table, purge/remaining counts plus the order-independent "
    "48-bit-md5 checksum of the REMAINING keys (decimal-exact sum "
    "mod 2^61-1, the table_checksum discipline) — the "
    "proof-of-erasure artifact a regulator audit replays. Scale "
    "shape: customer/orders/events purge by predicate at the scan "
    "(no join); only lineitem needs the o_orderkey join, key-only "
    "and map-side-combined to 4 result rows.",
)
def rtbf_cascade_delete(spark, sf_dir):
    def khash(col):
        return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")

    def summary(name, df, purged_col, key_col):
        return df.agg(
            F.lit(name).alias("tbl"),
            F.sum(F.when(purged_col, 1).otherwise(0)).cast("long").alias("n_purged"),
            F.sum(F.when(purged_col, 0).otherwise(1)).cast("long").alias("n_remaining"),
            (
                F.sum(
                    F.when(purged_col, F.lit(0).cast("decimal(38,0)")).otherwise(
                        khash(key_col).cast("decimal(38,0)")
                    )
                ).cast("decimal(38,0)")
                % _M61
            ).cast("long").alias("remaining_checksum"),
        )

    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_custkey") % _RTBF_MOD == 0).alias("purged")
    )
    li = tbl(spark, sf_dir, "lineitem").select(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("k"),
        "l_orderkey",
    ).join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    ev = tbl(spark, sf_dir, "events")

    out = (
        summary("customer", cust, F.col("c_custkey") % _RTBF_MOD == 0,
                F.col("c_custkey").cast("string"))
        .unionByName(summary("orders", orders, F.col("purged"),
                             F.col("o_orderkey").cast("string")))
        .unionByName(summary("lineitem", li, F.col("purged"), F.col("k")))
        .unionByName(summary("events", ev, F.col("user_id") % _RTBF_MOD == 0,
                             F.col("event_id").cast("string")))
    )
    return out


# ε-LDP randomized response: truth-telling probability p = 3/4 over a
# 60-bit md5 coin (exact integer compare in both engines), so
# ε = ln(p/(1-p)) = ln 3. The unbiased de-bias of the observed count is
# est = (obs - (1-p)·n)/(2p-1) = (4·obs - n)/2 — an exact integer
# rational reported on the 2^20 grid.
_RR_COIN_BITS = 60
_RR_THRESH = 3 * (1 << (_RR_COIN_BITS - 2))  # p = 3/4 of 2^60


@register(
    "dp_randomized_response",
    f"""
    WITH t AS (
      SELECT c_mktsegment,
             (c_acctbal < 0) AS truth,
             CAST(('0x' || substr(md5('rr-v1|' || CAST(c_custkey AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS coin
      FROM customer
    ),
    r AS (
      SELECT c_mktsegment,
             CASE WHEN coin < {_RR_THRESH} THEN truth ELSE NOT truth END
               AS reported,
             truth
      FROM t
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN reported THEN 1 ELSE 0 END) AS BIGINT) AS obs_true,
           CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS true_count,
           CAST((4 * SUM(CASE WHEN reported THEN 1 ELSE 0 END) - COUNT(*))
                * 1048576 // 2 AS BIGINT) AS est_true_fp
    FROM r GROUP BY c_mktsegment
    """,
    doc="local-differential-privacy counting via randomized response "
    "(Warner 1965; the local-DP primitive RAPPOR builds on): each row "
    "reports its sensitive bit (negative balance) truthfully with "
    "p = 3/4, flipped otherwise — ε = ln 3 per row — and the per-"
    "segment release carries the observed noisy count plus the "
    "unbiased de-bias (4·obs − n)/2 on the 2^20 grid. The coin is a "
    "keyed 60-bit md5 draw compared as an exact integer, so the "
    "'noise' is deterministic cross-engine and the release hash-"
    "matches (a production run swaps the versioned salt per release; "
    "true_count is emitted here only to make utility testable). "
    "Scale shape: pure per-row column algebra + one map-side-combined "
    "G-row aggregation — zero extra shuffle at any size.",
)
def dp_randomized_response(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    coin = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("rr-v1|"), F.col("c_custkey").cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    t = cust.select(
        "c_mktsegment",
        (F.col("c_acctbal") < 0).alias("truth"),
        coin.alias("coin"),
    )
    r = t.select(
        "c_mktsegment",
        "truth",
        F.when(F.col("coin") < _RR_THRESH, F.col("truth"))
        .otherwise(~F.col("truth"))
        .alias("reported"),
    )
    obs = F.sum(F.when(F.col("reported"), 1).otherwise(0))
    return r.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n"),
        obs.cast("long").alias("obs_true"),
        F.sum(F.when(F.col("truth"), 1).otherwise(0))
        .cast("long")
        .alias("true_count"),
        F.expr(
            "(4 * sum(CASE WHEN reported THEN 1 ELSE 0 END) - count(*))"
            " * 1048576L div 2"
        ).cast("long").alias("est_true_fp"),
    )


@register(
    "pii_luhn_audit",
    """
    WITH d AS (
      SELECT c_nationkey,
             regexp_replace(c_name, '[^0-9]', '', 'g') AS ds
      FROM customer
    ),
    s AS (
      SELECT c_nationkey, length(ds) AS n_digits,
             list_sum(list_transform(generate_series(1, length(ds)), i ->
               CASE WHEN i % 2 = 1
                    THEN CAST(substr(ds, length(ds) - i + 1, 1) AS INTEGER)
                    ELSE CASE
                      WHEN 2 * CAST(substr(ds, length(ds) - i + 1, 1) AS INTEGER) > 9
                      THEN 2 * CAST(substr(ds, length(ds) - i + 1, 1) AS INTEGER) - 9
                      ELSE 2 * CAST(substr(ds, length(ds) - i + 1, 1) AS INTEGER)
                    END
               END)) AS luhn_sum
      FROM d
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN n_digits >= 9 AND luhn_sum % 10 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_luhn_valid,
           CAST(SUM(CASE WHEN n_digits >= 9 AND luhn_sum % 10 = 0
                         THEN 1 ELSE 0 END) * 1048576
                // COUNT(*) AS BIGINT) AS luhn_frac_fp
    FROM s GROUP BY c_nationkey
    """,
    doc="DLP numeric-identifier audit: the Luhn mod-10 checksum (ISO/"
    "IEC 7812 — what payment-card and IMEI numbers satisfy) evaluated "
    "over every digit string in the customer-name field, per nation "
    "(the synthetic schema's only digit-bearing column) — the "
    "pre-release scan that catches card-shaped identifiers leaking "
    "into a corpus (a phone number passes by chance ~10%, so the "
    "per-group PASS RATE is the signal: a population of real PANs "
    "audits at ~100%). Pure per-row integer column algebra (reversed-"
    "position doubling via one fold, no UDF) + one G-row aggregation; "
    "exact in both engines, so the audit hash-matches.",
)
def pii_luhn_audit(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    ds = F.regexp_replace("c_name", "[^0-9]", "")
    d = cust.select("c_nationkey", ds.alias("ds"))
    # one fold over 1-based positions FROM THE RIGHT: odd positions
    # verbatim, even positions doubled with the >9 - 9 wrap (Luhn)
    luhn_sum = F.aggregate(
        F.sequence(F.lit(1), F.length("ds")),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            i % 2 == 1,
            F.substring(F.col("ds"), F.length("ds") - i + 1, 1).cast("int"),
        ).otherwise(
            F.when(
                2 * F.substring(F.col("ds"), F.length("ds") - i + 1, 1).cast("int") > 9,
                2 * F.substring(F.col("ds"), F.length("ds") - i + 1, 1).cast("int") - 9,
            ).otherwise(
                2 * F.substring(F.col("ds"), F.length("ds") - i + 1, 1).cast("int")
            )
        ),
    )
    s = d.select(
        "c_nationkey",
        F.length("ds").alias("n_digits"),
        luhn_sum.alias("luhn_sum"),
    )
    hit = F.when(
        (F.col("n_digits") >= 9) & (F.col("luhn_sum") % 10 == 0), 1
    ).otherwise(0)
    return s.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(hit).cast("long").alias("n_luhn_valid"),
        F.expr(
            "sum(CASE WHEN n_digits >= 9 AND luhn_sum % 10 = 0 THEN 1 ELSE 0 END)"
            " * 1048576L div count(*)"
        ).cast("long").alias("luhn_frac_fp"),
    )
