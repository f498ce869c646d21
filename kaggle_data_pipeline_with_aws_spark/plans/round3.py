"""Round-3 operator wave: six TPC-H-shaped relational queries over the
star schema (q61-q66) and six LLM-data-pipeline extensions (d68-d73).

Scale notes shared by the relational six: every dimension that can be
broadcast is (part, supplier, nation, region, the one-row totals); the
fact table (lineitem) is scanned once per query and shuffles at most
once, on the aggregation key; top-k is always a bounded window or
TakeOrdered, never a global sort of the fact table.

The LLM six extend the dedup/sampling/sketch/embedding families:
exact-k per-group sampling (eval-set construction), blocked
edit-distance record linkage, association rules over event baskets,
mergeable KMV set operations across corpora, a deterministic k-means
Lloyd iteration, and seeded random projection for embedding
compression. Everything is oracle-checked; no Python UDFs outside the
Arrow-batched cosine (shared with d20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text
from ..operators.similarity import _plane_sign, cosine_vectorized
from ..operators.text import HASH_MOD, portable_hash, portable_hash_sql
from ..sources.readers import load_table
from .registry import spark_query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q61 — cheapest qualified supplier per part (TPC-H Q2 shape).
# The schema has no partsupp table, so supply cost is the observed mean
# unit price in lineitem — same join/argmin skeleton.
# ---------------------------------------------------------------------------
@spark_query(
    "q61_min_cost_supplier",
    """
    WITH sup AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    pp AS (
      -- mean via a SORTED left fold (pins the summation order in both
      -- engines) and the all-IEEE portable rounding (round() itself
      -- diverges cross-engine on exact .5 ties at the 7th decimal —
      -- see functions/scalars.py::round6_pos_portable).
      SELECT l_partkey, l_suppkey,
             floor(list_reduce(list_prepend(0.0,
                     list_sort(list(l_extendedprice / l_quantity))),
                     (a, b) -> a + b) / count(*)
                   * 1000000.0 + 0.5) / 1000000.0 AS unit_price
      FROM lineitem GROUP BY 1, 2
    ),
    j AS (
      SELECT p.p_partkey, s.s_suppkey, s.s_name, s.n_name, pp.unit_price
      FROM pp
      JOIN part p ON pp.l_partkey = p.p_partkey
      JOIN sup s ON pp.l_suppkey = s.s_suppkey
      WHERE p.p_size < 10
    )
    SELECT p_partkey, s_suppkey, s_name, n_name, unit_price
    FROM (
      SELECT *, row_number() OVER (PARTITION BY p_partkey
                  ORDER BY unit_price ASC, s_suppkey ASC) AS r
      FROM j
    ) WHERE r = 1
    """,
)
def q61_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin-per-part over a fact-derived price table. One fact
    shuffle (the (part, supplier) groupBy — partial-agg'd map-side);
    part and the supplier→nation→region chain are broadcast; the final
    argmin is a per-part window over a dimension-sized intermediate.
    Prices are rounded BEFORE ranking so the rank is engine-stable.

    Determinism (both found by the round-5 sf0.1 sweep): the per-pair
    mean is a sorted left fold (array_sort + aggregate), not avg() —
    plain double avg sums in partition/scan order and can differ by an
    ulp cross-engine — and the rounding is the all-IEEE portable form
    (scalars.round6_pos_portable), because round(x, 6) itself diverges
    between Spark and DuckDB on exact .5 ties at the 7th decimal
    (observed: a single-row group's mean 1046.3109375). The collected
    group is bounded by lineitems per (part, supplier) pair — ~dozens
    in TPC-H-shaped data — so the array stays row-local and tiny."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    from ..functions.scalars import round6_pos_portable

    ratios = F.array_sort(
        F.collect_list(F.col("l_extendedprice") / F.col("l_quantity"))
    )
    pp = li.groupBy("l_partkey", "l_suppkey").agg(
        round6_pos_portable(
            F.aggregate(ratios, F.lit(0.0), lambda a, b: a + b)
            / F.size(ratios)
        ).alias("unit_price")
    )
    j = (
        pp.join(F.broadcast(part), pp["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), pp["l_suppkey"] == F.col("s_suppkey"))
        .select("p_partkey", "s_suppkey", "s_name", "n_name", "unit_price")
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("unit_price").asc(), F.col("s_suppkey").asc()
    )
    return (
        j.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .drop("r")
    )


# ---------------------------------------------------------------------------
# q62 — shipping priority: top-10 unshipped orders by revenue
# (TPC-H Q3 shape).
# ---------------------------------------------------------------------------
@spark_query(
    "q62_shipping_priority",
    """
    WITH c AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    o AS (
      SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'
        AND o_custkey IN (SELECT c_custkey FROM c)
    ),
    r AS (
      SELECT l_orderkey AS order_key, o_orderdate AS order_date,
             o_orderpriority AS priority,
             round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
      FROM lineitem JOIN o ON l_orderkey = o_orderkey
      WHERE l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY 1, 2, 3
    )
    SELECT order_key, order_date, priority, revenue
    FROM (
      SELECT *, row_number() OVER (ORDER BY revenue DESC, order_key ASC) AS rn
      FROM r
    ) WHERE rn <= 10
    """,
)
def q62_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic segment × date-window × revenue top-k. The customer
    filter is a semi join (no customer columns survive), lineitem joins
    orders on the shuffle key, and the top-10 is a TakeOrdered over the
    aggregated (order-sized, not line-sized) result — rank by the
    ROUNDED revenue so the cut is engine-stable."""
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("order_key").asc())
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# q63 — order-priority distribution of late orders (TPC-H Q4 shape:
# EXISTS → left-semi join; the schema has no commitdate, so "late" =
# a line shipped more than 60 days after the order date).
# ---------------------------------------------------------------------------
@spark_query(
    "q63_late_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q63_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join with a compound (key + inequality)
    condition: the semi join shuffles both sides on orderkey once and
    keeps at most one copy of each order — no fact-side blowup, no
    distinct needed (the exact plan Catalyst uses for decorrelated
    EXISTS subqueries)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders")
    )


# ---------------------------------------------------------------------------
# q64 — local supplier volume (TPC-H Q5 shape): revenue shipped within
# the customer's own nation, per nation, for one order year.
# ---------------------------------------------------------------------------
@spark_query(
    "q64_local_supplier_volume",
    """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) = 1997
      AND c_nationkey = s_nationkey
    GROUP BY n_name
    """,
)
def q64_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join star with a cross-dimension equality (customer nation
    == supplier nation). Joins key on the fact's own columns (orderkey,
    custkey, suppkey) so each is one shuffle of the surviving rows;
    nation is broadcast; the year filter prunes orders before its join.
    At 100 TB the 1997 filter would also prune partitions if orders is
    date-partitioned — the filter sits directly on the scan."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1997
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q65 — market share of one region's suppliers per order year
# (TPC-H Q8 shape, conditional-share aggregation).
# ---------------------------------------------------------------------------
@spark_query(
    "q65_market_share",
    """
    WITH eur AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue,
           round(sum(CASE WHEN l_suppkey IN (SELECT s_suppkey FROM eur)
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS europe_share
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q65_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total without two passes: tag each line with a
    broadcast-semi membership flag (left join against the qualified
    supplier keys), then ONE conditional aggregation produces both the
    numerator and denominator — the fact table is scanned and shuffled
    exactly once, on the year key."""
    eur = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", F.lit(1).alias("is_eur"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(eur), li["l_suppkey"] == eur["s_suppkey"], "left")
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(F.sum(rev), 6).alias("total_revenue"),
            F.round(
                F.sum(F.when(F.col("is_eur") == 1, rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("europe_share"),
        )
    )


# ---------------------------------------------------------------------------
# q66 — suppliers who kept multi-supplier orders waiting (TPC-H Q21
# shape): the supplier(s) of the LAST-shipping line of orders that
# involved at least two suppliers.
# ---------------------------------------------------------------------------
@spark_query(
    "q66_waiting_suppliers",
    """
    WITH per_order AS (
      SELECT l_orderkey, max(l_shipdate) AS max_ship,
             count(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY 1
    ),
    blockers AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN per_order p ON l.l_orderkey = p.l_orderkey
      WHERE p.n_supp >= 2 AND l.l_shipdate = p.max_ship
    ),
    counted AS (
      SELECT s.s_suppkey, s.s_name,
             CAST(count(*) AS BIGINT) AS n_orders_blocked
      FROM blockers b JOIN supplier s ON b.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name, n_orders_blocked, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (ORDER BY n_orders_blocked DESC,
                                   s_suppkey ASC) AS rk
      FROM counted
    ) WHERE rk <= 20
    """,
)
def q66_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-referential fact query without a self-join of the raw fact:
    one groupBy computes each order's max ship date and supplier count,
    the (order-sized) summary joins back on the shuffle key already in
    place, and only last-shipping lines of multi-supplier orders
    survive to the supplier rollup. Counts are integers, so the global
    top-20 rank is exactly reproducible."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    blockers = (
        li.join(per_order, "l_orderkey")
        .filter(
            (F.col("n_supp") >= 2) & (F.col("l_shipdate") == F.col("max_ship"))
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    counted = (
        blockers.join(F.broadcast(sup), blockers["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("long").alias("n_orders_blocked"))
    )
    w = Window.orderBy(
        F.col("n_orders_blocked").desc(), F.col("s_suppkey").asc()
    )
    return counted.withColumn("rk", F.row_number().over(w).cast("long")).filter(
        F.col("rk") <= 20
    )


# ---------------------------------------------------------------------------
# d68 — exact-k per-group deterministic sample (eval-set construction:
# "exactly 5 held-out docs per source", reproducible across runs,
# engines, and task retries — unlike rand()-based sampling).
# ---------------------------------------------------------------------------
_D68_K = 5
_D68_SALT = "'samp-' || CAST(doc_id AS VARCHAR)"


@spark_query(
    "d68_per_group_exact_sample",
    f"""
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                 ORDER BY {portable_hash_sql(_D68_SALT)} ASC, doc_id ASC) AS rk
      FROM documents
    ) WHERE rk <= {_D68_K}
    """,
)
def d68_per_group_exact_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-ranked reservoir: rank docs inside each group by a salted
    content hash and keep the first k — a uniform-without-replacement
    exact-k sample per group, fully deterministic. Scale: one shuffle
    on the group key; each partition holds whole groups and the window
    never sees more than a group's rows. (d19/d26 are fraction-based
    Bernoulli samples; this guarantees the COUNT, which is what
    eval-set construction needs.)"""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        portable_hash(
            F.concat(F.lit("samp-"), F.col("doc_id").cast("string"))
        ).asc(),
        F.col("doc_id").asc(),
    )
    return (
        d.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _D68_K)
        .select("source", "doc_id", "rk")
    )


# ---------------------------------------------------------------------------
# d69 — blocked edit-distance record linkage: candidate pairs from
# (lang, length-bucket) blocking, verified by Levenshtein on a fixed
# prefix. The fuzzy-matching workhorse for near-identical records.
# ---------------------------------------------------------------------------
_D69_PFX = 40
_D69_MAXDIST = 10


@spark_query(
    "d69_edit_distance_linkage",
    f"""
    WITH b AS (
      SELECT doc_id, lang, CAST(n_chars // 16 AS BIGINT) AS bucket,
             substr(text, 1, {_D69_PFX}) AS pfx
      FROM documents
    )
    SELECT a.doc_id AS doc_id_1, c.doc_id AS doc_id_2,
           CAST(levenshtein(a.pfx, c.pfx) AS INT) AS dist
    FROM b a JOIN b c
      ON a.lang = c.lang AND a.bucket = c.bucket AND a.doc_id < c.doc_id
    WHERE levenshtein(a.pfx, c.pfx) <= {_D69_MAXDIST}
    """,
)
def d69_edit_distance_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking turns the O(n²·L²) all-pairs edit-distance problem into
    per-block equi-join candidates (same language, same 16-char length
    bucket — a true near-dup can't be far in length), and only
    candidates pay the Levenshtein. The distance runs on a fixed
    40-char prefix so per-pair cost is bounded. All JVM-side builtins.

    Pairs come from ``dedup.salted_block_pairs``: the 100× sweep showed
    a hot (lang, bucket) block (8,100 docs → 33M pairs) running as ONE
    join-key task for ~15 min; the salted sub-block decomposition
    splits each block's pair work ~n_salts² ways with the identical
    pair set (the Levenshtein stays a codegen'd post-join residual)."""
    from ..operators import dedup

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 16).cast("long").alias("bucket"),
        F.substring("text", 1, _D69_PFX).alias("pfx"),
    )
    pairs = dedup.salted_block_pairs(d, ["lang", "bucket"], id_col="doc_id")
    # bounded Levenshtein: banded DP, exact for dist <= threshold and
    # -1 beyond — identical kept set/values, ~2x less DP work per pair
    return (
        pairs.withColumn(
            "dist",
            F.levenshtein(
                F.col("a.pfx"), F.col("b.pfx"), _D69_MAXDIST
            ).cast("int"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= _D69_MAXDIST))
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_id_1"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_id_2"),
            "dist",
        )
    )


# ---------------------------------------------------------------------------
# d70 — association rules over per-user event baskets (market-basket
# support / confidence / lift — the co-occurrence profile of a corpus).
# ---------------------------------------------------------------------------
@spark_query(
    "d70_association_rules",
    """
    WITH basket AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM basket),
    singles AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_with FROM basket GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS ante, b.event_type AS conseq,
             CAST(count(*) AS BIGINT) AS pair_n
      FROM basket a JOIN basket b
        ON a.user_id = b.user_id AND a.event_type != b.event_type
      GROUP BY 1, 2
    )
    SELECT p.ante, p.conseq, p.pair_n,
           round(CAST(p.pair_n AS DOUBLE) / n.n_users, 6) AS support,
           round(CAST(p.pair_n AS DOUBLE) / sa.n_with, 6) AS confidence,
           round(CAST(p.pair_n AS DOUBLE) * n.n_users
                 / (sa.n_with * sb.n_with), 6) AS lift
    FROM pairs p
    JOIN singles sa ON p.ante = sa.event_type
    JOIN singles sb ON p.conseq = sb.event_type
    CROSS JOIN n
    """,
)
def d70_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional rules ante→conseq with support/confidence/lift. The
    basket distinct is the one data-sized shuffle; the pair join is
    keyed on user_id (co-occurrence never leaves the user's partition);
    the item-frequency table and the 1-row user count broadcast back.
    Item vocabulary is assumed dimension-sized (event types, SKUs) —
    the standard market-basket regime."""
    ev = _t(spark, sf_dir, "events")
    basket = ev.select("user_id", "event_type").distinct()
    n_users = basket.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    singles = basket.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_with")
    )
    a = basket.select("user_id", F.col("event_type").alias("ante"))
    b = basket.select("user_id", F.col("event_type").alias("conseq"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ante") != F.col("conseq"))
        .groupBy("ante", "conseq")
        .agg(F.count("*").cast("long").alias("pair_n"))
    )
    sa = singles.select(
        F.col("event_type").alias("ante"), F.col("n_with").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("conseq"), F.col("n_with").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sb), "conseq")
        .crossJoin(F.broadcast(n_users))
        .select(
            "ante",
            "conseq",
            "pair_n",
            F.round(F.col("pair_n").cast("double") / F.col("n_users"), 6).alias(
                "support"
            ),
            F.round(F.col("pair_n").cast("double") / F.col("n_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("pair_n").cast("double")
                * F.col("n_users")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# d71 — KMV sketch set operations: estimate the union size and Jaccard
# of two corpora's vocabularies from their mergeable k-min sketches
# (the cross-source overlap audit that never materializes either set).
# ---------------------------------------------------------------------------
_D71_K = 256


def _d71_sketch_sql(lang: str) -> str:
    return f"""
      SELECT DISTINCT {portable_hash_sql("token")} AS hh
      FROM (
        SELECT unnest(string_split(text, ' ')) AS token
        FROM documents WHERE lang = '{lang}'
      ) WHERE token <> ''
      ORDER BY hh LIMIT {_D71_K}
    """


@spark_query(
    "d71_kmv_set_ops",
    f"""
    WITH ska AS ({_d71_sketch_sql("en")}),
    skb AS ({_d71_sketch_sql("de")}),
    merged AS (
      SELECT hh FROM (
        SELECT DISTINCT hh FROM (
          SELECT hh FROM ska UNION ALL SELECT hh FROM skb
        )
      ) ORDER BY hh LIMIT {_D71_K}
    )
    SELECT CAST(count(*) AS BIGINT) AS k,
           round((count(*) - 1) * {HASH_MOD}.0 / max(hh), 6) AS est_union,
           CAST(sum(CASE WHEN hh IN (SELECT hh FROM ska)
                          AND hh IN (SELECT hh FROM skb)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
           round(sum(CASE WHEN hh IN (SELECT hh FROM ska)
                           AND hh IN (SELECT hh FROM skb)
                          THEN 1.0 ELSE 0.0 END) / count(*), 6) AS jaccard_est
    FROM merged
    """,
)
def d71_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketches are mergeable: union the two k-min sets and re-take
    the k smallest — that IS the sketch of the union, and the fraction
    of merged hashes present in both input sketches estimates Jaccard
    (Beyer et al., SIGMOD'07). Each sketch is a map-side hash + top-k
    (TakeOrdered, k=256 rows move per corpus); the set ops run on
    k-sized tables. At 100 TB each source's sketch is built where the
    source lives and only 256 longs travel — this is the cross-corpus
    overlap primitive."""
    d = load_table(spark, sf_dir, "documents")

    def sketch(lang: str) -> DataFrame:
        tok = (
            d.filter(F.col("lang") == lang)
            .select(F.explode(text.tokens("text")).alias("token"))
            .filter(F.col("token") != "")
        )
        return (
            tok.select(portable_hash(F.col("token")).alias("hh"))
            .distinct()
            .orderBy("hh")
            .limit(_D71_K)
        )

    ska = sketch("en").cache()
    skb = sketch("de").cache()
    merged = (
        ska.unionAll(skb).distinct().orderBy("hh").limit(_D71_K)
    )
    flagged = (
        merged.join(ska.withColumnRenamed("hh", "ha"),
                    F.col("hh") == F.col("ha"), "left")
        .join(skb.withColumnRenamed("hh", "hb"),
              F.col("hh") == F.col("hb"), "left")
        .select(
            "hh",
            (F.col("ha").isNotNull() & F.col("hb").isNotNull()).alias("both"),
        )
    )
    return flagged.agg(
        F.count("*").cast("long").alias("k"),
        F.round(
            (F.count("*") - 1) * F.lit(float(HASH_MOD)) / F.max("hh"), 6
        ).alias("est_union"),
        F.sum(F.when(F.col("both"), 1).otherwise(0)).cast("long").alias(
            "n_both"
        ),
        F.round(
            F.sum(F.when(F.col("both"), 1.0).otherwise(0.0)) / F.count("*"), 6
        ).alias("jaccard_est"),
    )


# ---------------------------------------------------------------------------
# d72 — one deterministic k-means Lloyd iteration over the embedding
# table (fixed seeded centroids → assign → per-cell mean = the next
# centroid set). The building block d15's KMeans fit runs repeatedly;
# here it is a single relational step, so it gets an exact oracle.
# ---------------------------------------------------------------------------
_D72_ASSIGN_SQL = """
    cents AS (
      SELECT vec_id AS centroid_id, embedding FROM embeddings
      WHERE vec_id < 16
    ),
    scored AS (
      SELECT v.vec_id, v.embedding AS vemb, c.centroid_id,
             round({dot} / ({nv} * {nc}), 6) AS cscore
      FROM embeddings v, cents c
    ),
    assigned AS (
      SELECT vec_id, vemb, centroid_id FROM (
        SELECT vec_id, vemb, centroid_id,
               row_number() OVER (PARTITION BY vec_id
                   ORDER BY cscore DESC, centroid_id ASC) AS r
        FROM scored
      ) WHERE r = 1
    )
"""

_DOT_VC72 = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), "
    "i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)
_NORM_72 = (
    "sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, 65), "
    "i -> CAST({v}.embedding[i] AS DOUBLE) * CAST({v}.embedding[i] AS DOUBLE))), "
    "(acc, x) -> acc + x))"
)


@spark_query(
    "d72_kmeans_lloyd_step",
    f"""
    WITH {_D72_ASSIGN_SQL.format(dot=_DOT_VC72, nv=_NORM_72.format(v="v"), nc=_NORM_72.format(v="c"))}
    SELECT centroid_id, CAST(i - 1 AS INT) AS dim,
           CAST(count(*) AS BIGINT) AS n_assigned,
           round(avg(CAST(vemb[i] AS DOUBLE)), 6) AS new_v
    FROM assigned, range(1, 65) AS t(i)
    GROUP BY centroid_id, i
    """,
)
def d72_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment is argmax-cosine against the 16 broadcast seed
    centroids (one narrow pass over the corpus — the Arrow-batched
    cosine, same as d20); the update is a posexplode + (cell, dim)
    partial aggregation, so the shuffle carries 64 mean-accumulator
    rows per (partition, cell), never the vectors. Iterating this step
    IS distributed KMeans — each round is one cheap map + one tiny
    shuffle, centroids re-broadcast each round."""
    e = _t(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("__ct")
    )
    scored = (
        e.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "__cscore",
            F.round(cosine_vectorized(F.col("embedding"), F.col("__ct")), 6),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__cscore").desc(), F.col("centroid_id").asc()
    )
    assigned = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    return (
        assigned.select(
            "centroid_id", F.posexplode("embedding").alias("dim", "v")
        )
        .groupBy("centroid_id", "dim")
        .agg(
            F.count("*").cast("long").alias("n_assigned"),
            F.round(F.avg(F.col("v").cast("double")), 6).alias("new_v"),
        )
    )


# ---------------------------------------------------------------------------
# d73 — seeded random projection (embedding compression 64 → 8 dims):
# project every vector onto 8 deterministic ±1 hyperplanes. The
# real-valued sibling of the d13 signature (which keeps only the sign
# bit) — what you store when you still need approximate distances.
# ---------------------------------------------------------------------------
_D73_PLANES = 8


def _d73_proj_sql(pl: int, dim: int = 64) -> str:
    signs = ", ".join(
        "1.0" if _plane_sign(pl, j) else "-1.0" for j in range(dim)
    )
    return (
        f"round(list_reduce(list_prepend(0.0, list_transform(range(1, {dim + 1}), "
        f"i -> CAST(embedding[i] AS DOUBLE) * CAST(([{signs}])[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x), 6)"
    )


@spark_query(
    "d73_random_projection",
    "SELECT vec_id, "
    + ", ".join(
        f"{_d73_proj_sql(p)} AS proj{p}" for p in range(_D73_PLANES)
    )
    + " FROM embeddings",
)
def d73_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8 projections per vector, planes derived from the shared
    _plane_sign splitmix constants (no runtime RNG — re-runs and the
    oracle rebuild identical planes). A narrow map: per row, 8
    sequential folds inside codegen; nothing shuffles. Johnson-
    Lindenstrauss-style compression — downstream distance work runs on
    8 doubles instead of 64 floats."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cols = []
    for p in range(_D73_PLANES):
        signs = F.array(
            *[
                F.lit(1.0 if _plane_sign(p, j) else -1.0)
                for j in range(64)
            ]
        )
        proj = F.aggregate(
            F.zip_with(v, signs, lambda x, r: x * r),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(proj, 6).alias(f"proj{p}"))
    return e.select("vec_id", *cols)
