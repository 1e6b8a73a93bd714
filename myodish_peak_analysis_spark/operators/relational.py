"""Relational analytics over the harness's TPC-H-shaped tables.

The reference is a single-signal analysis tool and has no relational
surface (SURVEY.md §2.9), but the build brief's engine must also serve
the warehouse-shaped queries a training-data pipeline runs around its
corpus tables (join lineage tables, per-source revenue-style rollups,
top-k reports). These three operators are the canonical shapes — one
wide aggregate, one star-schema top-k, one multi-way join — expressed
declaratively so Catalyst/AQE pick the physical strategy.

Cross-engine exactness: every money aggregate is computed in integer
cents (``round(x*100)`` → BIGINT) and divided back to dollars ONCE at
the end, so Spark and the DuckDB oracle sum identical integers in any
order — float-sum order sensitivity (and DuckDB's round-half rule
divergence) never enters. See ``[[duckdb-spark-parity-gotchas]]``.

Scale notes (100 TB):
* ``pricing_summary`` — map-side partial aggregation into ≤ a few dozen
  groups; the shuffle moves one row per (partition × group). The cent
  sums fit BIGINT to ~1e18 cents³; at true 100 TB move the two
  triple-product columns to DECIMAL(38,0) (same code path in both
  engines).
* ``segment_revenue_topk`` — the filtered customer dim carries NO
  broadcast hint (customer ∝ SF; AQE broadcasts it while it fits);
  orders⋈lineitem is the big co-partitioned hash join on ``orderkey``
  (AQE handles skew). The top-k is Spark's distributed TakeOrdered
  (per-partition heads, then a k-row merge on the driver) — never a
  global sort materialization.
* ``nation_revenue`` — only the BOUNDED dims (nation⋈region, 25 rows
  at every SF) are hint-broadcast; supplier/customer projections grow
  with the warehouse so AQE picks their join strategy from runtime
  sizes; the fact-side joins shuffle on their keys once each.
  Deterministic output: revenue is an exact integer before the final
  division.

Unlike ``events.ts`` (TIMESTAMP(NANOS) → int64), the relational tables'
date columns read as TIMESTAMP_NTZ; cutoffs are timezone-free timestamp
literals and the exposed order-date is integer days since epoch
(``datediff`` on dates) — both deterministic in any session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Date cutoffs as ISO literals; Spark casts them to TIMESTAMP_NTZ and
# DuckDB to TIMESTAMP — both timezone-free, so the comparison is exact
# in any session timezone.
CUT_Q1 = "1998-09-02"
CUT_Q3 = "1998-03-15"
FROM_Q5 = "1996-01-01"
TO_Q5 = "1997-01-01"


def _tslit(iso: str) -> F.Column:
    return F.lit(iso).cast("timestamp_ntz")


def _epoch_day(col: str) -> F.Column:
    """Integer days since 1970-01-01 of a TIMESTAMP_NTZ column (date cast
    is timezone-free)."""
    return F.datediff(
        F.col(col).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")


def _cents(col: str) -> F.Column:
    """Exact integer cents for a 2-decimal double column."""
    return F.round(F.col(col) * 100).cast("long")


def pricing_summary(lineitem: DataFrame, cutoff: str = CUT_Q1) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus),
    integer-exact sums of quantity, base price, discounted price and
    charge, plus the three averages and the row count.

    disc_price = ep*(1-disc) is ep_c*(100-disc_c) in 1e-4 dollars;
    charge = ep*(1-disc)*(1+tax) is the triple product in 1e-6 dollars.
    """
    ep_c, disc_c, tax_c = _cents("l_extendedprice"), _cents("l_discount"), _cents("l_tax")
    qty_c = _cents("l_quantity")
    rows = lineitem.filter(F.col("l_shipdate") <= _tslit(cutoff)).select(
        "l_returnflag",
        "l_linestatus",
        qty_c.alias("_q"),
        ep_c.alias("_ep"),
        disc_c.alias("_d"),
        (ep_c * (100 - disc_c)).alias("_dp"),
        (ep_c * (100 - disc_c) * (100 + tax_c)).alias("_ch"),
    )
    agg = rows.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("_q").alias("_sq"),
        F.sum("_ep").alias("_sep"),
        F.sum("_dp").alias("_sdp"),
        F.sum("_ch").alias("_sch"),
        F.sum("_d").alias("_sd"),
        F.count(F.lit(1)).alias("count_order"),
    )
    n = F.col("count_order")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("_sq") / 100.0, 6).alias("sum_qty"),
        F.round(F.col("_sep") / 100.0, 6).alias("sum_base_price"),
        F.round(F.col("_sdp") / 1e4, 6).alias("sum_disc_price"),
        F.round(F.col("_sch") / 1e6, 6).alias("sum_charge"),
        F.round(F.col("_sq") / 100.0 / n, 6).alias("avg_qty"),
        F.round(F.col("_sep") / 100.0 / n, 6).alias("avg_price"),
        F.round(F.col("_sd") / 100.0 / n, 6).alias("avg_disc"),
        "count_order",
    )


def segment_revenue_topk(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = CUT_Q3,
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped: top-k unshipped orders of one market segment by
    revenue. The filtered customer projection carries NO broadcast
    hint: customer GROWS with the warehouse (150k rows/SF — ~15 GB of
    custkeys at 100 TB), so a hard ``broadcast()`` is a scale bug.
    AQE broadcasts it from runtime sizes while it fits and falls back
    to a shuffled hash join past the threshold (A/B at 100× sf0.1,
    cached inputs: hint 14.82 s vs AQE 14.59 s — the hint buys
    nothing even where it is safe). orders⋈lineitem hash-joins on the
    shared orderkey. Ties broken by orderkey, so the k rows are
    deterministic."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < _tslit(cutoff)).select(
        "o_orderkey", "o_custkey", _epoch_day("o_orderdate").alias("o_orderdate_day")
    )
    items = lineitem.filter(F.col("l_shipdate") > _tslit(cutoff)).select(
        "l_orderkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("_rev"),
    )
    joined = (
        ords.join(cust, ords.o_custkey == cust.c_custkey)
        .join(items, ords.o_orderkey == items.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate_day")
        .agg(F.sum("_rev").alias("_rev_c"))
    )
    return (
        joined.orderBy(F.col("_rev_c").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select(
            "o_orderkey",
            "o_orderdate_day",
            F.round(F.col("_rev_c") / 1e4, 6).alias("revenue"),
        )
    )


def nation_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = FROM_Q5,
    date_to: str = TO_Q5,
) -> DataFrame:
    """TPC-H Q5-shaped local-supplier volume: revenue per nation of one
    region over one order-date year, counting only lineitems whose
    supplier sits in the customer's nation. nation⋈region collapses to a
    broadcast nationkey set (nation/region are BOUNDED — 25/5 rows at
    every SF — the only dims a hard hint is correct for). supplier
    carries NO broadcast hint: it grows with the warehouse (10k
    rows/SF — ~100M rows at 100 TB), so the hint is a scale bug; AQE
    broadcasts it from runtime sizes while it fits (A/B at 100× sf0.1,
    cached inputs: hint 40.22 s vs AQE 36.28 s — AQE wins even where
    the hint is safe). The two fact joins (orders⋈customer-pruned-
    orders, lineitem⋈orders) shuffle on their keys and AQE re-plans
    the post-filter sizes."""
    nations = F.broadcast(
        nation.join(
            region.filter(F.col("r_name") == region_name),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    cust = customer.join(
        nations, customer.c_nationkey == nations.n_nationkey
    ).select("c_custkey", F.col("c_nationkey").alias("cust_nk"), "n_name")
    ords = orders.filter(
        (F.col("o_orderdate") >= _tslit(date_from))
        & (F.col("o_orderdate") < _tslit(date_to))
    ).select("o_orderkey", "o_custkey")
    supp = supplier.select("s_suppkey", F.col("s_nationkey").alias("supp_nk"))
    items = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("_rev"),
    )
    joined = (
        ords.join(cust, ords.o_custkey == cust.c_custkey)
        .join(items, ords.o_orderkey == items.l_orderkey)
        .join(supp, items.l_suppkey == supp.s_suppkey)
        .filter(F.col("cust_nk") == F.col("supp_nk"))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum("_rev").alias("_rev_c"))
        .select("n_name", F.round(F.col("_rev_c") / 1e4, 6).alias("revenue"))
    )


# --- DuckDB oracle builders ------------------------------------------------

def pricing_summary_sql(cutoff: str = CUT_Q1) -> str:
    """Mirror of :func:`pricing_summary`: same integer-cent arithmetic,
    same single final divisions. SUM(BIGINT) is HUGEINT in DuckDB —
    cast back before the division so dtypes match Spark's long sums."""
    return f"""
    WITH c AS (
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(l_quantity * 100) AS BIGINT) AS q,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ep,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
               CAST(ROUND(l_tax * 100) AS BIGINT) AS t
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{cutoff}'
    ),
    s AS (
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(q) AS BIGINT) AS sq,
               CAST(SUM(ep) AS BIGINT) AS sep,
               CAST(SUM(ep * (100 - d)) AS BIGINT) AS sdp,
               CAST(SUM(ep * (100 - d) * (100 + t)) AS BIGINT) AS sch,
               CAST(SUM(d) AS BIGINT) AS sd,
               COUNT(*) AS count_order
        FROM c GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           ROUND(sq / 100.0, 6) AS sum_qty,
           ROUND(sep / 100.0, 6) AS sum_base_price,
           ROUND(sdp / 1e4, 6) AS sum_disc_price,
           ROUND(sch / 1e6, 6) AS sum_charge,
           ROUND(sq / 100.0 / count_order, 6) AS avg_qty,
           ROUND(sep / 100.0 / count_order, 6) AS avg_price,
           ROUND(sd / 100.0 / count_order, 6) AS avg_disc,
           count_order
    FROM s
    """


def segment_revenue_topk_sql(
    segment: str = "BUILDING",
    cutoff: str = CUT_Q3,
    k: int = 10,
) -> str:
    return f"""
    SELECT o.o_orderkey,
           CAST(datediff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS BIGINT)
               AS o_orderdate_day,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                      AS BIGINT) / 1e4, 6) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{segment}'
      AND o.o_orderdate < TIMESTAMP '{cutoff}'
      AND l.l_shipdate > TIMESTAMP '{cutoff}' 
    GROUP BY o.o_orderkey, o_orderdate_day
    ORDER BY CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                  AS BIGINT) DESC, o.o_orderkey ASC
    LIMIT {k}
    """


def nation_revenue_sql(
    region_name: str = "ASIA",
    date_from: str = FROM_Q5,
    date_to: str = TO_Q5,
) -> str:
    return f"""
    SELECT n.n_name,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                      AS BIGINT) / 1e4, 6) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE r.r_name = '{region_name}'
      AND s.s_nationkey = c.c_nationkey
      AND o.o_orderdate >= TIMESTAMP '{date_from}'
      AND o.o_orderdate < TIMESTAMP '{date_to}' 
    GROUP BY n.n_name
    """


def large_order_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = 300,
    k: int = 10,
) -> DataFrame:
    """TPC-H Q18-shaped: customers holding the largest orders whose
    total line quantity exceeds ``min_qty`` — the HAVING-subquery +
    join + top-k shape. The qualifying-orderkey set (post-HAVING, tiny
    by construction) is what joins back to the facts, so the expensive
    side is ONE groupBy(lineitem.orderkey); customer joins on the
    already-filtered orders. Quantities sum in integer centi-units —
    exact in both engines — and the top-k is a distributed TakeOrdered
    with orderkey tie-break."""
    qual = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("_qty_c"))
        .filter(F.col("_qty_c") > min_qty * 100)
    )
    ords = orders.select(
        "o_orderkey",
        "o_custkey",
        _epoch_day("o_orderdate").alias("o_orderdate_day"),
        _cents("o_totalprice").alias("_price_c"),
    )
    joined = (
        ords.join(qual, ords.o_orderkey == qual.l_orderkey)
        .join(customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.orderBy(F.col("_price_c").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate_day",
            F.round(F.col("_price_c") / 1e2, 2).alias("total_price"),
            F.round(F.col("_qty_c") / 1e2, 2).alias("total_qty"),
        )
    )


def large_order_customers_sql(min_qty: int = 300, k: int = 10) -> str:
    return f"""
    WITH qual AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
                   AS _qty_c
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) > {min_qty * 100}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           datediff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
               AS o_orderdate_day,
           ROUND(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) / 1e2, 2)
               AS total_price,
           ROUND(_qty_c / 1e2, 2) AS total_qty
    FROM qual JOIN orders o ON o.o_orderkey = qual.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) DESC, o.o_orderkey ASC
    LIMIT {k}
    """


def returned_orders_by_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q4-shaped EXISTS: count one quarter's orders that have at
    least one RETURNED line item, per order priority — the
    correlated-EXISTS-as-LEFT-SEMI-JOIN shape (the harness lineitem has
    no commit/receipt dates, so "returned line" stands in for Q4's
    late-commit predicate; the relational shape is identical).

    Scale: both filters reach the parquet scans (quarter cutoff on
    orders, returnflag on lineitem). The semi join carries only
    ``l_orderkey`` from the filtered lineitem side and stops probing an
    order on the FIRST match — no fact×fact row multiplication, and the
    aggregate is a map-side-combinable count into a handful of priority
    groups. AQE picks broadcast for the key set when it fits, falling
    back to a co-partitioned shuffle semi join.
    """
    returned_keys = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey"
    )
    quarter = orders.filter(
        (F.col("o_orderdate") >= _tslit(date_from))
        & (F.col("o_orderdate") < _tslit(date_to))
    )
    return (
        quarter.join(
            returned_keys,
            quarter.o_orderkey == returned_keys.l_orderkey,
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def returned_orders_by_priority_sql(
    date_from: str = "1996-01-01", date_to: str = "1996-04-01"
) -> str:
    return f"""
    SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{date_from}'
      AND o.o_orderdate < TIMESTAMP '{date_to}'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


def cheapest_supplier_per_part(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    min_lines: int = 2,
) -> DataFrame:
    """TPC-H Q2-shaped correlated subquery: for each part, the supplier
    with the lowest observed average unit price ("WHERE cost = (SELECT
    MIN(cost) ... WHERE partkey = outer.partkey)").

    Spark-first rewrite: the correlated scalar subquery becomes a
    window MIN over the per-(part, supplier) aggregate — one extra
    window over rows already shuffled by partkey, instead of the
    re-executed-per-row subquery a literal translation implies. (A
    single ``row_number() OVER (ORDER BY unit, suppkey)`` collapses the
    min+filter+rank chain further; the three-step form is kept because
    it mirrors Q2's subquery structure statement-for-statement.) Unit
    price is an exact integer-micro-cents ratio ``sum_cents * 1e4 DIV
    sum_qty_cents`` (both operands exact), ties broken by lowest
    suppkey via a deterministic rank.
    """
    from pyspark.sql import Window

    per = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_cents("l_extendedprice")).alias("_ep_c"),
            F.sum(_cents("l_quantity")).alias("_q_c"),
        )
        .filter(F.col("n_lines") >= min_lines)
        .withColumn("_unit_u", F.expr("_ep_c * 10000 DIV _q_c"))
    )
    w = Window.partitionBy("l_partkey")
    best = (
        per.withColumn("_min_u", F.min("_unit_u").over(w))
        .filter(F.col("_unit_u") == F.col("_min_u"))
        .withColumn(
            "_rk",
            F.row_number().over(w.orderBy(F.col("l_suppkey").asc())),
        )
        .filter(F.col("_rk") == 1)
    )
    return (
        # no broadcast hints: part (200k rows/SF) and supplier (10k
        # rows/SF) both GROW with the warehouse, and `best` is itself
        # ~|part|-sized — AQE broadcasts the name projections while
        # they fit and falls back to key-partitioned joins at scale
        best.join(part.select("p_partkey", "p_name"),
                  best.l_partkey == F.col("p_partkey"))
        .join(supplier.select("s_suppkey", "s_name"),
              best.l_suppkey == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "n_lines",
            F.round(F.col("_unit_u").cast("double") / 1e4, 6).alias("unit_price"),
        )
    )


def cheapest_supplier_per_part_sql(min_lines: int = 2) -> str:
    return f"""
    WITH per AS (
        SELECT l_partkey, l_suppkey,
               COUNT(*)::BIGINT AS n_lines,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS ep_c,
               CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS q_c
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
        HAVING COUNT(*) >= {min_lines}
    ),
    priced AS (SELECT *, ep_c * 10000 // q_c AS unit_u FROM per),
    best AS (
        SELECT * FROM (
            SELECT *,
                   MIN(unit_u) OVER (PARTITION BY l_partkey) AS min_u
            FROM priced) t
        WHERE unit_u = min_u
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY l_suppkey) AS rk
        FROM best
    )
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n_lines,
           ROUND(CAST(unit_u AS DOUBLE) / 1e4, 6) AS unit_price
    FROM ranked r
    JOIN part p ON p.p_partkey = r.l_partkey
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE rk = 1
    """


def nation_pair_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7-shaped: shipping volume between every (supplier nation,
    customer nation) pair per ship year. The same ``nation`` dim plays
    two roles — one resolved through the supplier, one through the
    order's customer.

    Scale: the only fact×fact operation is lineitem⋈orders on
    ``orderkey`` (co-partitioned hash join; AQE splits skewed keys).
    supplier⋈nation is pre-joined into a (suppkey → nation-name)
    mini-dim, but like the customer mini-dim it grows WITH the data
    (|supplier| ∝ SF — 10k rows/SF), so neither carries a broadcast
    hint: AQE broadcasts each while it fits and reverts to a
    co-partitioned hash join beyond that — a hard hint would OOM the
    executors at 100 TB. Only ``nation`` (25 rows at every SF) keeps
    an explicit hint. The
    ship-date range predicate reaches the lineitem parquet scan; the
    final aggregate is map-side combinable into (25×25×years) groups.
    Revenue is summed in exact integer 1e-4-dollar units and divided
    back once.
    """
    supp_nat = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select(F.col("s_suppkey"), F.col("n_name").alias("supp_nation"))
    cust_nat = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(F.col("c_custkey"), F.col("n_name").alias("cust_nation"))
    ep_c, disc_c = _cents("l_extendedprice"), _cents("l_discount")
    li = lineitem.filter(
        (F.col("l_shipdate") >= _tslit(date_from))
        & (F.col("l_shipdate") < _tslit(date_to))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("ship_year"),
        (ep_c * (100 - disc_c)).alias("_dp"),
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(supp_nat, li.l_suppkey == supp_nat.s_suppkey)
        .join(cust_nat, F.col("o_custkey") == cust_nat.c_custkey)
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(
            F.sum("_dp").alias("_sdp"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "ship_year",
            F.round(F.col("_sdp") / 1e4, 6).alias("volume"),
            "n_lines",
        )
    )


def nation_pair_volume_sql(
    date_from: str = "1996-01-01", date_to: str = "1998-01-01"
) -> str:
    return f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) / 1e4,
                 6) AS volume,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '{date_from}'
      AND l.l_shipdate < TIMESTAMP '{date_to}'
    GROUP BY 1, 2, 3
    """


def promo_revenue_by_month(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """TPC-H Q14-shaped: per ship month, the share of discounted revenue
    coming from PROMO-type parts (the harness ``p_type`` is the single
    word class, so the match is equality, not Q14's LIKE 'PROMO%%').

    Scale: ``part`` is projected to (p_partkey, is_promo BOOLEAN) —
    ~9 bytes/part — but covers EVERY part, so it grows with SF and
    carries no broadcast hint (contrast
    :func:`brand_disjunction_revenue`, whose part side is filtered to
    three brands and safely hinted): AQE broadcasts the projection
    while it fits and reverts to a co-partitioned ``partkey`` hash join
    beyond that. The month rollup is a map-side-combinable conditional
    aggregate over exact integer 1e-4-dollar units, with the double
    division done once per group.
    """
    is_promo = part.select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("_is_promo")
    )
    ep_c, disc_c = _cents("l_extendedprice"), _cents("l_discount")
    li = lineitem.select(
        "l_partkey",
        F.trunc(F.col("l_shipdate").cast("date"), "month").alias("_m"),
        (ep_c * (100 - disc_c)).alias("_dp"),
    )
    return (
        li.join(is_promo, li.l_partkey == is_promo.p_partkey)
        .groupBy("_m")
        .agg(
            F.sum(F.when(F.col("_is_promo"), F.col("_dp")).otherwise(F.lit(0)))
            .alias("_promo_dp"),
            F.sum("_dp").alias("_total_dp"),
        )
        .select(
            F.datediff(F.col("_m"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("ship_month_day"),
            F.round(F.col("_promo_dp") / 1e4, 6).alias("promo_revenue"),
            F.round(F.col("_total_dp") / 1e4, 6).alias("total_revenue"),
            F.round(
                F.lit(100.0) * F.col("_promo_dp") / F.col("_total_dp"), 6
            ).alias("promo_pct"),
        )
    )


def promo_revenue_by_month_sql() -> str:
    return """
    WITH li AS (
        SELECT DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS m,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS dp,
               p_type = 'PROMO' AS is_promo
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT CAST(m - DATE '1970-01-01' AS BIGINT) AS ship_month_day,
           ROUND(SUM(CASE WHEN is_promo THEN dp ELSE 0 END) / 1e4, 6) AS promo_revenue,
           ROUND(SUM(dp) / 1e4, 6) AS total_revenue,
           ROUND(100.0 * SUM(CASE WHEN is_promo THEN dp ELSE 0 END) / SUM(dp), 6) AS promo_pct
    FROM li
    GROUP BY m
    """


def brand_disjunction_revenue(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """TPC-H Q19-shaped: revenue from three OR-ed (brand, size-range,
    quantity-range) branches, reported per brand.

    Scale: the three-way disjunction is declared as one boolean
    expression so Catalyst splits it by side — the (brand, size) parts
    reach the ``part`` scan as a pushed filter, the quantity bounds
    ``l_quantity BETWEEN 1 AND 36`` (the hull of the three branches)
    reach the lineitem scan, and the residual conjunction runs
    post-join inside whole-stage codegen. The filtered part side is
    small relative to part but still ∝ SF, so it carries no hard
    broadcast hint: AQE broadcasts it while it fits (no fact shuffle),
    reverting to a partkey-partitioned join at warehouse scale; the
    final aggregate stays map-side combinable into 3 groups.
    """
    p = (
        part.filter(
            (
                (F.col("p_brand") == "Brand#12")
                & F.col("p_size").between(1, 5)
            )
            | (
                (F.col("p_brand") == "Brand#23")
                & F.col("p_size").between(1, 10)
            )
            | (
                (F.col("p_brand") == "Brand#34")
                & F.col("p_size").between(1, 15)
            )
        ).select("p_partkey", "p_brand")
    )
    ep_c, disc_c = _cents("l_extendedprice"), _cents("l_discount")
    li = lineitem.filter(F.col("l_quantity").between(1, 36)).select(
        "l_partkey",
        "l_quantity",
        (ep_c * (100 - disc_c)).alias("_dp"),
    )
    joined = li.join(p, li.l_partkey == p.p_partkey)
    keep = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20, 36)
        )
    )
    return (
        joined.filter(keep)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("_dp") / 1e4, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def brand_disjunction_revenue_sql() -> str:
    return """
    SELECT p_brand,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) / 1e4,
                 6) AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 36)
    GROUP BY p_brand
    """


def parts_never_returned(
    lineitem: DataFrame, part: DataFrame, min_qty: float = 40.0
) -> DataFrame:
    """TPC-H Q16-shaped NOT-EXISTS: per (brand, size) count the parts
    that were ordered at least once but NEVER had a bulk return (a
    returned line of quantity >= ``min_qty``) — the correlated NOT
    EXISTS as a LEFT ANTI join against the filtered fact.

    Scale: the anti-join probe side carries only the distinct
    bulk-returned ``l_partkey`` set (returnflag + quantity filters
    pushed to the scan, distinct partially aggregated map-side); the
    semi side is the distinct ordered-part set. Both sides are key-only
    — no payload columns move through either shuffle — and the final
    rollup is a small map-combinable count into brand×size groups.
    """
    ordered = lineitem.select("l_partkey").distinct()
    returned = (
        lineitem.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_quantity") >= F.lit(min_qty))
        )
        .select("l_partkey")
        .distinct()
    )
    never_returned = ordered.join(returned, "l_partkey", "left_anti")
    return (
        part.join(never_returned, part.p_partkey == F.col("l_partkey"), "leftsemi")
        .groupBy("p_brand", "p_size")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


def parts_never_returned_sql(min_qty: float = 40.0) -> str:
    return f"""
    SELECT p_brand, p_size, COUNT(*)::BIGINT AS n_parts
    FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey
                        AND l.l_returnflag = 'R'
                        AND l.l_quantity >= {min_qty})
    GROUP BY p_brand, p_size
    """


def top_loss_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: the k customers who
    returned the most revenue in a two-quarter order window, with their
    nation attached — the canonical fact⋈fact⋈dim ranking report.

    Scale: both fact filters reach the scans (order-date window on
    orders, returnflag on lineitem); orders⋈lineitem is the big
    co-keyed hash join on orderkey, the customer join shuffles once on
    custkey, and nation is an explicitly broadcast 25-row dim. Revenue
    is summed in exact integer cents (deterministic in any partition
    order) and the ranking is Spark's distributed TakeOrdered — k rows
    per partition then a k-row driver merge, never a global sort.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= _tslit(date_from))
        & (F.col("o_orderdate") < _tslit(date_to))
    ).select("o_orderkey", "o_custkey")
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("_rev"),
    )
    per_cust = (
        ords.join(returned, ords.o_orderkey == returned.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("_rev").alias("_rev_c"))
    )
    nat = F.broadcast(nation.select("n_nationkey", "n_name"))
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .join(nat, customer.c_nationkey == nat.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            F.round(F.col("_rev_c") / 1e4, 6).alias("revenue_lost"),
            F.col("_rev_c"),
        )
        .orderBy(F.col("_rev_c").desc(), F.col("c_custkey").asc())
        .limit(k)
        .drop("_rev_c")
    )


def top_loss_customers_sql(
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
    k: int = 20,
) -> str:
    return f"""
    WITH per_cust AS (
        SELECT o.o_custkey,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS _rev_c
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '{date_from}'
          AND o.o_orderdate < TIMESTAMP '{date_to}'
          AND l.l_returnflag = 'R'
        GROUP BY o.o_custkey
    )
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(c.c_acctbal, 2) AS acctbal,
           ROUND(p._rev_c / 1e4, 6) AS revenue_lost
    FROM per_cust p
    JOIN customer c ON c.c_custkey = p.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    ORDER BY p._rev_c DESC, c.c_custkey ASC
    LIMIT {k}
    """


def idle_customer_balance(
    customer: DataFrame,
    orders: DataFrame,
    segments: tuple[str, ...] = ("BUILDING", "MACHINERY", "AUTOMOBILE"),
    priority: str = "1-URGENT",
) -> DataFrame:
    """TPC-H Q22-shaped global-promise check: per market segment, count
    the customers whose account balance beats the positive-balance
    average of their segment cohort AND who have never placed a
    ``priority`` order — the scalar-aggregate-filter + NOT-EXISTS
    combination. (Q22's literal inner predicate — no orders at all — is
    degenerate on the harness data, where every customer orders; the
    priority predicate keeps the identical plan shape non-degenerate at
    every SF.)

    Scale: the cohort average is one tiny map-combinable aggregate
    (≤ |segments| rows) broadcast back onto the customer scan — the
    classic two-pass scalar-subquery plan, no self-join of the fact.
    The NOT EXISTS is a LEFT ANTI join probing only the distinct
    ``o_custkey`` set (key-only shuffle, map-side distinct). The
    balance comparison happens in exact integer cents on both engines.
    """
    seg = customer.filter(F.col("c_mktsegment").isin(*segments)).select(
        "c_custkey",
        "c_mktsegment",
        _cents("c_acctbal").alias("_bal_c"),
    )
    avg_bal = F.broadcast(
        seg.filter(F.col("_bal_c") > 0)
        .groupBy("c_mktsegment")
        .agg(F.avg("_bal_c").alias("_avg_c"))
    )
    buyers = (
        orders.filter(F.col("o_orderpriority") == priority)
        .select("o_custkey")
        .distinct()
    )
    rich_idle = (
        seg.join(avg_bal, "c_mktsegment")
        .filter(F.col("_bal_c") > F.col("_avg_c"))
        .join(buyers, seg.c_custkey == buyers.o_custkey, "left_anti")
    )
    return (
        rich_idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("_bal_c") / 1e2, 6).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


def idle_customer_balance_sql(
    segments: tuple[str, ...] = ("BUILDING", "MACHINERY", "AUTOMOBILE"),
    priority: str = "1-URGENT",
) -> str:
    seg_list = ", ".join(f"'{s}'" for s in segments)
    return f"""
    WITH seg AS (
        SELECT c_custkey, c_mktsegment,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS _bal_c
        FROM customer WHERE c_mktsegment IN ({seg_list})
    ),
    avg_bal AS (
        SELECT c_mktsegment, AVG(_bal_c) AS _avg_c
        FROM seg WHERE _bal_c > 0 GROUP BY c_mktsegment
    )
    SELECT s.c_mktsegment,
           COUNT(*)::BIGINT AS n_customers,
           ROUND(CAST(SUM(s._bal_c) AS BIGINT) / 1e2, 6) AS total_balance
    FROM seg s
    JOIN avg_bal a ON a.c_mktsegment = s.c_mktsegment
    WHERE s._bal_c > a._avg_c
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = s.c_custkey
                        AND o.o_orderpriority = '{priority}')
    GROUP BY s.c_mktsegment
    ORDER BY s.c_mktsegment
    """


def forecast_revenue_change(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-shaped forecasting query: the revenue that would be
    gained by eliminating small discounts — one scan, three pushable
    predicates, one global sum. The point of the shape is that EVERY
    predicate reaches the parquet scan (ship-date range, discount
    band, quantity cap) and the aggregate is a map-side partial into a
    single row; there is no join and no groupBy key — the minimal
    full-scan query a warehouse runs constantly.

    Exactness: discount lands on hundredths in the data, so the cents
    product (price_cents × discount_cents) is integer-exact; one
    division at the end.
    """
    # plain column comparisons (not _cents expressions) so every
    # predicate is pushable to the parquet scan; the data's discounts
    # are exact 2-decimal doubles, so the double literals compare
    # identically in Spark and DuckDB.
    filtered = lineitem.filter(
        (F.col("l_shipdate") >= _tslit(date_from))
        & (F.col("l_shipdate") < _tslit(date_to))
        & (F.col("l_discount") >= disc_lo)
        & (F.col("l_discount") <= disc_hi)
        & (F.col("l_quantity") < max_qty)
    )
    rev = _cents("l_extendedprice") * _cents("l_discount")
    return filtered.agg(
        F.round(F.sum(rev) / 1e4, 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def forecast_revenue_change_sql(
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> str:
    return f"""
    SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                           * CAST(ROUND(l_discount * 100) AS BIGINT))
                      AS BIGINT) / 1e4, 6) AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{date_from}'
      AND l_shipdate < TIMESTAMP '{date_to}'
      AND l_discount >= {disc_lo}
      AND l_discount <= {disc_hi}
      AND l_quantity < {max_qty}
    """


def top_supplier_revenue(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15-shaped maximum-selection: the supplier(s) whose
    one-quarter revenue EQUALS the maximum — the "view + scalar-max
    equality" shape (not a top-1 LIMIT: ties must all surface, which
    is why the reference query famously needs the subquery).

    Scale: one scan builds the per-supplier revenue aggregate
    (map-side combinable, supplier-keyed); the max is a 1-row
    broadcast back over that aggregate — the fact table is read ONCE
    (plan-visible exchange reuse), never re-scanned for the subquery.
    Revenue in exact integer cents, so the equality is exact.
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= _tslit(date_from))
            & (F.col("l_shipdate") < _tslit(date_to))
        )
        .select(
            "l_suppkey",
            (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
                "_rev"
            ),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("_rev").alias("_rev_c"))
    )
    mx = rev.agg(F.max("_rev_c").alias("_mx"))
    supp = supplier.select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("_rev_c") == F.col("_mx"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev_c") / 1e4, 6).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def top_supplier_revenue_sql(
    date_from: str = "1996-01-01", date_to: str = "1996-04-01"
) -> str:
    return f"""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS _rev_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{date_from}'
          AND l_shipdate < TIMESTAMP '{date_to}'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, ROUND(r._rev_c / 1e4, 6) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r._rev_c = (SELECT MAX(_rev_c) FROM rev)
    ORDER BY s.s_suppkey
    """


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#23",
    frac: float = 0.2,
) -> DataFrame:
    """TPC-H Q17-shaped correlated average: total revenue of lines
    whose quantity is below ``frac`` × that part's average quantity,
    for one brand — the classic correlated scalar aggregate that
    decorrelates into a per-part aggregate + join.

    Scale: the brand-filtered part set is ~|part|/25 — small, but
    still ∝ SF, so no hard broadcast hint (AQE broadcasts it while it
    fits, partkey-partitions it at warehouse scale); the per-part
    average is one combinable aggregate over the brand's lines (exact
    integer cent sums, one double division); the threshold join is
    part-keyed. The fact is scanned once into both branches with the
    filter pushed down; exchange reuse shares the scan.
    """
    pbrand = part.filter(F.col("p_brand") == brand).select("p_partkey")
    lines = lineitem.join(
        pbrand, lineitem.l_partkey == pbrand.p_partkey
    ).select(
        "l_partkey",
        _cents("l_quantity").alias("_qty_c"),
        _cents("l_extendedprice").alias("_ep_c"),
    )
    avg_qty = lines.groupBy("l_partkey").agg(
        (F.sum("_qty_c").cast("double") / F.count(F.lit(1))).alias("_avg_c")
    ).select(F.col("l_partkey").alias("_pk"), "_avg_c")
    small = lines.join(avg_qty, lines.l_partkey == F.col("_pk")).filter(
        F.col("_qty_c").cast("double") < F.lit(frac) * F.col("_avg_c")
    )
    return small.agg(
        F.round(F.sum("_ep_c") / 1e2, 6).alias("small_line_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def small_quantity_revenue_sql(brand: str = "Brand#23", frac: float = 0.2) -> str:
    return f"""
    WITH lines AS (
        SELECT l.l_partkey,
               CAST(ROUND(l.l_quantity * 100) AS BIGINT) AS _qty_c,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS _ep_c
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = '{brand}'
    ),
    avg_qty AS (
        SELECT l_partkey,
               CAST(SUM(_qty_c) AS DOUBLE) / COUNT(*) AS _avg_c
        FROM lines GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(s._ep_c) AS BIGINT) / 1e2, 6)
               AS small_line_revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lines s JOIN avg_qty a ON a.l_partkey = s.l_partkey
    WHERE CAST(s._qty_c AS DOUBLE) < {frac} * a._avg_c
    """


def priority_ship_latency(
    orders: DataFrame, lineitem: DataFrame, on_time_days: int = 30
) -> DataFrame:
    """TPC-H Q12-flavored shipping-SLA rollup on the harness schema
    (which carries no shipmode/commitdate — priority plays Q12's
    grouping role): per order priority, lines shipped within
    ``on_time_days`` of the order date vs later, plus the mean latency.

    Scale: the fact⋈fact join keys on orderkey (both sides huge, AQE
    hash join); the aggregate is map-side combinable down to
    #priorities rows. All-integer epoch-day arithmetic; the single
    AVG division is the only double (identical IEEE in both engines).
    """
    o = orders.select(
        "o_orderkey",
        "o_orderpriority",
        _epoch_day("o_orderdate").alias("_od"),
    )
    li = lineitem.select(
        "l_orderkey", _epoch_day("l_shipdate").alias("_sd")
    )
    lat = F.col("_sd") - F.col("_od")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(lat <= on_time_days, 1).otherwise(0))
            .cast("long")
            .alias("on_time_lines"),
            F.sum(F.when(lat > on_time_days, 1).otherwise(0))
            .cast("long")
            .alias("late_lines"),
            F.round(F.avg(lat), 6).alias("avg_latency_days"),
        )
        .orderBy("o_orderpriority")
    )


def priority_ship_latency_sql(on_time_days: int = 30) -> str:
    return f"""
    SELECT o_orderpriority,
           SUM(CASE WHEN lat <= {on_time_days} THEN 1 ELSE 0 END)::BIGINT
               AS on_time_lines,
           SUM(CASE WHEN lat > {on_time_days} THEN 1 ELSE 0 END)::BIGINT
               AS late_lines,
           ROUND(AVG(lat), 6) AS avg_latency_days
    FROM (
        SELECT o.o_orderpriority,
               datediff('day', DATE '1970-01-01', l.l_shipdate::DATE)
               - datediff('day', DATE '1970-01-01', o.o_orderdate::DATE)
                   AS lat
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ) t
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """
