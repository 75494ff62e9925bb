package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational workload over the TPC-H-ish star schema. The reference itself
  * has no joins (SURVEY.md §2.4 — its only co-grouping is reduce-side E7);
  * these queries are the Dataset/Catalyst face the north star requires:
  * shuffled and broadcast joins, semi/anti joins, partial aggregation,
  * windows, and top-k — all built-in operators so predicate pushdown, column
  * pruning, AQE and whole-stage codegen apply unchanged at 100 TB.
  *
  * Scale notes per query are in each doc string; the global pattern:
  * dimensions (region/nation/supplier/part and filtered customer) are
  * broadcast, facts (orders/lineitem) are never collected, and every
  * aggregation is algebraic so map-side partial agg halves the shuffle.
  */
object Relational {
  import Tables.t
  import Det.r2e

  val q1 = Q(
    "q1_pricing_summary",
    "TPC-H Q1-style scan+filter+aggregate on lineitem. Algebraic aggs → " +
      "map-side partial aggregation; shipdate filter + 6-column projection " +
      "push into the parquet scan. At 100 TB this is a single scan, no join.",
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity) + 1e-6, 2)       AS sum_qty,
             round(sum(l_extendedprice) + 1e-6, 2)  AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS sum_disc_price,
             round(avg(l_quantity) + 1e-6, 2)       AS avg_qty,
             round(avg(l_extendedprice) + 1e-6, 2)  AS avg_price,
             count(*)                               AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus""".stripMargin),
    (spark, dir) => {
      val li = t(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2e(sum(col("l_quantity"))).as("sum_qty"),
          r2e(sum(col("l_extendedprice"))).as("sum_base_price"),
          r2e(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price"),
          r2e(avg(col("l_quantity"))).as("avg_qty"),
          r2e(avg(col("l_extendedprice"))).as("avg_price"),
          count(lit(1)).as("count_order"))
    })

  val q3 = Q(
    "q3_top_orders",
    "TPC-H Q3-style 3-way join + top-10 by revenue. Filtered customer dim " +
      "is broadcast; orders⋈lineitem shuffles on the join key once and the " +
      "groupBy reuses that partitioning. Top-k orders by the ROUNDED measure " +
      "with id tie-break (determinism across engines).",
    Some("""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_orderkey, orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10""".stripMargin),
    (spark, dir) => {
      val cust = t(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = t(spark, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(spark, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      // customer scales with SF (unlike nation/region): no broadcast
      // HINT — a hint forces the build side at ANY scale, where the
      // unhinted join lets stats/AQE broadcast at this SF and shuffle at
      // 100 TB. Same policy at every customer/supplier join site.
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .agg(r2e(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    })

  val q5 = Q(
    "q5_nation_revenue",
    "TPC-H Q5 semantics: revenue per nation where the supplying and buying " +
      "nations coincide (s_nationkey = c_nationkey), one region. " +
      "region/nation are broadcast inside the customer dim build, supplier " +
      "is broadcast against the fact; only orders⋈lineitem shuffles. At " +
      "100 TB the dims stay broadcast-able and AQE re-plans the fact join.",
    Some("""
      SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS revenue
      FROM region
      JOIN nation   ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name""".stripMargin),
    (spark, dir) => {
      val region = t(spark, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(spark, dir, "nation")
      val custDim = t(spark, dir, "customer")
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      val ord = t(spark, dir, "orders")
      val li = t(spark, dir, "lineitem")
      val supp = t(spark, dir, "supplier")
      // custDim/supp scale with SF — no broadcast hint (see q3 note).
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(custDim, ord("o_custkey") === custDim("c_custkey"))
        .join(supp,
          supp("s_suppkey") === li("l_suppkey") &&
            supp("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(r2e(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"))
    })

  val qSemi = Q(
    "q_order_priority_exists",
    "EXISTS semi-join: orders having any heavy lineitem (qty > 49), counted " +
      "per priority. left_semi avoids materializing matches and keeps one " +
      "shuffle; count per priority partial-aggregates map-side.",
    Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 49)
      GROUP BY o_orderpriority""".stripMargin),
    (spark, dir) => {
      val ord = t(spark, dir, "orders")
      val li = t(spark, dir, "lineitem").filter(col("l_quantity") > 49)
      ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    })

  val qAnti = Q(
    "q_customer_no_bigorder",
    "NOT EXISTS anti-join: customers with no order above 300k, per segment. " +
      "left_anti with the filter pushed below the join.",
    Some("""
      SELECT c_mktsegment, count(*) AS n_customers
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      GROUP BY c_mktsegment""".stripMargin),
    (spark, dir) => {
      val cust = t(spark, dir, "customer")
      val ord = t(spark, dir, "orders").filter(col("o_totalprice") > 300000)
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    })

  val qWindowTop = Q(
    "q_top_customers_per_nation",
    "Window ranking: top-3 customers by order spend within each nation. " +
      "row_number over (nation, spend) — rank on the ROUNDED spend with " +
      "custkey tie-break. One shuffle for the agg, one for the window " +
      "(same key → reused partitioning).",
    Some("""
      WITH spend AS (
        SELECT n_name, c_custkey,
               round(sum(o_totalprice) + 1e-6, 2) AS total_spend
        FROM nation
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        GROUP BY n_name, c_custkey)
      SELECT n_name, c_custkey, total_spend, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY n_name
                                     ORDER BY total_spend DESC, c_custkey) AS rank
        FROM spend)
      WHERE rank <= 3""".stripMargin),
    (spark, dir) => {
      val nation = t(spark, dir, "nation")
      val cust = t(spark, dir, "customer")
      val ord = t(spark, dir, "orders")
      val spend = ord
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("n_name"), col("c_custkey"))
        .agg(r2e(sum(col("o_totalprice"))).as("total_spend"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("total_spend").desc, col("c_custkey"))
      spend.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("n_name", "c_custkey", "total_spend", "rank")
    })

  val qPartStats = Q(
    "q_part_brand_stats",
    "Multi-aggregate with distinct count per brand. count(distinct) expands " +
      "to a two-phase aggregate; all other aggs stay partial-aggregated.",
    Some("""
      SELECT p_brand,
             count(*)               AS n_parts,
             count(DISTINCT p_type) AS n_types,
             round(avg(p_retailprice) + 1e-6, 2) AS avg_price,
             min(p_size) AS min_size, max(p_size) AS max_size
      FROM part GROUP BY p_brand""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "part").groupBy(col("p_brand")).agg(
        count(lit(1)).as("n_parts"),
        countDistinct(col("p_type")).as("n_types"),
        r2e(avg(col("p_retailprice"))).as("avg_price"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size")))

  val qAboveAvg = Q(
    "q_above_avg_balance",
    "Customers with account balance above their nation's average — " +
      "correlated-subquery semantics via a window average (single shuffle " +
      "on nationkey, no self-join).",
    Some("""
      SELECT c_custkey, round(c_acctbal + 1e-6, 2) AS acctbal,
             round(nation_avg + 1e-6, 2) AS nation_avg
      FROM (SELECT c_custkey, c_acctbal,
                   avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_avg
            FROM customer)
      WHERE c_acctbal > nation_avg""".stripMargin),
    (spark, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
      t(spark, dir, "customer")
        .withColumn("nation_avg_raw", avg(col("c_acctbal")).over(w))
        .filter(col("c_acctbal") > col("nation_avg_raw"))
        .select(col("c_custkey"), r2e(col("c_acctbal")).as("acctbal"),
          r2e(col("nation_avg_raw")).as("nation_avg"))
    })

  val qMonthly = Q(
    "q_revenue_by_month",
    "Calendar rollup: revenue and order count per (year, month) — date " +
      "extraction stays in the scan projection, the agg partial-aggregates.",
    Some("""
      SELECT date_part('year', o_orderdate)::BIGINT AS yr,
             date_part('month', o_orderdate)::BIGINT AS mon,
             round(sum(o_totalprice) + 1e-6, 2) AS revenue,
             count(*) AS n_orders
      FROM orders GROUP BY yr, mon""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"))
        .agg(r2e(sum(col("o_totalprice"))).as("revenue"),
          count(lit(1)).as("n_orders")))

  val qLargeOrders = Q(
    "q_large_orders_having",
    "TPC-H Q18-style large-volume orders: aggregate lineitem per order, " +
      "keep orders whose total quantity exceeds 300 (HAVING — the " +
      "post-aggregation filter operator), then join customer and order " +
      "details. The HAVING predicate evaluates on the aggregated frame " +
      "(thousands of rows), so the join that follows moves only the " +
      "surviving keys — the aggregate-then-filter-then-join ordering is " +
      "the plan a 100 TB run needs (filter-late would join every " +
      "lineitem row). Quantities are integral doubles, so the sum and " +
      "the > 300 comparison are exact on both engines.",
    Some("""
      WITH big AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
                   FROM lineitem GROUP BY l_orderkey
                   HAVING sum(l_quantity) > 300)
      SELECT c_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             round(o_totalprice + 1e-6, 2) AS totalprice,
             round(total_qty + 1e-6, 2) AS total_qty
      FROM big
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey""".stripMargin),
    (spark, dir) => {
      val big = t(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300)
      val ord = t(spark, dir, "orders")
      val cust = t(spark, dir, "customer").select(col("c_custkey"))
      big.join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          r2e(col("o_totalprice")).as("totalprice"),
          r2e(col("total_qty")).as("total_qty"))
    })

  val q7 = Q(
    "q7_nation_volume",
    "TPC-H Q7 semantics (volume shipping): bilateral trade between two " +
      "nations by shipment year, both directions. The Spark-first move " +
      "is DIM-SIDE pruning: nation is filtered to the two names BEFORE " +
      "joining, so the broadcast semi-reduces supplier and customer to " +
      "two nations' rows early and the fact tables shuffle only " +
      "pre-pruned keys — the OR-pair predicate then runs on the tiny " +
      "joined frame instead of gating a full fact product. Only " +
      "lineitem⋈orders(⋈customer) shuffle; two-column year extraction " +
      "stays in the scan projection.",
    Some("""
      SELECT supp_nation, cust_nation, l_year,
             round(sum(volume) + 1e-6, 2) AS revenue
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   date_part('year', l_shipdate)::BIGINT AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name IN ('NATION_10', 'NATION_12')
              AND n2.n_name IN ('NATION_10', 'NATION_12')
              AND n1.n_name <> n2.n_name
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
      GROUP BY supp_nation, cust_nation, l_year""".stripMargin),
    (spark, dir) => {
      val pair = t(spark, dir, "nation")
        .filter(col("n_name").isin("NATION_10", "NATION_12"))
      val supp = t(spark, dir, "supplier")
        .join(broadcast(pair.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = t(spark, dir, "customer")
        .join(broadcast(pair.select(col("n_nationkey").as("cnk"),
          col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
        .select(col("c_custkey"), col("cust_nation"))
      val li = t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      li.join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .select(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(r2e(sum(col("volume"))).as("revenue"))
    })

  val q9 = Q(
    "q9_product_profit",
    "TPC-H Q9 semantics (product-type profit), adapted to the schema's " +
      "missing partsupp: profit = revenue minus a retail-derived cost " +
      "(0.6 × p_retailprice × quantity), per supplying nation and order " +
      "year, for one part type. part is filtered BEFORE the fact join " +
      "(the selective dim prunes lineitem by partkey), nation broadcasts " +
      "into supplier; the profit expression is spelled with identical " +
      "associativity in both engines and the per-group sum rounds " +
      "through the epsilon convention.",
    Some("""
      SELECT nation, o_year, round(sum(amount) + 1e-6, 2) AS sum_profit
      FROM (SELECT n_name AS nation,
                   date_part('year', o_orderdate)::BIGINT AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_type = 'PROMO')
      GROUP BY nation, o_year""".stripMargin),
    (spark, dir) => {
      val promo = t(spark, dir, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey"), col("p_retailprice"))
      val suppN = t(spark, dir, "supplier")
        .join(broadcast(t(spark, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      t(spark, dir, "lineitem")
        .join(promo, col("l_partkey") === col("p_partkey"))
        .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(suppN, col("l_suppkey") === col("s_suppkey"))
        .select(col("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))
            - lit(0.6) * col("p_retailprice") * col("l_quantity")).as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(r2e(sum(col("amount"))).as("sum_profit"))
    })

  val q6 = Q(
    "q6_forecast_revenue",
    "TPC-H Q6 (forecasting revenue change): the pure scan-side query — " +
      "one year of shipments, a discount band, a quantity cap, ONE " +
      "aggregate, NO join and NO shuffle beyond the final 1-row gather. " +
      "Its whole value at 100 TB is what reaches the parquet scan: all " +
      "three predicates and the 4-column projection push down " +
      "(PlanShapeSpec's pushed-filters lock), so the engine reads row " +
      "groups whose min/max stats intersect the band and nothing else — " +
      "the query the Z-order/compaction layout work exists to serve.",
    Some("""
      SELECT round(sum(l_extendedprice * l_discount) + 1e-6, 2) AS revenue,
             count(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(r2e(sum(col("l_extendedprice") * col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items")))

  val q14 = Q(
    "q14_promo_effect",
    "TPC-H Q14 (promotion effect): the share of a quarter's revenue " +
      "from promotional parts — a conditional-aggregate ratio over the " +
      "lineitem⋈part join. The date filter prunes the fact scan BEFORE " +
      "the join; part carries only (key, type). The ratio divides two " +
      "sums from the SAME aggregation pass (one plan, no second scan) " +
      "and rounds through the epsilon convention.",
    Some("""
      SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0 END)
               / sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
               AS promo_revenue_pct,
             count(*) AS n_items
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-12-01 00:00:00'""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-12-01").cast("timestamp"))
        .join(t(spark, dir, "part")
          .select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) * sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(0.0))
          / sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          + lit(1e-6), 2).as("promo_revenue_pct"),
          count(lit(1)).as("n_items")))

  val q10 = Q(
    "q10_returned_items",
    "TPC-H Q10 (returned-item reporting): the top-20 customers by " +
      "revenue lost to returns in one quarter — the classic " +
      "fact-filter → join → aggregate → top-k report. Both fact " +
      "filters (returnflag on lineitem, the quarter on orders) push to " +
      "their scans BEFORE the join; nation broadcasts into the customer " +
      "dim; top-20 orders by the ROUNDED revenue with the custkey " +
      "tie-break (the repo top-k rule) and compiles to TakeOrdered — " +
      "no global sort.",
    Some("""
      SELECT c_custkey, c_name, n_name,
             round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
               AS revenue
      FROM customer
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""".stripMargin),
    (spark, dir) => {
      val cust = t(spark, dir, "customer")
        .join(broadcast(t(spark, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"))
      val ord = t(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(r2e(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    })

  val q19 = Q(
    "q19_discounted_revenue",
    "TPC-H Q19 semantics (discounted revenue, adapted to the schema's " +
      "columns): revenue from lineitems matching ANY of three " +
      "brand/size/quantity bracket conjunctions — the classic " +
      "DISJUNCTION-of-conjunctions predicate. The optimizer's job here " +
      "is factoring: the brand/size legs PRUNE the part dim before the " +
      "join (Catalyst extracts the per-side disjunction " +
      "p_brand IN (...) and the size hull as scan filters), the " +
      "quantity hull prunes lineitem, and the full mixed predicate " +
      "runs post-join on the survivors — the 100 TB difference between " +
      "scanning three part brackets and scanning the whole fact " +
      "product.",
    Some("""
      SELECT round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
               AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 15)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
               AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
               AND l_quantity BETWEEN 20 AND 45)""".stripMargin),
    (spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val p = t(spark, dir, "part")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10)
            && col("l_quantity").between(1, 15))
          || (col("p_brand") === "Brand#2" && col("p_size").between(5, 20)
            && col("l_quantity").between(10, 30))
          || (col("p_brand") === "Brand#3" && col("p_size").between(10, 40)
            && col("l_quantity").between(20, 45)))
        .agg(r2e(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"),
          count(lit(1)).as("n_items"))
    })

  val all: Seq[Q] =
    Seq(q1, q3, q5, qSemi, qAnti, qWindowTop, qPartStats, qAboveAvg,
      qMonthly, qLargeOrders, q7, q9, q6, q14, q10, q19)
}
