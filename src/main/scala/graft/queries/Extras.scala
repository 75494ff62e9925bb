package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage extensions beyond the core workload: multi-level aggregation
  * (ROLLUP), the full window-function family, an as-of join, portable scalar
  * functions, approximate distinct (HLL), and a salted skew-resistant
  * aggregation proving the two-phase decomposition is lossless.
  */
object Extras {
  import Tables.t
  import Det.r2e

  val rollup = Q(
    "q_rollup_sales",
    "ROLLUP over (segment, priority): per-cell, per-segment and grand-total " +
      "sums in one pass — Catalyst expands to a single Expand+Aggregate, " +
      "one shuffle regardless of level count.",
    Some("""
      SELECT c_mktsegment, o_orderpriority,
             round(sum(o_totalprice) + 1e-6, 2) AS total_sales,
             count(*) AS n_orders
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY ROLLUP (c_mktsegment, o_orderpriority)""".stripMargin),
    (spark, dir) => {
      val cust = t(spark, dir, "customer")
      val ord = t(spark, dir, "orders")
      // customer scales with SF — no broadcast hint (see q3 note).
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .rollup(col("c_mktsegment"), col("o_orderpriority"))
        .agg(r2e(sum(col("o_totalprice"))).as("total_sales"),
          count(lit(1)).as("n_orders"))
    })

  val windowFuncs = Q(
    "q_window_functions",
    "The analytic-function family over one window (nation, balance desc): " +
      "rank, dense_rank, ntile, lag delta, running sum. One shuffle on the " +
      "partition key serves all five.",
    Some("""
      SELECT c_custkey,
             c_nationkey,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             ntile(4)     OVER w AS quartile,
             round(c_acctbal - lag(c_acctbal) OVER w + 1e-6, 2) AS bal_delta,
             round(sum(c_acctbal) OVER (PARTITION BY c_nationkey
                                        ORDER BY c_acctbal DESC, c_custkey
                                        ROWS UNBOUNDED PRECEDING) + 1e-6, 2)
               AS running_bal
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""".stripMargin),
    (spark, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(spark, dir, "customer").select(
        col("c_custkey"),
        col("c_nationkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        r2e(col("c_acctbal") - lag(col("c_acctbal"), 1).over(w)).as("bal_delta"),
        r2e(sum(col("c_acctbal"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .as("running_bal"))
    })

  val asof = Q(
    "q_asof_last_signup",
    "As-of join: each purchase matched to the user's most recent prior-or-" +
      "same-time signup — the union+running-max window formulation (one " +
      "shuffle on user, no range join product). The same plan shape " +
      "implements point-in-time feature lookups at scale.",
    Some("""
      WITH u AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN event_type = 'signup' THEN ts END AS signup_ts
        FROM events WHERE event_type IN ('purchase', 'signup')),
      f AS (
        SELECT *, max(signup_ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS last_signup
        FROM u)
      SELECT event_id, user_id,
             epoch(ts) - epoch(last_signup) AS secs_since_signup
      FROM f WHERE event_type = 'purchase'""".stripMargin),
    (spark, dir) => {
      val u = t(spark, dir, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .withColumn("signup_ts",
          when(col("event_type") === "signup", col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      u.withColumn("last_signup", max(col("signup_ts")).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          (col("ts").cast("double") - col("last_signup").cast("double"))
            .as("secs_since_signup"))
    })

  val scalarFuncs = Q(
    "q_scalar_functions",
    "Portable scalar-function surface (string/math/modulo) as one " +
      "codegen'd projection over part — no UDFs.",
    Some("""
      SELECT p_partkey,
             upper(p_brand) AS brand_u,
             substr(p_type, 1, 3) AS type3,
             length(p_name)::BIGINT AS name_len,
             round(sqrt(p_retailprice) + 1e-6, 2) AS price_sqrt,
             (p_size % 5)::BIGINT AS size_mod,
             concat(p_brand, '/', p_type) AS brand_type
      FROM part""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_type"), 1, 3).as("type3"),
        length(col("p_name")).cast("long").as("name_len"),
        r2e(sqrt(col("p_retailprice"))).as("price_sqrt"),
        (col("p_size") % 5).cast("long").as("size_mod"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type")))

  val approxDistinct = Q(
    "q_approx_distinct_users",
    "HLL approximate distinct users per event type alongside the exact " +
      "count. The raw estimate has no cross-engine oracle (Spark's HLL++ " +
      "and DuckDB's HLL hash differently), so the ORACLED value is the " +
      "approximation CONTRACT itself: each engine runs its own native " +
      "approx-distinct and asserts |approx - exact| <= 10% * exact — the " +
      "same bound ScaleSpec pins — making the query fully rows+schema+" +
      "hash checkable while still exercising the engine-internal sketch " +
      "(both HLLs are near-exact at this per-type cardinality, ~150, " +
      "where HLL++ is still in sparse mode, so the boolean is " +
      "deterministically true in both engines).",
    Some("""
      SELECT event_type,
             count(DISTINCT user_id) AS exact_users,
             abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
               <= 0.1 * count(DISTINCT user_id) AS approx_within_10pct
      FROM events GROUP BY event_type""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "events").groupBy(col("event_type")).agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * lit(0.1)).as("approx_within_10pct")))

  val hllPortable = Q(
    "q_hll_portable",
    "HyperLogLog approximate distinct users per event type, built from " +
      "PORTABLE primitives so the full register pipeline is DuckDB-" +
      "oracle-checkable — unlike q_approx_distinct_users, whose engine-" +
      "internal HLL has no cross-engine oracle (Flajolet et al. 2007; " +
      "p=9, m=512): bucket = top 9 bits of the md5 lane, rank = leading " +
      "zeros of the 23-bit suffix + 1 via length(bin(x)) — pure integer/" +
      "string ops, no libm log2 on the hot path. Registers are a " +
      "(type, bucket) max aggregation (partial-aggregable; 512 registers " +
      "per group regardless of cardinality — the sketch contract); empty " +
      "buckets join in from a generated spine. The harmonic denominator " +
      "is a sum of exact powers of two (order-free in IEEE — no epsilon " +
      "needed); the one libm call (ln, in the linear-counting small-" +
      "range correction) is confined to the rounded output. Estimate " +
      "lands within ~2% of the exact 150 at this SF.",
    Some("""
      WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
           h AS (SELECT event_type,
                        ('0x' || substr(md5('0:' || user_id), 1, 8))::BIGINT AS hv
                 FROM u),
           br AS (SELECT event_type, (hv >> 23) AS bucket,
                         CASE WHEN (hv & 8388607) = 0 THEN 24
                              ELSE 24 - length(bin(hv & 8388607)) END AS rank
                  FROM h),
           reg AS (SELECT event_type, bucket, max(rank) AS m
                   FROM br GROUP BY event_type, bucket),
           spine AS (SELECT DISTINCT event_type, t.b AS bucket
                     FROM events, range(0, 512) t(b)),
           full_reg AS (SELECT spine.event_type AS event_type, spine.bucket,
                               coalesce(reg.m, 0) AS m
                        FROM spine LEFT JOIN reg
                          ON reg.event_type = spine.event_type
                         AND reg.bucket = spine.bucket),
           agg AS (SELECT event_type, sum(power(2.0, -m)) AS denom,
                          sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros
                   FROM full_reg GROUP BY event_type),
           est AS (SELECT event_type, zeros,
                          (0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0 / denom AS raw
                   FROM agg),
           exact AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
                     FROM events GROUP BY event_type)
      SELECT e.event_type AS event_type, e.exact_users AS exact_users,
             round(CASE WHEN s.raw <= 1280.0 AND s.zeros > 0
                        THEN 512.0 * ln(512.0 / s.zeros) ELSE s.raw END + 1e-6, 2)
               AS hll_est,
             s.zeros AS empty_buckets
      FROM exact e JOIN est s ON s.event_type = e.event_type""".stripMargin),
    (spark, dir) => {
      val ev = t(spark, dir, "events")
      // ONE scan (same shape as q_hll_merge): registers, the spine's type
      // set, and the exact comparator all derive from the distinct
      // (event_type, user_id) checkpoint instead of three event scans.
      val pairs = Q.materialize(
        ev.select(col("event_type"), col("user_id")).distinct())
      val h = pairs
        .select(col("event_type"),
          graft.functions.Md5Lanes(col("user_id").cast("string"), 0, 1)
            .getItem(0).as("hv"))
      val reg = h
        .select(col("event_type"), shiftright(col("hv"), 23).as("bucket"),
          when((col("hv").bitwiseAND(lit(8388607L))) === 0L, lit(24))
            .otherwise(lit(24) - length(bin(col("hv").bitwiseAND(lit(8388607L)))))
            .as("rank"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(max(col("rank")).as("m"))
      val spine = pairs.select(col("event_type")).distinct()
        .select(col("event_type"),
          explode(expr("sequence(0L, 511L)")).as("bucket"))
      val agg = spine.join(reg, Seq("event_type", "bucket"), "left")
        .withColumn("m", coalesce(col("m"), lit(0)))
        .groupBy(col("event_type"))
        .agg(sum(pow(lit(2.0), -col("m"))).as("denom"),
          sum(when(col("m") === 0, 1L).otherwise(0L)).cast("long").as("zeros"))
        .withColumn("raw",
          lit(0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0 / col("denom"))
      val exact = pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("exact_users"))
      exact.join(agg, "event_type")
        .select(col("event_type"), col("exact_users"),
          r2e(when(col("raw") <= 1280.0 && col("zeros") > 0,
            lit(512.0) * log(lit(512.0) / col("zeros"))).otherwise(col("raw")))
            .as("hll_est"),
          col("zeros").as("empty_buckets"))
    })

  val saltedWordcount = Q(
    "q_salted_wordcount",
    "Skew-resistant two-phase aggregation: tokens pre-aggregated on " +
      "(word, salt) then combined per word — the hot-key (stopword) salting " +
      "pattern. Same oracle as mr_wordcount: the decomposition is lossless.",
    Some(s"""
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word
            FROM documents)
      WHERE word <> ''
      GROUP BY word""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "[^a-zA-Z]+")).as("word"))
        .filter(col("word") =!= "")
        .withColumn("salt", pmod(col("doc_id"), lit(16)))
        .groupBy(col("word"), col("salt"))
        .agg(count(lit(1)).as("partial"))
        .groupBy(col("word"))
        .agg(sum(col("partial")).cast("long").as("cnt")))

  val percentiles = Q(
    "q_percentiles",
    "Exact quantiles (median / p95, linear interpolation) of order value " +
      "per segment. Exact percentile sorts within the group — fine for " +
      "bounded groups; the approximate path for heavy keys is " +
      "approx_percentile (see q_approx_distinct_users for the approx " +
      "contract).",
    Some("""
      SELECT c_mktsegment,
             round(quantile_cont(o_totalprice, 0.5) + 1e-6, 2) AS median_price,
             round(quantile_cont(o_totalprice, 0.95) + 1e-6, 2) AS p95_price,
             count(*) AS n_orders
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_mktsegment""".stripMargin),
    (spark, dir) => {
      val cust = t(spark, dir, "customer")
      val ord = t(spark, dir, "orders")
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          r2e(expr("percentile(o_totalprice, 0.5)")).as("median_price"),
          r2e(expr("percentile(o_totalprice, 0.95)")).as("p95_price"),
          count(lit(1)).as("n_orders"))
    })

  val corrStats = Q(
    "q_corr_stats",
    "Statistical aggregates per return flag: Pearson correlation, sample " +
      "stddev, sample covariance of quantity vs extended price — all " +
      "algebraic (sum/sum-of-squares decompositions), so they partial-" +
      "aggregate map-side like any sum.",
    Some("""
      SELECT l_returnflag,
             round(corr(l_quantity, l_extendedprice) + 1e-8, 4) AS qty_price_corr,
             round(stddev_samp(l_quantity) + 1e-8, 4) AS qty_stddev,
             round(covar_samp(l_quantity, l_extendedprice) + 1e-6, 2) AS qty_price_covar,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        Det.r4e(corr(col("l_quantity"), col("l_extendedprice")))
          .as("qty_price_corr"),
        Det.r4e(stddev_samp(col("l_quantity"))).as("qty_stddev"),
        r2e(covar_samp(col("l_quantity"), col("l_extendedprice")))
          .as("qty_price_covar"),
        count(lit(1)).as("n")))

  val cube = Q(
    "q_cube_status",
    "CUBE over (status, priority): all four grouping sets in one " +
      "Expand+Aggregate pass — with ROLLUP (q_rollup_sales) this covers the " +
      "GROUPING SETS family. Counts only: fully exact.",
    Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders")))

  val pivot = Q(
    "q_pivot_status",
    "PIVOT: per-priority order counts spread into one column per status " +
      "(P/O/F) via Spark's groupBy().pivot() with an EXPLICIT value list — " +
      "the two-pass value-discovery variant would collect distinct keys to " +
      "the driver, which is both nondeterministic in column order and a " +
      "driver bottleneck at scale. The oracle is the equivalent " +
      "conditional aggregation (what pivot compiles to anyway).",
    Some("""
      SELECT o_orderpriority,
             count(*) FILTER (WHERE o_orderstatus = 'P')::BIGINT AS n_p,
             count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS n_o,
             count(*) FILTER (WHERE o_orderstatus = 'F')::BIGINT AS n_f
      FROM orders GROUP BY o_orderpriority""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("P", "O", "F"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("P"), lit(0L)).as("n_p"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("F"), lit(0L)).as("n_f")))

  val unpivot = Q(
    "q_unpivot_balances",
    "UNPIVOT/melt: the customer's two numeric measures (account balance, " +
      "name length as a stand-in second measure) melted into " +
      "(customer, measure, value) long form — Spark's native unpivot " +
      "operator (Expand under the hood, no shuffle at all until the " +
      "consumer aggregates). Long-form output is the shape feature " +
      "pipelines expect.",
    Some("""
      SELECT c_custkey, measure, round(value + 1e-6, 2) AS value
      FROM (
        SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS value FROM customer
        UNION ALL
        SELECT c_custkey, 'name_len' AS measure, length(c_name)::DOUBLE AS value
        FROM customer)
      WHERE c_custkey <= 200""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(col("c_custkey"), col("c_acctbal").as("acctbal"),
          length(col("c_name")).cast("double").as("name_len"))
        .unpivot(Array(col("c_custkey")),
          Array(col("acctbal"), col("name_len")), "measure", "value")
        .select(col("c_custkey"), col("measure"),
          Det.r2e(col("value")).as("value")))

  val hllMerge = Q(
    "q_hll_merge",
    "HLL MERGEABILITY — the property that makes sketches the 100 TB " +
      "cardinality answer: registers built independently per partition " +
      "(here, per event_type) and merged by bucket-wise max are " +
      "BIT-IDENTICAL to registers built over the union directly (max is " +
      "associative/commutative/idempotent, and a user shared by two " +
      "types hashes to the same (bucket, rank) in both partial " +
      "sketches). The query computes both paths with the same portable " +
      "p=9 primitives as q_hll_portable and emits both estimates plus " +
      "their equality — est_match is TRUE by mathematics, not " +
      "coincidence. Operationally this is the contract that lets a " +
      "cluster sketch each of 10^5 partitions once and answer global " +
      "AND per-partition distinct counts from 512-byte register sets, " +
      "no re-scan — the single-row assemblies at the end are bounded " +
      "1-row broadcast crosses.",
    Some("""
      WITH br AS (SELECT event_type, (hv >> 23) AS bucket,
                         CASE WHEN (hv & 8388607) = 0 THEN 24
                              ELSE 24 - length(bin(hv & 8388607)) END AS rank
                  FROM (SELECT event_type,
                               ('0x' || substr(md5('0:' || user_id), 1, 8))::BIGINT AS hv
                        FROM (SELECT DISTINCT event_type, user_id FROM events))),
           preg AS (SELECT event_type, bucket, max(rank) AS m
                    FROM br GROUP BY event_type, bucket),
           merged AS (SELECT bucket, max(m) AS m FROM preg GROUP BY bucket),
           dbr AS (SELECT (hv >> 23) AS bucket,
                          CASE WHEN (hv & 8388607) = 0 THEN 24
                               ELSE 24 - length(bin(hv & 8388607)) END AS rank
                   FROM (SELECT ('0x' || substr(md5('0:' || user_id), 1, 8))::BIGINT AS hv
                         FROM (SELECT DISTINCT user_id FROM events))),
           direct AS (SELECT bucket, max(rank) AS m FROM dbr GROUP BY bucket),
           spine AS (SELECT t.b AS bucket FROM range(0, 512) t(b)),
           est_m AS (SELECT round(CASE WHEN raw <= 1280.0 AND zeros > 0
                                       THEN 512.0 * ln(512.0 / zeros) ELSE raw END + 1e-6, 2) AS merged_est
                     FROM (SELECT (0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0 / sum(power(2.0, -m)) AS raw,
                                  sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros
                           FROM (SELECT spine.bucket, coalesce(merged.m, 0) AS m
                                 FROM spine LEFT JOIN merged ON merged.bucket = spine.bucket))),
           est_d AS (SELECT round(CASE WHEN raw <= 1280.0 AND zeros > 0
                                       THEN 512.0 * ln(512.0 / zeros) ELSE raw END + 1e-6, 2) AS direct_est
                     FROM (SELECT (0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0 / sum(power(2.0, -m)) AS raw,
                                  sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros
                           FROM (SELECT spine.bucket, coalesce(direct.m, 0) AS m
                                 FROM spine LEFT JOIN direct ON direct.bucket = spine.bucket))),
           ex AS (SELECT count(DISTINCT user_id) AS exact_users FROM events),
           np AS (SELECT count(DISTINCT event_type)::BIGINT AS n_partials FROM events)
      SELECT exact_users, n_partials, merged_est, direct_est,
             merged_est = direct_est AS est_match
      FROM ex, np, est_m, est_d""".stripMargin),
    (spark, dir) => {
      val ev = t(spark, dir, "events")
      // ONE scan of the data: the distinct (event_type, user_id)
      // projection is the common ancestor of everything downstream —
      // partial registers, direct registers, the exact count, and the
      // partial census all derive from this checkpoint (un-materialized,
      // each derivation re-scanned events: 4 scans for a sketch whose
      // whole sales pitch is touching the data once).
      val pairs = Q.materialize(
        ev.select(col("event_type"), col("user_id")).distinct())
      def hvCol = graft.functions.Md5Lanes(col("user_id").cast("string"), 0, 1)
        .getItem(0).as("hv")
      def brOf(df: org.apache.spark.sql.DataFrame, keep: Seq[String]) = df
        .select(keep.map(col) :+ hvCol: _*)
        .select(keep.map(col) :+ shiftright(col("hv"), 23).as("bucket") :+
          when((col("hv").bitwiseAND(lit(8388607L))) === 0L, lit(24))
            .otherwise(lit(24) -
              length(bin(col("hv").bitwiseAND(lit(8388607L))))).as("rank"): _*)
      val preg = brOf(pairs, Seq("event_type"))
        .groupBy(col("event_type"), col("bucket")).agg(max(col("rank")).as("m"))
      val merged = preg.groupBy(col("bucket")).agg(max(col("m")).as("m"))
      val du = pairs.select(col("user_id")).distinct()
      val direct = brOf(du, Seq.empty)
        .groupBy(col("bucket")).agg(max(col("rank")).as("m"))
      val spine = spark.range(512).select(col("id").as("bucket"))
      def estOf(reg: org.apache.spark.sql.DataFrame, name: String) = spine
        .join(reg, Seq("bucket"), "left")
        .withColumn("m", coalesce(col("m"), lit(0)))
        .agg(sum(pow(lit(2.0), -col("m"))).as("denom"),
          sum(when(col("m") === 0, 1L).otherwise(0L)).cast("long").as("zeros"))
        .withColumn("raw",
          lit(0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0 / col("denom"))
        .select(r2e(when(col("raw") <= 1280.0 && col("zeros") > 0,
          lit(512.0) * log(lit(512.0) / col("zeros"))).otherwise(col("raw")))
          .as(name))
      val ex = du.agg(count(lit(1)).as("exact_users"))
      val np = pairs.agg(countDistinct(col("event_type")).cast("long")
        .as("n_partials"))
      ex.crossJoin(broadcast(np))
        .crossJoin(broadcast(estOf(merged, "merged_est")))
        .crossJoin(broadcast(estOf(direct, "direct_est")))
        .withColumn("est_match", col("merged_est") === col("direct_est"))
    })

  val quantileSketch = Q(
    "q_quantile_sketch",
    "Mergeable quantile sketch — the fourth member of the sketch family " +
      "(CMS = frequency, HLL = cardinality, Bloom = membership, " +
      "histogram = quantiles): a fixed 1024-bucket equi-width histogram " +
      "of order values (the t-digest/KLL contract at its simplest — the " +
      "bucket-count build is a bounded partial-aggregable shape whose " +
      "partials merge by addition), read out as p50/p90/p99 by " +
      "cumulative walk (a window over AT MOST 1024 rows — never the " +
      "data), next to the exact interpolated percentiles for the error " +
      "demonstration. Two bounded scans: a 1-row min/max/count " +
      "aggregate broadcast back to bucket the values (the classic " +
      "two-pass batch histogram), then the sketch build. Estimate = " +
      "bucket upper edge, so error ≤ one bucket width by construction " +
      "(QuantileSketchSpec asserts it).",
    Some("""
      WITH rng AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx,
                          count(*) AS n
                   FROM orders),
           b AS (SELECT least(floor((o_totalprice - mn) / ((mx - mn) / 1024.0)),
                               1023)::BIGINT AS bucket, n
                 FROM orders, rng),
           h AS (SELECT bucket, n, count(*) AS c FROM b GROUP BY bucket, n),
           cum AS (SELECT bucket, n, sum(c) OVER (ORDER BY bucket) AS cum FROM h),
           qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
           eb AS (SELECT q, min(bucket) AS eb
                  FROM qs JOIN cum ON cum.cum >= ceil(q * cum.n)
                  GROUP BY q),
           est AS (SELECT q,
                          round(mn + (eb + 1) * ((mx - mn) / 1024.0) + 1e-6, 2)
                            AS hist_est
                   FROM eb, rng),
           ex AS (SELECT round(quantile_cont(o_totalprice, 0.5) + 1e-6, 2) AS e50,
                         round(quantile_cont(o_totalprice, 0.9) + 1e-6, 2) AS e90,
                         round(quantile_cont(o_totalprice, 0.99) + 1e-6, 2) AS e99
                  FROM orders),
           exact AS (SELECT 0.5 AS q, e50 AS exact_cont FROM ex
                     UNION ALL SELECT 0.9, e90 FROM ex
                     UNION ALL SELECT 0.99, e99 FROM ex)
      SELECT est.q AS q, hist_est, exact_cont
      FROM est JOIN exact ON exact.q = est.q""".stripMargin),
    (spark, dir) => {
      val ord = t(spark, dir, "orders")
      // Materialized 1-row range: it feeds the bucketing AND the readout
      // edge math — un-checkpointed, each 1-row cross re-derived it with
      // its own scan (with the 3-way exact union this query read orders
      // 6×; now: range + sketch build + exact comparator = 3).
      val rng = Q.materialize(ord.agg(min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"), count(lit(1)).as("n")))
      val width = (col("mx") - col("mn")) / lit(1024.0)
      val h = ord.select(col("o_totalprice")).crossJoin(broadcast(rng))
        .select(least(floor((col("o_totalprice") - col("mn")) / width),
          lit(1023)).cast("long").as("bucket"), col("n"))
        .groupBy(col("bucket"), col("n")).agg(count(lit(1)).as("c"))
      // Global cumulative window over the ≤1024-bucket sketch, never the
      // data — the no-partition WARN is suppressed at session build (see
      // Sessions.quietBoundedWindowWarn); PlanShapeSpec locks the bound.
      val cum = h.withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val qs = spark.range(1)
        .select(explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))
      val est = qs.join(cum, col("cum") >= ceil(col("q") * col("n")))
        .groupBy(col("q")).agg(min(col("bucket")).as("eb"))
        .crossJoin(broadcast(rng))
        .select(col("q"),
          r2e(col("mn") + (col("eb") + 1) * width).as("hist_est"))
      // ONE percentile buffer for all three quantiles (the 3-call form
      // builds three copies of the same value-count map per partition),
      // and ONE explode for the long form (the 3-way self-union
      // re-evaluated the percentile scan per branch).
      val exact = ord
        .agg(expr("percentile(o_totalprice, array(0.5D, 0.9D, 0.99D))")
          .as("ps"))
        .select(explode(array(
          struct(lit(0.5).as("q"), r2e(col("ps").getItem(0)).as("exact_cont")),
          struct(lit(0.9).as("q"), r2e(col("ps").getItem(1)).as("exact_cont")),
          struct(lit(0.99).as("q"), r2e(col("ps").getItem(2)).as("exact_cont"))))
          .as("x"))
        .select(col("x.q").as("q"), col("x.exact_cont").as("exact_cont"))
      est.join(exact, "q")
    })

  val quantileMerge = Q(
    "q_quantile_merge",
    "Histogram-sketch MERGEABILITY — the q_hll_merge proof for the " +
      "quantile member of the sketch family: per-partition histograms " +
      "(here, per o_orderstatus) built against the SHARED global range " +
      "and merged by bucket-wise ADDITION are count-identical to the " +
      "histogram built over the union directly (addition is " +
      "associative/commutative; the shared range makes bucket ids " +
      "align), so the p90 read off the merged sketch equals the direct " +
      "read bit-for-bit. buckets_match compares every bucket count " +
      "through a FULL OUTER join (a one-sided bucket would fail it); " +
      "est_match compares the readouts. Operationally this is why a " +
      "cluster can sketch each partition once, ship 1024 longs per " +
      "partition, and answer global quantiles with no re-scan — the " +
      "same contract q_hll_merge proves for cardinality.",
    Some("""
      WITH rng AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx,
                          count(*) AS n
                   FROM orders),
           b AS (SELECT o_orderstatus,
                        least(floor((o_totalprice - mn) / ((mx - mn) / 1024.0)),
                              1023)::BIGINT AS bucket, n
                 FROM orders, rng),
           partials AS (SELECT o_orderstatus, bucket, n, count(*) AS c
                        FROM b GROUP BY o_orderstatus, bucket, n),
           merged AS (SELECT bucket, n, sum(c)::BIGINT AS c
                      FROM partials GROUP BY bucket, n),
           direct AS (SELECT bucket, n, count(*)::BIGINT AS c
                      FROM b GROUP BY bucket, n),
           bm AS (SELECT bool_and(coalesce(d.c, -1) = coalesce(m.c, -2))
                           AS buckets_match
                  FROM direct d FULL JOIN merged m ON m.bucket = d.bucket),
           cm AS (SELECT bucket, n, sum(c) OVER (ORDER BY bucket) AS cum
                  FROM merged),
           cd AS (SELECT bucket, n, sum(c) OVER (ORDER BY bucket) AS cum
                  FROM direct),
           em AS (SELECT round(mn + (min(bucket) + 1) * ((mx - mn) / 1024.0)
                                + 1e-6, 2) AS p90_merged
                  FROM cm, rng WHERE cum >= ceil(0.9 * cm.n) GROUP BY mn, mx),
           ed AS (SELECT round(mn + (min(bucket) + 1) * ((mx - mn) / 1024.0)
                                + 1e-6, 2) AS p90_direct
                  FROM cd, rng WHERE cum >= ceil(0.9 * cd.n) GROUP BY mn, mx),
           np AS (SELECT count(DISTINCT o_orderstatus)::BIGINT AS n_partials
                  FROM orders),
           nb AS (SELECT count(*)::BIGINT AS n_buckets FROM merged)
      SELECT n_partials, n_buckets, buckets_match, p90_merged, p90_direct,
             p90_merged = p90_direct AS est_match
      FROM np, nb, bm, em, ed""".stripMargin),
    (spark, dir) => {
      val ord = t(spark, dir, "orders")
      // The 1-row range and the two ≤1024-row sketches are materialized:
      // every downstream subtree (bucket compare, both readouts, the
      // censuses) reuses them, so the data is scanned exactly 3× — once
      // for the range, once per INDEPENDENT histogram build (two real
      // builds are the point of the proof) — where the naive composition
      // re-derived the range in every 1-row cross and scanned orders 10×.
      val rng = Q.materialize(ord.agg(min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"), count(lit(1)).as("n")))
      val width = (col("mx") - col("mn")) / lit(1024.0)
      val bucket = least(floor((col("o_totalprice") - col("mn")) / width),
        lit(1023)).cast("long").as("bucket")
      val partials = Q.materialize(
        ord.select(col("o_orderstatus"), col("o_totalprice"))
          .crossJoin(broadcast(rng))
          .select(col("o_orderstatus"), bucket, col("n"))
          .groupBy(col("o_orderstatus"), col("bucket"), col("n"))
          .agg(count(lit(1)).as("c")))
      val merged = partials.groupBy(col("bucket"), col("n"))
        .agg(sum(col("c")).cast("long").as("c"))
      val direct = Q.materialize(
        ord.select(col("o_totalprice")).crossJoin(broadcast(rng))
          .select(bucket, col("n"))
          .groupBy(col("bucket"), col("n"))
          .agg(count(lit(1)).cast("long").as("c")))
      val bm = direct.select(col("bucket"), col("c").as("cd"))
        .join(merged.select(col("bucket"), col("c").as("cm")),
          Seq("bucket"), "full")
        .agg(expr("bool_and(coalesce(cd, -1) = coalesce(cm, -2))")
          .as("buckets_match"))
      // Same bounded cumulative readout as q_quantile_sketch (≤1024-row
      // global window; WARN suppressed at session build, bound locked by
      // PlanShapeSpec).
      def p90Of(h: org.apache.spark.sql.DataFrame, name: String) = h
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum") >= ceil(lit(0.9) * col("n")))
        .agg(min(col("bucket")).as("eb"))
        .crossJoin(broadcast(rng))
        .select(r2e(col("mn") + (col("eb") + 1) * width).as(name))
      // Census columns come off the checkpointed sketches, not the data.
      val np = partials.agg(countDistinct(col("o_orderstatus")).cast("long")
        .as("n_partials"))
      val nb = merged.agg(count(lit(1)).cast("long").as("n_buckets"))
      np.crossJoin(broadcast(nb))
        .crossJoin(broadcast(bm))
        .crossJoin(broadcast(p90Of(merged, "p90_merged")))
        .crossJoin(broadcast(p90Of(direct, "p90_direct")))
        .withColumn("est_match", col("p90_merged") === col("p90_direct"))
    })

  val fullOuterRecon = Q(
    "q_full_outer_recon",
    "Two-system reconciliation by FULL OUTER join — the audit pattern " +
      "(billing vs ledger, catalog vs store). Each system covers a " +
      "different deterministic shard of the key space (the roster holds " +
      "custkey % 3 != 0, the order feed holds custkey % 2 != 0 — " +
      "partial coverage is exactly the real-world condition that makes " +
      "reconciliation necessary), so all three categories are " +
      "populated: matched, customer-without-orders, orphan-orders — " +
      "with key counts and volumes per category. Both slice predicates " +
      "push to the parquet scans; one shuffle per side on the join key, " +
      "then a 3-row census.",
    Some("""
      WITH o AS (SELECT o_custkey, count(*) AS n_orders,
                        round(sum(o_totalprice) + 1e-6, 2) AS spent
                 FROM orders WHERE o_custkey % 2 <> 0 GROUP BY o_custkey),
           c AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0),
           j AS (SELECT CASE
                          WHEN o.o_custkey IS NULL THEN 'customer_no_orders'
                          WHEN c.c_custkey IS NULL THEN 'orphan_orders'
                          ELSE 'matched' END AS category,
                        coalesce(n_orders, 0) AS n_orders,
                        coalesce(spent, 0.0) AS spent
                 FROM c FULL OUTER JOIN o ON o.o_custkey = c.c_custkey)
      SELECT category, count(*) AS n_keys,
             sum(n_orders)::BIGINT AS total_orders,
             round(sum(spent) + 1e-6, 2) AS total_spent
      FROM j GROUP BY category""".stripMargin),
    (spark, dir) => {
      val o = t(spark, dir, "orders")
        .filter(col("o_custkey") % 2 =!= 0)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          r2e(sum(col("o_totalprice"))).as("spent"))
      val c = t(spark, dir, "customer").select(col("c_custkey"))
        .filter(col("c_custkey") % 3 =!= 0)
      c.join(o, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(
          when(col("o_custkey").isNull, "customer_no_orders")
            .when(col("c_custkey").isNull, "orphan_orders")
            .otherwise("matched").as("category"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("spent"), lit(0.0)).as("spent"))
        .groupBy(col("category"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("n_orders")).cast("long").as("total_orders"),
          r2e(sum(col("spent"))).as("total_spent"))
    })

  val all: Seq[Q] = Seq(rollup, windowFuncs, asof, scalarFuncs,
    approxDistinct, hllPortable, hllMerge, saltedWordcount, percentiles,
    corrStats, cube, pivot, unpivot, quantileSketch, quantileMerge,
    fullOuterRecon)
}
