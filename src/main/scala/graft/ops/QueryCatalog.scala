package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declared-inventory query catalog (SURVEY.md §2.D): every relational
  * operator the engine claims, each as a Spark DataFrame program paired with
  * a DuckDB oracle statement over the same parquet files.
  *
  * Determinism policy (the queries must HASH-match the oracle):
  *   - every query ends in a total-order ORDER BY;
  *   - money/quantity doubles are cast to DECIMAL(12,2) *before* any
  *     aggregation — decimal addition is exact and associative, so neither
  *     engine's accumulation order matters — and cast back to DOUBLE after;
  *   - averages = exact-decimal sum cast to double, divided by a count
  *     (one IEEE division, deterministic);
  *   - no libm-divergent functions (pow/exp/log) in hash-matched output;
  *   - array folds are explicit left folds on both engines (Spark
  *     `aggregate`, DuckDB `list_reduce`) → bitwise-equal doubles;
  *   - integer-typed outputs are cast so both engines agree (DuckDB
  *     year()/length()/row_number() are BIGINT, Spark's are INT).
  */
object QueryCatalog {
  type QFn = (SparkSession, String) => DataFrame
  final case class Entry(name: String, fn: QFn, oracle: Option[String])

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def t(s: SparkSession, dir: String, name: String): DataFrame = Tables(s, dir, name)
  private def asDouble(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------- scans --

  private val q01 = Entry("q01_scan_filter_project",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
        // TOTAL order over the projection: the synthetic fixture carries
        // duplicate (orderkey, linenumber) pairs, and a tied sort lets the
        // two engines order the tie differently (surfaced at sf1)
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice",
          "l_shipdate", "l_quantity")
        .limit(500)
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05
           |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_shipdate,
           |  l_quantity LIMIT 500""".stripMargin))

  // ----------------------------------------------------------- aggregates --

  private val q02 = Entry("q02_agg_pricing_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          asDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
          asDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          asDouble(sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))).as("sum_disc_price"),
          (asDouble(sum(dec(col("l_quantity")))) / count(col("l_quantity"))).as("avg_qty"),
          (asDouble(sum(dec(col("l_extendedprice")))) / count(col("l_extendedprice"))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  // ---------------------------------------------------------------- joins --

  private val q03 = Entry("q03_join_revenue_by_nation",
    (s, dir) => {
      // customer ⋈ orders ⋈ lineitem with broadcast dims nation/region:
      // the fact-fact joins shuffle on their keys; dims are broadcast so no
      // shuffle is added for them (at 100 TB the dims stay dim-sized).
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          asDouble(sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_items
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name
           |ORDER BY r_name, n_name""".stripMargin))

  private val q04 = Entry("q04_left_join_order_counts",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          asDouble(coalesce(sum(dec(col("o_totalprice"))), lit(0).cast(DecimalType(12, 2)))).as("total_spent"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
           |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |GROUP BY c_custkey, c_name
           |ORDER BY c_custkey""".stripMargin))

  private val q05 = Entry("q05_semi_join",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
           |FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
           |ORDER BY c_custkey""".stripMargin))

  private val q06 = Entry("q06_anti_join",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val ord97 = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1997)
      cust.join(ord97, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_acctbal
           |FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1997)
           |ORDER BY c_custkey""".stripMargin))

  // -------------------------------------------------------------- windows --

  private val q07 = Entry("q07_window_rank",
    (s, dir) => {
      val wTotal = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val wDate = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          row_number().over(wTotal).as("rn"),
          rank().over(wDate).as("rk"),
          dense_rank().over(wDate).as("drk"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
           |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS rn,
           |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS INT) AS rk,
           |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS INT) AS drk
           |FROM orders
           |ORDER BY o_custkey, rn""".stripMargin))

  private val q08 = Entry("q08_window_running_sum",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          asDouble(sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))).as("running_spent"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spent,
           |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           |  lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
           |FROM orders
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  // --------------------------------------------------------- sort / top-k --

  private val q09 = Entry("q09_topk_customers",
    (s, dir) => {
      // orderBy().limit() lowers to TakeOrderedAndProject: per-partition
      // top-k then a k-row merge on the driver — no global sort at scale.
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(asDouble(sum(dec(col("o_totalprice")))).as("total_spent"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spent").desc, col("o_custkey"))
        .limit(10)
    },
    Some("""SELECT o_custkey,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent,
           |  COUNT(*) AS n_orders
           |FROM orders GROUP BY o_custkey
           |ORDER BY total_spent DESC, o_custkey LIMIT 10""".stripMargin))

  // ------------------------------------------------- rollup / cube / sets --

  private val q10 = Entry("q10_rollup",
    (s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec(col("l_quantity")))).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("flag", "status")
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
           |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY flag, status""".stripMargin))

  private val q11 = Entry("q11_cube",
    (s, dir) => {
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec(col("o_totalprice")))).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    },
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS priority,
           |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
           |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
           |ORDER BY status, priority""".stripMargin))

  private val q12 = Entry("q12_set_ops",
    (s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
      cn.intersect(sn).withColumn("tag", lit("both"))
        .unionByName(cn.except(sn).withColumn("tag", lit("customer_only")))
        .unionByName(sn.except(cn).withColumn("tag", lit("supplier_only")))
        .orderBy("tag", "nk")
    },
    Some("""WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
           |     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
           |SELECT nk, 'both' AS tag FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
           |UNION ALL
           |SELECT nk, 'customer_only' AS tag FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
           |UNION ALL
           |SELECT nk, 'supplier_only' AS tag FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
           |ORDER BY tag, nk""".stripMargin))

  // ----------------------------------------------------- scalar functions --

  private val q13 = Entry("q13_string_functions",
    (s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowels"),
        trim(col("p_name")).as("name_trim"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, lower(p_name) AS name_lower, upper(p_brand) AS brand_upper,
           |  substring(p_type, 1, 5) AS type_prefix, CAST(length(p_name) AS INT) AS name_len,
           |  concat_ws('|', p_brand, p_type) AS brand_type,
           |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
           |  trim(p_name) AS name_trim
           |FROM part ORDER BY p_partkey""".stripMargin))

  private val q14 = Entry("q14_date_functions",
    (s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since_95"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
           |  CAST(dayofmonth(o_orderdate) AS INT) AS dom, CAST(quarter(o_orderdate) AS INT) AS qtr,
           |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  private val q15 = Entry("q15_json_extract",
    (s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
           |FROM events ORDER BY event_id""".stripMargin))

  private val q16 = Entry("q16_math_case",
    (s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice")).as("price_round"),
        abs(col("l_discount") - 0.05).as("disc_dist"),
        floor(col("l_quantity")).as("qty_floor"),
        ceil(col("l_quantity")).as("qty_ceil"),
        when(col("l_quantity") > 25, "big").otherwise("small").as("bucket"))
        // total order (duplicate (orderkey, linenumber) in the fixture —
        // same tie q01 documents): qty_ceil included so rows tying on the
        // first five keys (e.g. l_quantity 25.0 vs 25.5 with equal rounded
        // price) cannot differ in any projected column — bucket is then
        // determined by qty_floor/qty_ceil (ADVICE r14)
        .orderBy("l_orderkey", "l_linenumber", "price_round", "disc_dist",
          "qty_floor", "qty_ceil")
    },
    Some("""SELECT l_orderkey, l_linenumber,
           |  round(l_extendedprice) AS price_round,
           |  abs(l_discount - 0.05) AS disc_dist,
           |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           |  CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS bucket
           |FROM lineitem ORDER BY l_orderkey, l_linenumber, price_round,
           |  disc_dist, qty_floor, qty_ceil""".stripMargin))

  private val q17 = Entry("q17_count_distinct",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  private val q18 = Entry("q18_right_join",
    (s, dir) => {
      val ord97 = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1997)
      ord97.join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_1997_orders"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_1997_orders
           |FROM (SELECT * FROM orders WHERE year(o_orderdate) = 1997) o
           |RIGHT JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin))

  private val q19 = Entry("q19_full_outer_join",
    (s, dir) => {
      val ord = t(s, dir, "orders")
      def rev(yr: Int, alias: String) = ord.filter(year(col("o_orderdate")) === yr)
        .groupBy(col("o_custkey").as(s"${alias}_key"))
        .agg(asDouble(sum(dec(col("o_totalprice")))).as(s"rev_$alias"))
      rev(1995, "a").join(rev(1998, "b"), col("a_key") === col("b_key"), "full_outer")
        .select(coalesce(col("a_key"), col("b_key")).as("custkey"),
          coalesce(col("rev_a"), lit(0.0)).as("rev_1995"),
          coalesce(col("rev_b"), lit(0.0)).as("rev_1998"))
        .orderBy("custkey")
    },
    Some("""WITH a AS (SELECT o_custkey AS a_key,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev_a
           |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
           |b AS (SELECT o_custkey AS b_key,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev_b
           |  FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey)
           |SELECT COALESCE(a_key, b_key) AS custkey,
           |  COALESCE(rev_a, 0.0) AS rev_1995, COALESCE(rev_b, 0.0) AS rev_1998
           |FROM a FULL OUTER JOIN b ON a_key = b_key
           |ORDER BY custkey""".stripMargin))

  private val q20 = Entry("q20_cross_join",
    (s, dir) => {
      val statuses = t(s, dir, "orders").select(col("o_orderstatus").as("status")).distinct()
      t(s, dir, "region").select("r_name").crossJoin(statuses)
        .orderBy("r_name", "status")
    },
    Some("""SELECT r_name, status
           |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders)
           |ORDER BY r_name, status""".stripMargin))

  private val q21 = Entry("q21_grouping_sets",
    (s, dir) => {
      // explicit GROUPING SETS (rollup/cube's general form) — nulls from the
      // super-aggregate rows are COALESCEd before ORDER BY so row order is
      // engine-independent (Spark sorts nulls first, DuckDB last).
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec(col("l_quantity")))).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("flag", "status")
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
           |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
           |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
           |ORDER BY flag, status""".stripMargin))

  private val q22 = Entry("q22_asof_join",
    (s, dir) => {
      // Temporal alignment: each click joined to the user's latest purchase
      // at-or-before it ([[AsOfJoin]] union+window formulation — no range
      // theta join). Right side deduped per (user_id, ts) with a tie policy
      // the oracle shares, so ASOF semantics are engine-independent.
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"), col("value"))
      val w = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("purchase_id").desc)
      val rightDedup = purchases.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      AsOfJoin.backward(clicks, rightDedup, Seq("user_id"), "ts", "ts",
          payload = Seq("purchase_id", "value"))
        .select(col("event_id"), col("user_id"),
          col("r_purchase_id").as("purchase_id"),
          col("r_value").as("purchase_value"))
        .orderBy("event_id")
    },
    Some("""WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           |p AS (
           |  SELECT user_id, ts, event_id AS purchase_id, value
           |  FROM events WHERE event_type = 'purchase'
           |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
           |SELECT c.event_id, c.user_id, p.purchase_id, p.value AS purchase_value
           |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
           |ORDER BY c.event_id""".stripMargin))

  private val q23 = Entry("q23_median",
    (s, dir) => {
      // exact percentile (interpolating) — both engines use linear
      // interpolation at (n-1)*p; p=0.5 keeps the fraction fp-exact.
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          asDouble(min(col("l_quantity"))).as("min_qty"),
          asDouble(max(col("l_quantity"))).as("max_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
           |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  private val q24 = Entry("q24_window_range_frame",
    (s, dir) => {
      // RANGE frame (value-based, vs q08's ROWS frame): per customer, the
      // sum of order value in the 30 days up to and including each order —
      // ties in the order key all see the same frame, the property ROWS
      // frames don't have. Ordering key is integer day offsets so both
      // engines frame identically.
      val days = datediff(col("o_orderdate"), to_date(lit("1992-01-01")))
      val w = Window.partitionBy(col("o_custkey")).orderBy(days.as("d"))
        .rangeBetween(-30, 0)
      t(s, dir, "orders")
        .withColumn("trailing_30d",
          asDouble(sum(dec(col("o_totalprice"))).over(w)))
        .select(col("o_orderkey"), col("o_custkey"), col("trailing_30d"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
           |    PARTITION BY o_custkey
           |    ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate)
           |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  private val q25 = Entry("q25_pivot",
    (s, dir) => {
      // pivot with an explicit value list: static schema (no driver-side
      // distinct pre-scan), one column per l_linestatus — the oracle spells
      // the same reshape as conditional aggregation
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(asDouble(sum(dec(col("l_quantity")))))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f,
           |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  private val q26 = Entry("q26_scalar_subquery",
    (s, dir) => {
      // correlated scalar subquery through the SQL surface — Catalyst
      // decorrelates it into a left outer aggregate join (no per-row
      // re-execution); customers with no orders surface NULL
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c_custkey,
              |  (SELECT MAX(o_totalprice) FROM orders o
              |   WHERE o.o_custkey = c.c_custkey) AS max_order_price
              |FROM customer c
              |ORDER BY c_custkey""".stripMargin)
    },
    Some("""SELECT c_custkey,
           |  (SELECT MAX(o_totalprice) FROM orders o
           |   WHERE o.o_custkey = c.c_custkey) AS max_order_price
           |FROM customer c
           |ORDER BY c_custkey""".stripMargin))

  private val q27 = Entry("q27_set_ops_all",
    (s, dir) => {
      // multiset set ops (duplicate-preserving ALL variants, vs q12's
      // distinct forms), rolled up so the result is small and total-ordered
      val a = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderpriority").as("p"))
      val b = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_orderpriority").as("p"))
      a.intersectAll(b).groupBy("p").agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("intersect_all"))
        .unionByName(a.exceptAll(b).groupBy("p").agg(count(lit(1)).as("n"))
          .withColumn("tag", lit("except_all")))
        .orderBy("tag", "p")
    },
    Some("""WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'),
           |     b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O')
           |SELECT p, COUNT(*) AS n, 'intersect_all' AS tag
           |FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b) GROUP BY p
           |UNION ALL
           |SELECT p, COUNT(*) AS n, 'except_all' AS tag
           |FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b) GROUP BY p
           |ORDER BY tag, p""".stripMargin))

  /** Ordered catalog. Extended batch-by-batch as operators land. */
  // --------------------------------------------- classic TPC-H query shapes --

  private val q28 = Entry("q28_shipping_priority",
    (s, dir) => {
      // TPC-H Q3 shape: segment-filtered customers, unshipped-window orders,
      // revenue per order, top 10. Filters reach the scans (pushdown);
      // fact-fact joins shuffle on their keys; top-k lowers to
      // TakeOrderedAndProject.
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(asDouble(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_orderdate, o_orderpriority,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND o_orderdate < TIMESTAMP '1998-01-01'
           |  AND l_shipdate > TIMESTAMP '1998-01-01'
           |GROUP BY o_orderkey, o_orderdate, o_orderpriority
           |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin))

  private val q29 = Entry("q29_local_supplier_volume",
    (s, dir) => {
      // TPC-H Q5 shape: revenue from LOCAL supply chains (customer and
      // supplier share a nation) within one region — a 5-way join where
      // supplier/nation/region broadcast and the locality predicate rides
      // the supplier join condition.
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(asDouble(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= TIMESTAMP '1996-01-01'
           |  AND o_orderdate < TIMESTAMP '1998-01-01'
           |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin))

  private val q30 = Entry("q30_returned_items",
    (s, dir) => {
      // TPC-H Q10 shape: revenue lost to returns per customer, top 20 —
      // returnflag filter pushes to the lineitem scan before the joins.
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val nat = t(s, dir, "nation")
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(asDouble(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_returned"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_returned
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |JOIN nation ON c_nationkey = n_nationkey
           |WHERE l_returnflag = 'R'
           |  AND o_orderdate >= TIMESTAMP '1997-01-01'
           |  AND o_orderdate < TIMESTAMP '1998-01-01'
           |GROUP BY c_custkey, c_name, n_name
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin))

  private val q31 = Entry("q31_order_priority_late",
    (s, dir) => {
      // TPC-H Q4 shape: orders with at least one lineitem shipped >90 days
      // after the order date, counted by priority — an EXISTS lowered to a
      // left-semi join on the order key (asserted semi, not a re-scan).
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val late = ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      late.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
           |FROM orders o
           |WHERE EXISTS (
           |  SELECT 1 FROM lineitem l
           |  WHERE l.l_orderkey = o.o_orderkey
           |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  private val q32 = Entry("q32_asof_forward",
    (s, dir) => {
      // Forward temporal alignment: each click joined to the user's NEXT
      // purchase at-or-after it — the mirror of q22, same single-shuffle
      // union+window plan (no range theta join). DuckDB's ASOF supports the
      // forward inequality directly, so the oracle is symmetric.
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"), col("value"))
      val w = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("purchase_id"))
      val rightDedup = purchases.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      AsOfJoin.forward(clicks, rightDedup, Seq("user_id"), "ts", "ts",
          payload = Seq("purchase_id", "value"))
        .select(col("event_id"), col("user_id"),
          col("r_purchase_id").as("purchase_id"),
          col("r_value").as("purchase_value"))
        .orderBy("event_id")
    },
    Some("""WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           |p AS (
           |  SELECT user_id, ts, event_id AS purchase_id, value
           |  FROM events WHERE event_type = 'purchase'
           |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) = 1)
           |SELECT c.event_id, c.user_id, p.purchase_id, p.value AS purchase_value
           |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
           |ORDER BY c.event_id""".stripMargin))

  private val q33 = Entry("q33_skew_salted_join",
    (s, dir) => {
      // The salting operator as a catalog citizen: lineitem's 3-value
      // returnflag is the textbook giant-key distribution (every row lands
      // on one of 3 join keys). SkewJoin spreads each key over `salt`
      // buckets via a per-row round-robin while the tiny dim replicates —
      // results must equal the plain join, which is exactly what the oracle
      // checks.
      import s.implicits._
      val li = t(s, dir, "lineitem").select("l_returnflag", "l_quantity")
      val dim = Seq(("A", "accepted"), ("N", "neutral"), ("R", "returned"))
        .toDF("l_returnflag", "flag_name")
      SkewJoin.saltedInner(li, dim, Seq("l_returnflag"), salt = 8)
        .groupBy("flag_name")
        .agg(asDouble(sum(dec(col("l_quantity")))).as("total_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("flag_name")
    },
    Some("""WITH dim(l_returnflag, flag_name) AS (
           |  VALUES ('A', 'accepted'), ('N', 'neutral'), ('R', 'returned'))
           |SELECT flag_name,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
           |  COUNT(*) AS n_items
           |FROM lineitem JOIN dim USING (l_returnflag)
           |GROUP BY flag_name ORDER BY flag_name""".stripMargin))

  private val q34 = Entry("q34_window_value_family",
    (s, dir) => {
      // The remaining analytic-window family: first_value/last_value/
      // nth_value over a full frame plus ntile bucketing — all
      // pass-through values (no arithmetic), deterministic under the
      // total per-partition order.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        first(col("o_totalprice")).over(wf).as("first_price"),
        last(col("o_totalprice")).over(wf).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(wf).as("second_price"),
        ntile(4).over(w).as("quartile"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
           |  first_value(o_totalprice) OVER w_all AS first_price,
           |  last_value(o_totalprice) OVER w_all AS last_price,
           |  nth_value(o_totalprice, 2) OVER w_all AS second_price,
           |  CAST(ntile(4) OVER (PARTITION BY o_custkey
           |    ORDER BY o_orderdate, o_orderkey) AS INT) AS quartile
           |FROM orders
           |WINDOW w_all AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           |ORDER BY o_orderkey""".stripMargin))

  private val q35 = Entry("q35_sql_surface",
    (s, dir) => {
      // The SQL-text surface end to end: the engine's native expressions
      // registered through GraftRuntime (same registrations as the
      // SparkSessionExtensions path), fixture registered as a view, and the
      // query is a plain SQL string — consecutive same-source documents
      // scored with the codegen'd jaccard_sim.
      graft.extensions.GraftRuntime.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql("""WITH nxt AS (
              |  SELECT doc_id, source, text,
              |    LEAD(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS next_id,
              |    LEAD(text) OVER (PARTITION BY source ORDER BY doc_id) AS next_text
              |  FROM documents_v)
              |SELECT doc_id AS id_a, next_id AS id_b,
              |  jaccard_sim(split(trim(text), '\\s+'),
              |              split(trim(next_text), '\\s+')) AS sim
              |FROM nxt WHERE next_id IS NOT NULL
              |ORDER BY id_a""".stripMargin)
    },
    Some("""WITH t AS (
           |  SELECT doc_id, source,
           |    list_distinct(regexp_split_to_array(trim(text), '\s+')) AS sh,
           |    LEAD(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS next_id,
           |    LEAD(list_distinct(regexp_split_to_array(trim(text), '\s+')))
           |      OVER (PARTITION BY source ORDER BY doc_id) AS next_sh
           |  FROM documents)
           |SELECT doc_id AS id_a, next_id AS id_b,
           |  CAST(len(list_intersect(sh, next_sh)) AS DOUBLE)
           |    / len(list_distinct(list_concat(sh, next_sh))) AS sim
           |FROM t WHERE next_id IS NOT NULL
           |ORDER BY id_a""".stripMargin))

  private val q36 = Entry("q36_forecast_revenue",
    (s, dir) => {
      // TPC-H Q6 shape: pure scan-side predicates (date window, discount
      // band, quantity cap) into one global aggregate — everything pushes to
      // the parquet scan, partial-combines map-side, one row out.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(asDouble(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))))
          .as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           |  AND l_shipdate < TIMESTAMP '1998-01-01'
           |  AND l_discount BETWEEN 0.05 AND 0.07
           |  AND l_quantity < 24""".stripMargin))

  private val q37 = Entry("q37_customer_distribution",
    (s, dir) => {
      // TPC-H Q13 shape: two stacked aggregations — orders per customer
      // (left join keeps zero-order customers), then the histogram of those
      // counts. The second groupBy reuses nothing from the first's
      // partitioning; both partial-combine.
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, COUNT(*) AS custdist
           |FROM (
           |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
           |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |  GROUP BY c_custkey)
           |GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  private val q38 = Entry("q38_promo_revenue_share",
    (s, dir) => {
      // TPC-H Q14 shape: conditional aggregate ratio — the PROMO share of
      // one month's revenue. Both sums route through decimal; the final
      // percentage is one double multiply + divide, identical on both
      // engines.
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      val part = t(s, dir, "part")
      val discPrice = dec(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount")))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) *
            asDouble(sum(when(col("p_type") === "PROMO", discPrice)
              .otherwise(lit(0).cast(DecimalType(12, 2))))) /
            asDouble(sum(discPrice))).as("promo_share_pct"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT
           |  CAST(100 AS DOUBLE) *
           |    CAST(SUM(CASE WHEN p_type = 'PROMO'
           |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
           |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           |    AS promo_share_pct,
           |  COUNT(*) AS n_items
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
           |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin))

  private val q39 = Entry("q39_disjunctive_predicates",
    (s, dir) => {
      // TPC-H Q19 shape: disjunctive multi-column predicate blocks riding
      // the join condition — each OR arm pairs a brand with its own size and
      // quantity band; Catalyst distributes the common partkey equality so
      // the join stays an equi-join with the disjunction as a post filter.
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 30) &&
          col("l_quantity").between(20, 30))))
        .agg(asDouble(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)""".stripMargin))

  private val q40 = Entry("q40_large_orders",
    (s, dir) => {
      // TPC-H Q18 shape: orders whose total quantity exceeds a threshold —
      // an aggregate-then-join (the HAVING side reduces lineitem before the
      // 3-way join touches it), top 20 by order value.
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(asDouble(sum(dec(col("l_quantity")))).as("total_qty"))
        .filter(col("total_qty") > 250)
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""WITH big AS (
           |  SELECT l_orderkey,
           |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
           |  FROM lineitem GROUP BY l_orderkey
           |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 250)
           |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN big ON o_orderkey = l_orderkey
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin))

  private val q41 = Entry("q41_dormant_rich_customers",
    (s, dir) => {
      // TPC-H Q22 shape: above-average-balance customers with no RECENT
      // orders — a scalar aggregate (broadcast, not collected) feeding a
      // filter, then an anti join on the date-windowed orders, rolled up
      // per nation. The average routes through decimal so both engines
      // agree on the exact threshold.
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((asDouble(sum(dec(col("c_acctbal")))) / count(lit(1))).as("__avg"))
      val recent = ord.filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__avg"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"),
          asDouble(sum(dec(col("c_acctbal")))).as("total_bal"))
        .orderBy("c_nationkey")
    },
    Some("""WITH a AS (
           |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
           |  FROM customer WHERE c_acctbal > 0)
           |SELECT c_nationkey, COUNT(*) AS n_customers,
           |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
           |FROM customer, a
           |WHERE c_acctbal > a.avg_bal
           |  AND NOT EXISTS (SELECT 1 FROM orders
           |    WHERE o_custkey = c_custkey
           |      AND o_orderdate >= TIMESTAMP '1999-01-01')
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  private val q42 = Entry("q42_small_quantity_revenue",
    (s, dir) => {
      // TPC-H Q17 shape: correlated `l_quantity < 0.2 * avg(quantity for
      // this part)` — written in its decorrelated 100 TB form: the brand
      // dim semi-joins the fact FIRST (the correlated subquery only ever
      // evaluates at brand partkeys, so the pre-aggregate shuffles the
      // brand's ~1/1000 slice, not all of lineitem), then ONE
      // partial-combining per-part average joins back. The threshold
      // compare is exact cross-engine: integer sum / count in doubles is
      // deterministic IEEE on both sides.
      val li = t(s, dir, "lineitem")
      val brandParts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#11").select("p_partkey")
      val liBrand = li.join(broadcast(brandParts),
        col("l_partkey") === col("p_partkey"), "left_semi")
      val qtyCap = liBrand.groupBy("l_partkey")
        .agg((avg(col("l_quantity")) * 0.2).as("qty_cap"))
      liBrand.join(qtyCap, Seq("l_partkey"))
        .filter(col("l_quantity") < col("qty_cap"))
        .agg(asDouble(sum(dec(col("l_extendedprice"))) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0 AS DOUBLE) AS avg_yearly,
           |  COUNT(*) AS n_lines
           |FROM lineitem l
           |JOIN part p ON p.p_partkey = l.l_partkey
           |WHERE p.p_brand = 'Brand#11'
           |  AND l.l_quantity < (
           |    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
           |    WHERE l2.l_partkey = p.p_partkey)""".stripMargin))

  private val q43 = Entry("q43_priority_shipping_classes",
    (s, dir) => {
      // TPC-H Q12 shape (no shipmode column in the fixture — returnflag
      // plays the class axis): conditional aggregation, two SUM(CASE …)
      // branches in one pass over the fact join; late-shipped lines only.
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE l_shipdate > o_orderdate
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  private val q44 = Entry("q44_sole_blame_suppliers",
    (s, dir) => {
      // TPC-H Q21 shape: suppliers with a returned line on a multi-supplier
      // order where NO other supplier on that order had returns — the
      // "sole blame" pattern. The EXISTS + NOT EXISTS pair decorrelates
      // into ONE per-order aggregate (distinct-supplier and
      // distinct-returning-supplier counts) joined back on the order key:
      // `n_supps > 1` is the EXISTS, `n_ret_supps = 1` is the NOT EXISTS
      // (the probing supplier is itself the one returner). One shuffle by
      // order key instead of two dedup shuffles + two theta-joins — the
      // form that survives a 100× fact table.
      // One shuffle to (order, supplier) pairs; everything downstream —
      // the per-order counts AND the returned-pair probe side — reuses
      // that aggregate (no double count_distinct Expand, no re-scan).
      val li = t(s, dir, "lineitem")
      val pairs = li.groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_ret"))
      val orderStats = pairs.groupBy("l_orderkey").agg(
        count(lit(1)).as("n_supps"),
        sum(col("has_ret")).as("n_ret_supps"))
      pairs.filter(col("has_ret") === 1)
        .join(orderStats, Seq("l_orderkey"))
        .filter(col("n_supps") > 1 && col("n_ret_supps") === 1)
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(10)
    },
    Some("""SELECT s_name, COUNT(*) AS numwait
           |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
           |      WHERE l_returnflag = 'R') r
           |JOIN supplier ON s_suppkey = r.l_suppkey
           |WHERE EXISTS (
           |    SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey
           |                   FROM lineitem) o
           |    WHERE o.l_orderkey = r.l_orderkey
           |      AND o.l_suppkey <> r.l_suppkey)
           |  AND NOT EXISTS (
           |    SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey
           |                   FROM lineitem WHERE l_returnflag = 'R') o2
           |    WHERE o2.l_orderkey = r.l_orderkey
           |      AND o2.l_suppkey <> r.l_suppkey)
           |GROUP BY s_name
           |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin))

  private val q45 = Entry("q45_top_supplier_revenue",
    (s, dir) => {
      // TPC-H Q15 shape: a revenue "view" (one aggregate over a quarter of
      // lineitem), then the max-revenue supplier via a broadcast scalar —
      // revenue computed in DECIMAL so the max-equality filter is exact on
      // both engines.
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))
          .as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.crossJoin(broadcast(maxRev))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          asDouble(col("total_revenue")).as("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH revenue AS (
           |  SELECT l_suppkey,
           |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
           |        (1.0 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           |    AND l_shipdate < TIMESTAMP '1997-04-01'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
           |FROM revenue JOIN supplier ON s_suppkey = l_suppkey
           |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
           |ORDER BY s_suppkey""".stripMargin))

  private val q46 = Entry("q46_volume_shipping",
    (s, dir) => {
      // TPC-H Q7 shape: bilateral cross-border trade volume by shipment
      // year, restricted to intra-EUROPE pairs (a single nation pair is
      // empty at the smallest fixture — the regional matrix keeps the
      // query scale-robust). Nation and region dims broadcast against the
      // customer⋈orders⋈lineitem⋈supplier fact spine; the pair predicate
      // rides the broadcast join output.
      val li = t(s, dir, "lineitem")
      val eurNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")
          .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      val n1 = eurNations.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val n2 = eurNations.select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      li.join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(asDouble(sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount")))))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |  CAST(year(l_shipdate) AS INT) AS l_year,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
           |           (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
           |JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
           |WHERE r1.r_name = 'EUROPE' AND r2.r_name = 'EUROPE'
           |  AND n1.n_name <> n2.n_name
           |GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
           |ORDER BY supp_nation, cust_nation, l_year""".stripMargin))

  private val q47 = Entry("q47_market_share",
    (s, dir) => {
      // TPC-H Q8 shape: NATION_1 suppliers' share of STANDARD-part revenue
      // sold to EUROPE customers, by order year. The share is a conditional
      // aggregate over ONE pass of the fact join (no second scan); both
      // sums stay decimal-exact until the final double division, which is
      // deterministic IEEE on both engines.
      val li = t(s, dir, "lineitem")
      val stdParts = t(s, dir, "part").filter(col("p_type") === "STANDARD")
        .select("p_partkey")
      val rev = dec(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount")))
      val nations = t(s, dir, "nation")
      val europe = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      li.join(broadcast(stdParts), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nations.select(col("n_nationkey").as("c_nk"),
          col("n_regionkey").as("c_rk"))), col("c_nationkey") === col("c_nk"))
        .join(broadcast(europe.select("r_regionkey")),
          col("c_rk") === col("r_regionkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nations.select(col("n_nationkey").as("s_nk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          (asDouble(sum(when(col("supp_nation") === "NATION_1", rev)
            .otherwise(lit(0).cast(DecimalType(12, 2))))) /
            asDouble(sum(rev))).as("mkt_share"),
          count(lit(1)).as("n_lines"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
           |        THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
           |             (1 - CAST(l_discount AS DECIMAL(12,2)))
           |        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
           |           (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           |    AS mkt_share,
           |  COUNT(*) AS n_lines
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n1 ON c_nationkey = n1.n_nationkey
           |JOIN region ON n1.n_regionkey = r_regionkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation n2 ON s_nationkey = n2.n_nationkey
           |WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
           |GROUP BY CAST(year(o_orderdate) AS INT)
           |ORDER BY o_year""".stripMargin))

  private val q48 = Entry("q48_product_type_profit",
    (s, dir) => {
      // TPC-H Q9 shape (profit by supplier nation and order year, for
      // name-matched parts). The part predicate semi-joins the fact FIRST
      // (the q42 lesson applied from the start: the ~1/8 'red' slice is
      // what shuffles through the joins, never all of lineitem); revenue
      // stays decimal-exact until the final double cast.
      val li = t(s, dir, "lineitem")
      val redParts = t(s, dir, "part")
        .filter(col("p_name").contains("red")).select("p_partkey")
      val rev = dec(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount")))
      li.join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(asDouble(sum(rev)).as("sum_profit"), count(lit(1)).as("n_lines"))
        .orderBy("nation", "o_year")
    },
    Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
           |           (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_profit,
           |  COUNT(*) AS n_lines
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE contains(p_name, 'red'))
           |GROUP BY n_name, CAST(year(o_orderdate) AS INT)
           |ORDER BY nation, o_year""".stripMargin))

  private val q49 = Entry("q49_top_supplier_per_brand",
    (s, dir) => {
      // TPC-H Q2 shape: a correlated max subquery (the best supplier per
      // brand) decorrelated to ONE per-(brand,supplier) aggregate plus a
      // per-brand max joined back — no per-row re-execution, the form
      // that survives a 100× fact table. Revenue comparisons are exact
      // (decimal = decimal); ties collapse deterministically by min
      // suppkey.
      val li = t(s, dir, "lineitem")
      val parts = t(s, dir, "part").select("p_partkey", "p_brand")
      val rev = dec(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount")))
      val perPair = li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "l_suppkey").agg(sum(rev).as("brand_rev"))
      val best = perPair.groupBy("p_brand").agg(max(col("brand_rev")).as("best_rev"))
      perPair.join(best, Seq("p_brand"))
        .filter(col("brand_rev") === col("best_rev"))
        .groupBy(col("p_brand").as("brand"))
        .agg(min(col("l_suppkey")).as("best_suppkey"),
          asDouble(max(col("best_rev"))).as("best_rev"))
        .orderBy("brand")
    },
    Some("""WITH pp AS (
           |  SELECT p_brand, l_suppkey,
           |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
           |        (1 - CAST(l_discount AS DECIMAL(12,2)))) AS brand_rev
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  GROUP BY p_brand, l_suppkey),
           |b AS (SELECT p_brand, MAX(brand_rev) AS best_rev FROM pp GROUP BY p_brand)
           |SELECT pp.p_brand AS brand, MIN(pp.l_suppkey) AS best_suppkey,
           |  CAST(MAX(b.best_rev) AS DOUBLE) AS best_rev
           |FROM pp JOIN b ON pp.p_brand = b.p_brand AND pp.brand_rev = b.best_rev
           |GROUP BY pp.p_brand ORDER BY brand""".stripMargin))

  private val q50 = Entry("q50_surplus_suppliers",
    (s, dir) => {
      // TPC-H Q20 shape: the nested semi-join chain — suppliers who moved
      // more than an eighth of a 'red' part's total volume. Both
      // aggregates run over the SAME semi-join-reduced slice; quantities
      // sum as decimals and the 0.125 threshold is a power-of-2 multiply,
      // so the comparison is exact cross-engine.
      val li = t(s, dir, "lineitem")
      val redParts = t(s, dir, "part")
        .filter(col("p_name").contains("red")).select("p_partkey")
      val red = li.join(broadcast(redParts),
        col("l_partkey") === col("p_partkey"), "left_semi")
      val perPair = red.groupBy("l_partkey", "l_suppkey")
        .agg(asDouble(sum(dec(col("l_quantity")))).as("pair_qty"))
      val perPart = red.groupBy("l_partkey")
        .agg((asDouble(sum(dec(col("l_quantity")))) * 0.125).as("qty_bar"))
      val qualified = perPair.join(perPart, Seq("l_partkey"))
        .filter(col("pair_qty") > col("qty_bar"))
        .select("l_suppkey").distinct()
      t(s, dir, "supplier")
        .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name").orderBy("s_suppkey")
    },
    Some("""WITH red AS (
           |  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
           |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE contains(p_name, 'red'))),
           |pp AS (SELECT l_partkey, l_suppkey,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS pair_qty
           |  FROM red GROUP BY 1, 2),
           |pt AS (SELECT l_partkey,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * 0.125 AS qty_bar
           |  FROM red GROUP BY 1)
           |SELECT s_suppkey, s_name FROM supplier
           |WHERE s_suppkey IN (
           |  SELECT pp.l_suppkey FROM pp JOIN pt ON pp.l_partkey = pt.l_partkey
           |  WHERE pp.pair_qty > pt.qty_bar)
           |ORDER BY s_suppkey""".stripMargin))

  private val q51 = Entry("q51_important_parts",
    (s, dir) => {
      // TPC-H Q11 shape: per-part value with a HAVING over a GLOBAL
      // threshold (here 1.5× the average part value — scale-invariant,
      // where Q11's fixed fraction only selects rows at one SF). The
      // global scalar is a 1-row broadcast crossJoin — the threshold
      // never re-scans the fact and nothing collects to the driver. Sums
      // stay decimal; the final multiply/divide is double, written in
      // the SAME operation order as the oracle (deterministic IEEE).
      val li = t(s, dir, "lineitem")
      val perPart = li.groupBy("l_partkey")
        .agg(sum(dec(col("l_extendedprice"))).as("value"))
      val threshold = perPart.agg(
        (asDouble(sum(col("value"))) * 1.5 / count(lit(1))).as("__bar"))
      perPart.crossJoin(broadcast(threshold))
        .filter(asDouble(col("value")) > col("__bar"))
        .select(col("l_partkey"), asDouble(col("value")).as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },
    Some("""WITH pv AS (
           |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value
           |  FROM lineitem GROUP BY l_partkey)
           |SELECT l_partkey, CAST(value AS DOUBLE) AS part_value
           |FROM pv, (SELECT CAST(SUM(value) AS DOUBLE) * 1.5 / COUNT(*) AS bar FROM pv) t
           |WHERE CAST(value AS DOUBLE) > t.bar
           |ORDER BY part_value DESC, l_partkey""".stripMargin))

  private val q52 = Entry("q52_supplier_diversity",
    (s, dir) => {
      // TPC-H Q16 shape — the last of the 22. How many DISTINCT suppliers
      // can deliver each qualifying (brand, type, size)? The fixtures have
      // no partsupp table, so the part-supplier relation is the distinct
      // (l_partkey, l_suppkey) pairs observed in lineitem; Q16's
      // "customer complaints" exclusion becomes the negative-balance
      // suppliers (no s_comment column). Scale posture: the part
      // predicate reduces lineitem FIRST (broadcast inner join on the
      // filtered dimension), so the pair-distinct shuffle carries only
      // the qualifying slice; the excluded-supplier set is a broadcast
      // anti-join (6 rows at sf0.01 — never a shuffle).
      val qualParts = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#21" && col("p_type") =!= "ECONOMY" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val complainers = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(qualParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(complainers), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE p_brand <> 'Brand#21' AND p_type <> 'ECONOMY'
           |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
           |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
           |GROUP BY p_brand, p_type, p_size
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  private val q53 = Entry("q53_gap_fill_daily",
    (s, dir) => {
      // Time-series gap filling: a calendar spine built with sequence()
      // + explode (generated distributively — no driver loop, no
      // collect) cross-joined with the small priority dim, left-joined
      // by the observed daily revenue; missing (day, priority) cells
      // surface as explicit zeros. At 100 TB the spine is tiny (days ×
      // priorities) and broadcasts onto the aggregated daily stream —
      // the fact table is touched once, by the aggregate.
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val daily = ord
        .groupBy(to_date(col("o_orderdate")).as("day"),
          col("o_orderpriority").as("priority"))
        .agg(asDouble(sum(dec(col("o_totalprice")))).as("revenue"),
          count(lit(1)).as("n_orders"))
      val spine = s.range(1).select(explode(sequence(
          lit("1997-01-01").cast("date"), lit("1997-03-31").cast("date"),
          expr("interval 1 day"))).as("day"))
        .crossJoin(ord.select(col("o_orderpriority").as("priority")).distinct())
      spine.join(daily, Seq("day", "priority"), "left")
        .select(col("day").cast("timestamp").as("day"), col("priority"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("day", "priority")
    },
    Some("""WITH w AS (
           |  SELECT * FROM orders
           |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           |    AND o_orderdate < TIMESTAMP '1997-04-01'),
           |spine AS (
           |  SELECT CAST(unnest(generate_series(DATE '1997-01-01',
           |    DATE '1997-03-31', INTERVAL 1 DAY)) AS TIMESTAMP) AS day),
           |prios AS (SELECT DISTINCT o_orderpriority AS priority FROM w),
           |daily AS (
           |  SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
           |    o_orderpriority AS priority,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           |    COUNT(*) AS n_orders
           |  FROM w GROUP BY 1, 2)
           |SELECT s.day AS day, p.priority AS priority,
           |  COALESCE(d.revenue, 0.0) AS revenue,
           |  COALESCE(d.n_orders, 0) AS n_orders
           |FROM spine s CROSS JOIN prios p
           |LEFT JOIN daily d ON d.day = s.day AND d.priority = p.priority
           |ORDER BY s.day, p.priority""".stripMargin))

  private val q54 = Entry("q54_window_distribution",
    (s, dir) => {
      // The distribution window family: percent_rank and cume_dist over
      // account balance within each market segment. Both are single
      // integer-ratio divisions over window counts — exact IEEE on any
      // engine, safe to hash-match without rounding. rank() pins the
      // tie policy explicitly.
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        rank().over(w).cast("long").as("bal_rank"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
           |  rank() OVER w AS bal_rank,
           |  percent_rank() OVER w AS pct_rank,
           |  cume_dist() OVER w AS cume
           |FROM customer
           |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
           |ORDER BY c_custkey""".stripMargin))

  private val q55 = Entry("q55_banded_range_join",
    (s, dir) => {
      // Range-condition join through RangeJoin.banded: customers matched
      // to balance tiers by c_acctbal BETWEEN lo AND hi. Bucketized into
      // an equi-join + residual filter — no BroadcastNestedLoopJoin, no
      // cartesian product (PlanSpec asserts), which is what survives when
      // BOTH sides are large. Tier bounds are exact binary doubles.
      val tiers = s.range(0, 12).select(col("id").as("tier_id"),
        (lit(-2000.0) + col("id") * lit(1000.0)).as("lo"),
        (lit(-2000.0) + col("id") * lit(1000.0) + lit(999.0)).as("hi"))
      RangeJoin.banded(t(s, dir, "customer"), "c_acctbal", tiers,
          "lo", "hi", bucketWidth = 250.0)
        .groupBy("tier_id", "lo", "hi")
        .agg(count(lit(1)).as("n_customers"),
          asDouble(sum(dec(col("c_acctbal")))).as("total_bal"))
        .orderBy("tier_id")
    },
    Some("""WITH tiers AS (
           |  SELECT i AS tier_id, -2000.0 + 1000.0 * i AS lo,
           |    -2000.0 + 1000.0 * i + 999.0 AS hi
           |  FROM range(0, 12) t(i))
           |SELECT tier_id, lo, hi, COUNT(*) AS n_customers,
           |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
           |FROM customer JOIN tiers ON c_acctbal BETWEEN lo AND hi
           |GROUP BY tier_id, lo, hi ORDER BY tier_id""".stripMargin))

  private val q56 = Entry("q56_dynamic_partition_pruning",
    (s, dir) => {
      // Dynamic partition pruning: the fact is STORED partitioned by
      // priority and the filter arrives through a JOIN (the qualifying
      // priorities are derived from the data — not a literal the
      // optimizer could fold), so the prune must happen at runtime. DPP
      // plants a dynamicpruning subquery in the fact scan's
      // PartitionFilters (PlanSpec asserts) — at 100 TB the difference
      // between reading 2/5ths of the table and all of it.
      val ord = t(s, dir, "orders")
      val tmp = System.getProperty("java.io.tmpdir") +
        "/graft_dpp_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      // Always overwrite: a cached copy keyed only on the dir path would
      // silently serve stale data if the fixture is regenerated in place.
      ord.write.mode("overwrite").partitionBy("o_orderpriority").parquet(tmp)
      val fact = s.read.parquet(tmp)
      val dim = ord.select(col("o_orderpriority").as("prio")).distinct()
        .filter(substring(col("prio"), 1, 1).isin("1", "2"))
      fact.join(dim, fact("o_orderpriority") === dim("prio"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          asDouble(sum(dec(col("o_totalprice")))).as("total_price"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
           |FROM orders
           |WHERE substring(o_orderpriority, 1, 1) IN ('1', '2')
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  private val q57 = Entry("q57_cdc_upsert_view",
    (s, dir) => {
      // Merge-on-read CDC: a base snapshot plus a changelog of updates
      // and deletes, resolved to the latest-row-wins view by ONE window
      // over (key, version DESC) — the lakehouse upsert pattern
      // (Hudi/Delta merge-on-read) without rewriting the base. The
      // changelog is derived deterministically: every 7th customer gets
      // a balance update (v2), every 21st a delete tombstone (v3).
      // At 100 TB the window shuffle carries base + delta keyed on the
      // primary key — linear, no full rewrite.
      val base = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          lit(1L).as("__v"), lit(false).as("__deleted"))
      val updates = t(s, dir, "customer")
        .filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          (col("c_acctbal") + 1000.0).as("c_acctbal"),
          lit(2L).as("__v"), lit(false).as("__deleted"))
      val deletes = t(s, dir, "customer")
        .filter(col("c_custkey") % 21 === 0)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          lit(3L).as("__v"), lit(true).as("__deleted"))
      val w = Window.partitionBy("c_custkey").orderBy(col("__v").desc)
      base.unionByName(updates).unionByName(deletes)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && !col("__deleted"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          asDouble(sum(dec(col("c_acctbal")))).as("total_bal"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_customers,
           |  CAST(SUM(CAST(CASE WHEN c_custkey % 7 = 0
           |    THEN c_acctbal + 1000.0 ELSE c_acctbal END
           |    AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
           |FROM customer WHERE c_custkey % 21 <> 0
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  private val q58 = Entry("q58_bucketed_join",
    (s, dir) => {
      // Bucket-bucket co-located join: both tables stored bucketBy the
      // join key with the same bucket count, so the SortMergeJoin reads
      // each bucket pair directly — NO Exchange on either join key
      // (PlanSpec asserts). At 100 TB this is the standing answer to the
      // repeated fact⋈fact shuffle: pay the partitioning once at write
      // time, never again per query. The merge hint pins SMJ so the
      // demonstration doesn't degenerate to a broadcast at fixture scale.
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_buck_" + tag
      t(s, dir, "orders").write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", tmp + "/orders").saveAsTable(s"ord_bucketed_$tag")
      t(s, dir, "customer").write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", tmp + "/customer").saveAsTable(s"cust_bucketed_$tag")
      s.table(s"ord_bucketed_$tag").hint("merge")
        .join(s.table(s"cust_bucketed_$tag"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          asDouble(sum(dec(col("o_totalprice")))).as("total_price"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  private val q59 = Entry("q59_unpivot",
    (s, dir) => {
      // UNPIVOT/melt — the inverse of q25's pivot and the missing half of
      // the reshape pair: wide per-year revenue columns back to long
      // (flag, year, revenue) rows. Spark's native unpivot is a
      // zero-shuffle Expand (each input row fans to one row per value
      // column) — no join, no window.
      val li = t(s, dir, "lineitem")
      val pv = li.withColumn("yr", year(col("l_shipdate")))
        .filter(col("yr").isin(1996, 1997))
        .groupBy("l_returnflag").pivot("yr", Seq(1996, 1997))
        .agg(asDouble(sum(dec(col("l_extendedprice")))))
      // drop null cells after the unpivot: Spark keeps them, DuckDB's
      // UNPIVOT drops them — filtering pins the SAME null policy on both
      // engines instead of relying on every (flag, year) cell being
      // populated in the fixture (no-op when all cells are, as here)
      pv.unpivot(Array(col("l_returnflag")),
          Array(col("1996"), col("1997")), "yr", "revenue")
        .filter(col("revenue").isNotNull)
        .orderBy("l_returnflag", "yr")
    },
    Some("""SELECT l_returnflag, CAST(year(l_shipdate) AS VARCHAR) AS yr,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
           |FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  private val q60 = Entry("q60_lateral_join",
    (s, dir) => {
      // Correlated LATERAL subquery in the FROM clause — the per-row
      // derived table SQL shape (top-2 customers per nation by balance).
      // Catalyst DECORRELATES the correlated ORDER BY+LIMIT into a
      // partitioned window top-k + equi-join — never a per-outer-row
      // re-execution, which is what makes the shape survive a big outer
      // side. Ties pinned by (acctbal DESC, name).
      t(s, dir, "nation").createOrReplaceTempView("nation_q60")
      t(s, dir, "customer").createOrReplaceTempView("customer_q60")
      s.sql("""SELECT n.n_name AS nation, c.c_name AS customer,
              |       c.c_acctbal AS acctbal
              |FROM nation_q60 n,
              |LATERAL (
              |  SELECT c_name, c_acctbal FROM customer_q60
              |  WHERE c_nationkey = n.n_nationkey
              |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
              |ORDER BY nation, acctbal DESC, customer""".stripMargin)
    },
    Some("""SELECT n.n_name AS nation, c.c_name AS customer,
           |       c.c_acctbal AS acctbal
           |FROM nation n,
           |LATERAL (
           |  SELECT c_name, c_acctbal FROM customer
           |  WHERE c_nationkey = n.n_nationkey
           |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
           |ORDER BY nation, acctbal DESC, customer""".stripMargin))

  val entries: Seq[Entry] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37, q38, q39,
    q40, q41, q42, q43, q44, q45, q46, q47, q48, q49, q50, q51, q52, q53, q54,
    q55, q56, q57, q58, q59, q60)
}
