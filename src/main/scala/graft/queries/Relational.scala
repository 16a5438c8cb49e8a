package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Core relational operators over the driver's TPC-H-ish tables.
  *
  * Each entry demonstrates one SURVEY.md §2 operator family executed
  * Spark-first (hash agg with map-side combine, broadcast joins for
  * dims, window functions, semi/anti joins, set ops). The oracle SQL
  * in [[Relational.oracle]] is the DuckDB-equivalent statement.
  *
  * Scale notes (100 TB design intent):
  *  - dimension joins (nation/region/customer) are `broadcast()` —
  *    no shuffle of the fact table;
  *  - aggregations are partial (Spark's hash agg does map-side
  *    combine automatically since these are all algebraic aggs);
  *  - filters are pushed to the parquet scan (verified via
  *    `.explain` — see BenchReport).
  */
object Relational {

  // Exact, order-independent money math: aggregate DECIMAL, emit DOUBLE.
  private def dec(c: String) = col(c).cast("decimal(20,2)")

  /** TPC-H Q1 flavor: big scan + hash aggregation on lineitem.
    * ref: dlx has only count/max aggs (SURVEY §2.5) — this is the
    * general groupBy/agg operator the engine provides. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .where(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1.0).cast("decimal(20,2)") - dec("l_discount"))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Filter + projection; predicate/column pushdown to parquet scan. */
  def q2Filter(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (dec("l_extendedprice") * dec("l_discount")).cast("double").as("disc_revenue"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Broadcast dim join chain + agg (TPC-H Q5 flavor): revenue per nation. */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val l = lineitem(s, dir)
    val o = orders(s, dir)
    val c = customer(s, dir)
    val n = broadcast(nation(s, dir))
    val r = broadcast(region(s, dir))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(sum(dec("l_extendedprice") * (lit(1.0).cast("decimal(20,2)") - dec("l_discount"))).cast("double").as("revenue"))
      .orderBy("n_name")
  }

  /** TPC-H Q5 proper (vs q3's simpler star): local-supplier revenue —
    * the 6-way star join with the c_nationkey = s_nationkey
    * correlation and a one-year date window. The date predicate is a
    * direct o_orderdate comparison so it pushes into the parquet scan
    * (plan-asserted); all three dimension legs broadcast; the only
    * shuffles are the two fact-fact joins and the final aggregate. */
  def q160LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = lineitem(s, dir)
    val o = orders(s, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
    val c = customer(s, dir)
    val sup = broadcast(supplier(s, dir))
    val n = broadcast(nation(s, dir))
    val r = broadcast(region(s, dir))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "EUROPE")
      .groupBy("n_name")
      .agg(sum(dec("l_extendedprice") * (lit(1.0).cast("decimal(20,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy("n_name")
  }

  /** Window function: latest order per customer (row_number desc). */
  def q4WindowLatest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .orderBy("o_custkey")
  }

  /** Top-k: 10 highest-value customers by summed order totalprice. */
  def q5TopK(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy("o_custkey")
      .agg(sum(dec("o_totalprice")).cast("double").as("total_spent"),
        count(lit(1)).as("order_count"))
      .orderBy(col("total_spent").desc, col("o_custkey"))
      .limit(10)

  /** Anti join: customers with no 2001 orders (dlx `in_use`/orphan
    * check analog, SURVEY §2.4 reverse-FK usage). */
  def q6AntiJoin(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(orders(s, dir).where(col("o_orderdate") >= lit("2001-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Semi join (EXISTS): orders having a high-quantity lineitem. */
  def q7SemiJoin(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .join(lineitem(s, dir).where(col("l_quantity") >= 48), col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .orderBy("o_orderkey")

  /** Distinct + multi-key agg: per-supplier distinct part count. */
  def q8DistinctAgg(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy("l_suppkey")
      .agg(countDistinct("l_partkey").as("distinct_parts"),
        count(lit(1)).as("line_count"))
      .orderBy("l_suppkey")

  /** Conditional aggregation (dlx `bib_type_map` when-chains analog):
    * order-priority bucket counts per status. */
  def q9CaseAgg(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        sum(when(col("o_orderpriority").startsWith("1") || col("o_orderpriority").startsWith("2"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").startsWith("1") || col("o_orderpriority").startsWith("2"), 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("o_orderstatus")

  /** Grouped having + join-back (TPC-H Q18 flavor): big-quantity orders. */
  def q10Having(s: SparkSession, dir: String): DataFrame = {
    val big = lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(dec("l_quantity")).cast("double").as("total_qty"))
      .where(col("total_qty") > 300)
    orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
      .orderBy("o_orderkey")
  }

  /** Event-time tumbling window agg over the events table (Structured
    * Streaming-shaped query run as batch; same plan works under
    * readStream + watermark). */
  def q11EventWindows(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec("value")).cast("double").as("sum_value"))
      .select(col("w.start").cast("long").as("window_start_s"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start_s", "event_type")

  /** Set op: UNION of two predicate-disjoint projections, dedup'd
    * (dlx `Or` condition algebra, SURVEY §2.7). */
  def q12Union(s: SparkSession, dir: String): DataFrame = {
    val a = customer(s, dir).where(col("c_acctbal") > 9900).select(col("c_custkey").as("key"))
    val b = supplier(s, dir).where(col("s_acctbal") > 9900).select(col("s_suppkey").as("key"))
    a.union(b).distinct().orderBy("key")
  }

  /** As-of join: each purchase event matched to the latest click by the
    * same user strictly before it (classic attribution). Spark has no
    * native ASOF JOIN; the scale-correct composition is union-the-
    * streams + one window pass — tag both sides, sort within user, and
    * carry the last click forward with `last(_, ignoreNulls)` over
    * `ROWS UNBOUNDED PRECEDING .. 1 PRECEDING`. ONE shuffle on
    * user_id (corpus-cardinality key), no range-join pair explosion:
    * a ts-band range join would be O(clicks × purchases) per band,
    * this is O(n log n) per user. Whole-second math so the DuckDB
    * oracle (ns timestamps) agrees exactly; ties broken by event_id. */
  def asofLastBefore(ev: DataFrame, matchType: String, pickType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val isMatch = col("event_type") === matchType
    ev
      .withColumn("match_id", last(when(isMatch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("match_ts_s", last(when(isMatch, col("ts_s")), ignoreNulls = true).over(w))
      .where(col("event_type") === pickType && col("match_id").isNotNull)
  }

  def q89AsofJoin(s: SparkSession, dir: String): DataFrame =
    asofLastBefore(
      events(s, dir).select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("ts_s"), col("event_type")),
      matchType = "click", pickType = "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_s").as("purchase_ts_s"), col("match_id").as("click_id"),
        col("match_ts_s").as("click_ts_s"),
        (col("ts_s") - col("match_ts_s")).as("gap_s"))
      .orderBy("purchase_id")

  /** Multi-step funnel analysis (view → click → purchase, each step
    * within `windowSeconds` of the previous) — the conversion analytic
    * every event pipeline ships. Composed the same scale-correct way
    * as [[asofLastBefore]]: ONE shuffle on user_id and a chained
    * window pass — carry the last view forward, qualify clicks that
    * follow a view within the window, carry the last qualified click
    * forward, qualify purchases — never a clicks×purchases range
    * join (O(n·m) per user where the window pass is O(n log n)).
    * Whole-second math and (ts, event_id) tie order, so the DuckDB
    * replay is exact; last-in-order equals max-ts under the same
    * ordering, which is what the oracle's running MAX replays. */
  def q127Funnel(s: SparkSession, dir: String, windowSeconds: Long = 1800L): DataFrame =
    funnel(events(s, dir).select(col("event_id"), col("user_id"),
      col("ts").cast("long").as("ts_s"), col("event_type")), windowSeconds)

  /** Funnel core over pre-shaped (event_id, user_id, ts_s, event_type). */
  def funnel(ev: DataFrame, windowSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val staged = ev
      .withColumn("last_view_s",
        last(when(col("event_type") === "view", col("ts_s")), ignoreNulls = true).over(w))
      .withColumn("qual_click_s",
        when(col("event_type") === "click" &&
          col("ts_s") - col("last_view_s") <= windowSeconds, col("ts_s")))
      .withColumn("last_qclick_s", last(col("qual_click_s"), ignoreNulls = true).over(w))
      .withColumn("is_conversion",
        col("event_type") === "purchase" &&
          col("ts_s") - col("last_qclick_s") <= windowSeconds)
    staged.groupBy("user_id").agg(
      sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_views"),
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_clicks"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
      sum(when(col("is_conversion"), 1L).otherwise(0L)).as("n_conversions"),
      coalesce(min(when(col("is_conversion"), col("ts_s"))), lit(-1L))
        .as("first_conversion_s"))
      .orderBy("user_id")
  }

  /** Cohort retention analysis — users grouped by first-activity week
    * (absolute epoch week, ts_s / 604800: no corpus-min dependency, so
    * shards compute it independently), with per-(cohort, week-offset)
    * active-user counts and permille retention. Shape: one distinct
    * (user, week) pass, a user-keyed min for the cohort, a
    * cohort-keyed count — every shuffle keys on user or cohort, and
    * the output is bounded by (weeks × weeks), not the event volume. */
  def q128CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val userWeeks = events(s, dir)
      .select(col("user_id"), col("ts").cast("long").as("ts_s"))
      .select(col("user_id"), expr("ts_s div 604800").as("wk")) // integer weeks
      .distinct()
    val cohort = userWeeks.groupBy("user_id").agg(min("wk").as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    userWeeks.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"), col("cohort_size"),
        expr("n_active * 1000 div cohort_size").as("retention_permille"))
      .orderBy("cohort_week", "week_offset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter" -> (q2Filter _),
    "q3_join_agg" -> (q3JoinAgg _),
    "q4_window_latest" -> (q4WindowLatest _),
    "q5_topk" -> (q5TopK _),
    "q6_anti_join" -> (q6AntiJoin _),
    "q7_semi_join" -> (q7SemiJoin _),
    "q8_distinct_agg" -> (q8DistinctAgg _),
    "q9_case_agg" -> (q9CaseAgg _),
    "q10_having" -> (q10Having _),
    "q11_event_windows" -> (q11EventWindows _),
    "q12_union" -> (q12Union _),
    "q89_asof_join" -> (q89AsofJoin _),
    "q127_funnel" -> ((s: SparkSession, d: String) => q127Funnel(s, d)),
    "q128_cohort_retention" -> (q128CohortRetention _),
    "q160_local_supplier" -> (q160LocalSupplier _))

  val oracle: Map[String, String] = Map(
    // TPC-H Q5 semantics: supplier and customer in the same nation
    "q160_local_supplier" ->
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2)) * (CAST(1.0 AS DECIMAL(20,2)) - CAST(l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2)) * (CAST(1.0 AS DECIMAL(20,2)) - CAST(l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS sum_disc_price,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(CAST(l_extendedprice AS DECIMAL(20,2)) * CAST(l_discount AS DECIMAL(20,2)) AS DOUBLE) AS disc_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_agg" ->
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2)) * (CAST(1.0 AS DECIMAL(20,2)) - CAST(l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_window_latest" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |SELECT o_custkey, o_orderkey, o_orderdate,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q5_topk" ->
      """SELECT o_custkey,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS total_spent,
        |COUNT(*) AS order_count
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spent DESC, o_custkey LIMIT 10""".stripMargin,
    "q6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q7_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |ORDER BY o_orderkey""".stripMargin,
    "q8_distinct_agg" ->
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS distinct_parts, COUNT(*) AS line_count
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q9_case_agg" ->
      """SELECT o_orderstatus,
        |CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q10_having" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, total_qty FROM orders
        |JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING total_qty > 300) big ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q11_event_windows" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start_s,
        |event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start_s, event_type""".stripMargin,
    "q12_union" ->
      """SELECT DISTINCT key FROM (
        |SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9900
        |UNION ALL
        |SELECT s_suppkey AS key FROM supplier WHERE s_acctbal > 9900)
        |ORDER BY key""".stripMargin,
    "q89_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s, event_type
        |  FROM events),
        |t AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER win AS click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN ts_s END IGNORE NULLS)
        |      OVER win AS click_ts_s
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_s, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id AS purchase_id, user_id, ts_s AS purchase_ts_s,
        |       click_id, click_ts_s, ts_s - click_ts_s AS gap_s
        |FROM t WHERE event_type = 'purchase' AND click_id IS NOT NULL
        |ORDER BY purchase_id""".stripMargin,
    // replays the chained funnel windows: last view carried forward,
    // click qualified by view-within-window, last qualified click
    // carried forward, purchase qualified by click-within-window —
    // same (ts_s, event_id) frame as the Spark plan
    "q127_funnel" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s, event_type
        |  FROM events),
        |w1 AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type = 'view' THEN ts_s END IGNORE NULLS)
        |      OVER win AS last_view_s
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_s, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |w2 AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND ts_s - last_view_s <= 1800
        |                 THEN ts_s END AS qual_click_s
        |  FROM w1),
        |w3 AS (
        |  SELECT *, last_value(qual_click_s IGNORE NULLS) OVER win AS last_qclick_s
        |  FROM w2
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_s, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |f AS (
        |  SELECT *, (event_type = 'purchase' AND ts_s - last_qclick_s <= 1800) AS conv
        |  FROM w3)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
        |  CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS n_conversions,
        |  COALESCE(MIN(CASE WHEN conv THEN ts_s END), -1) AS first_conversion_s
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,
    // replays the absolute-epoch-week cohorting and permille retention
    "q128_cohort_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 1000000000 // 604800 AS wk
        |  FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_week FROM uw GROUP BY 1),
        |sz AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM c GROUP BY 1),
        |act AS (
        |  SELECT c.cohort_week, uw.wk - c.cohort_week AS week_offset,
        |         COUNT(DISTINCT uw.user_id) AS n_active
        |  FROM uw JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT a.cohort_week, a.week_offset,
        |  CAST(a.n_active AS BIGINT) AS n_active,
        |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
        |  a.n_active * 1000 // s.cohort_size AS retention_permille
        |FROM act a JOIN sz s USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin)
}
