package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, dsum, davg, fround, tsStr}

/** SURVEY.md §2.4 Q1–Q9 — the reference-faithful relational core.
  *
  * These transplant the reference's own query shapes (the canonical analytics
  * aggregate `duckdb/query_and_publish.py:107-122`, the verification queries
  * `duckdb/verify_iceberg.sql` and `validation/e2e.sh:158-205`, and the
  * PyArrow cross-checks `verify_iceberg.py:34-67`) onto the testdata tables.
  *
  * Scale notes: every query here is scan -> partial agg -> shuffle(32) ->
  * final agg; no row-count-proportional data crosses the exchange, so the
  * shapes hold unchanged on a 1000-executor cluster at 100 TB.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Q1 — the reference's flagship 10-aggregate analytics query
    * (query_and_publish.py:107-122: count/avg/min/max/sum/conditional counts/
    * first/last per group, ordered by volume). */
  val q01: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("c"),
        fround(davg(col("value")), 2).as("avg_v"),
        round(min(col("value")), 2).as("min_v"),
        round(max(col("value")), 2).as("max_v"),
        sum(col("user_id")).cast("long").as("tot"),
        count(when(col("value") > 100, 1)).as("hi_cnt"),
        count(when(col("value") <= 100, 1)).as("lo_cnt"),
        tsStr(min(col("ts"))).as("first_ts"),
        tsStr(max(col("ts"))).as("last_ts"))
      .orderBy(desc("tot"), col("event_type"))

  /** Q2 — global row count (verify_iceberg.sql:4-7). */
  val q02: Q = (s, d) =>
    t(s, d, "lineitem").agg(count(lit(1)).as("n"))

  /** Q3 — grouped count/avg/volume (verify_iceberg.sql:9-16). */
  val q03: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("c"),
        fround(davg(col("l_extendedprice")), 2).as("ap"),
        sum(col("l_quantity").cast("long")).as("vol"))
      .orderBy(desc("vol"), col("l_returnflag"))

  /** Q4 — count + keysum sanity aggregate (e2e.sh:158-164). */
  val q04: Q = (s, d) =>
    t(s, d, "orders").agg(
      count(lit(1)).as("n"),
      sum(col("o_orderkey")).cast("long").as("s"))

  /** Q5 — top-5 customers by spend (e2e.sh:168-177). ORDER BY+LIMIT plans as
    * TakeOrderedAndProject: per-partition top-k then a k-row merge on the
    * driver — no global sort at any scale. */
  val q05: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(round(dsum(col("o_totalprice")), 2).as("s"))
      .orderBy(desc("s"), col("o_custkey"))
      .limit(5)

  /** Q6 — heterogeneous 4-branch UNION ALL summary (e2e.sh:182-205). */
  val q06: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    val o = t(s, d, "orders")
    val b1 = li.agg(count(lit(1)).cast("string").as("val"))
      .select(lit("lineitem").as("tbl"), lit("count").as("metric"), col("val"))
    val b2 = o.agg(count(lit(1)).cast("string").as("val"))
      .select(lit("orders").as("tbl"), lit("count").as("metric"), col("val"))
    val b3 = o.agg(sum(col("o_orderkey")).cast("long").cast("string").as("val"))
      .select(lit("orders").as("tbl"), lit("sum_orderkey").as("metric"), col("val"))
    val b4 = li.agg(sum(col("l_quantity").cast("long")).cast("string").as("val"))
      .select(lit("lineitem").as("tbl"), lit("sum_quantity").as("metric"), col("val"))
    b1.unionAll(b2).unionAll(b3).unionAll(b4).orderBy(col("tbl"), col("metric"))
  }

  /** Q7 — exact COUNT(DISTINCT) (e2e.sh:192-193); Catalyst expands to the
    * two-phase distinct aggregate, partial-distinct before the shuffle. */
  val q07: Q = (s, d) =>
    t(s, d, "orders").agg(countDistinct(col("o_orderpriority")).as("n"))

  /** Q8 — exact distinct values (verify_iceberg.py:50-51). */
  val q08: Q = (s, d) =>
    t(s, d, "events").select(col("event_type")).distinct()
      .orderBy(col("event_type"))

  /** Q9 — global column min/max (verify_iceberg.py:54-61). Parquet footer
    * stats make this a near-metadata-only scan. */
  val q09: Q = (s, d) =>
    t(s, d, "events").agg(
      tsStr(min(col("ts"))).as("min_ts"),
      tsStr(max(col("ts"))).as("max_ts"),
      round(min(col("value")), 2).as("min_v"),
      round(max(col("value")), 2).as("max_v"))

  val queries: Map[String, Q] = Map(
    "q01_event_analytics" -> q01,
    "q02_count" -> q02,
    "q03_returnflag_agg" -> q03,
    "q04_orders_summary" -> q04,
    "q05_topk_customers" -> q05,
    "q06_union_summary" -> q06,
    "q07_count_distinct" -> q07,
    "q08_distinct_values" -> q08,
    "q09_minmax" -> q09)

  val oracles: Map[String, String] = Map(
    "q01_event_analytics" ->
      """SELECT event_type, COUNT(*) AS c,
        |floor(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) * 100 + 0.5) / 100 AS avg_v,
        |ROUND(MIN(value),2) AS min_v, ROUND(MAX(value),2) AS max_v,
        |CAST(SUM(user_id) AS BIGINT) AS tot,
        |COUNT(CASE WHEN value > 100 THEN 1 END) AS hi_cnt,
        |COUNT(CASE WHEN value <= 100 THEN 1 END) AS lo_cnt,
        |CAST(MIN(ts) AS VARCHAR) AS first_ts, CAST(MAX(ts) AS VARCHAR) AS last_ts
        |FROM events GROUP BY event_type ORDER BY tot DESC, event_type""".stripMargin,
    "q02_count" -> "SELECT COUNT(*) AS n FROM lineitem",
    "q03_returnflag_agg" ->
      """SELECT l_returnflag, COUNT(*) AS c,
        |floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) * 100 + 0.5) / 100 AS ap,
        |CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vol
        |FROM lineitem GROUP BY l_returnflag ORDER BY vol DESC, l_returnflag""".stripMargin,
    "q04_orders_summary" ->
      "SELECT COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders",
    "q05_topk_customers" ->
      """SELECT o_custkey, ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE),2) AS s
        |FROM orders GROUP BY o_custkey ORDER BY s DESC, o_custkey LIMIT 5""".stripMargin,
    "q06_union_summary" ->
      """SELECT 'lineitem' AS tbl, 'count' AS metric, CAST(COUNT(*) AS VARCHAR) AS val FROM lineitem
        |UNION ALL SELECT 'orders', 'count', CAST(COUNT(*) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'orders', 'sum_orderkey', CAST(CAST(SUM(o_orderkey) AS BIGINT) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'lineitem', 'sum_quantity', CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS VARCHAR) FROM lineitem
        |ORDER BY tbl, metric""".stripMargin,
    "q07_count_distinct" ->
      "SELECT COUNT(DISTINCT o_orderpriority) AS n FROM orders",
    "q08_distinct_values" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q09_minmax" ->
      """SELECT CAST(MIN(ts) AS VARCHAR) AS min_ts, CAST(MAX(ts) AS VARCHAR) AS max_ts,
        |ROUND(MIN(value),2) AS min_v, ROUND(MAX(value),2) AS max_v FROM events""".stripMargin)
}
