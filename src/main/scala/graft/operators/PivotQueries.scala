package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Pivot / unpivot surface (wide↔long reshaping — standard analytics ops the
  * reference's DuckDB could run via PIVOT/UNPIVOT). */
object PivotQueries {
  import CoreQueries.Q

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Q38 — pivot: per-user-bucket counts, one column per event type. The
    * explicit value list keeps the plan a single pass (no distinct-values
    * pre-query) and the output schema static — the only pivot form that
    * works on an unbounded type domain at scale. */
  val q38: Q = (s, d) =>
    t(s, d, "events")
      .groupBy((col("user_id") % 10).cast("long").as("bucket"))
      .pivot("event_type", eventTypes)
      .count()
      // pivot leaves empty cells null; the conditional-aggregation twin
      // yields 0 — normalize
      .select(col("bucket") +: eventTypes.map(e => coalesce(col(e), lit(0L)).as(e)): _*)
      .orderBy(col("bucket"))

  /** Q39 — unpivot (long form) via stack(): three part metrics to
    * (p_partkey, metric, value) rows. */
  val q39: Q = (s, d) =>
    t(s, d, "part")
      .filter(col("p_partkey") <= 50)
      .select(col("p_partkey"),
        expr("stack(3, 'size', CAST(p_size AS DOUBLE), 'retail', p_retailprice, " +
          "'name_len', CAST(length(p_name) AS DOUBLE)) AS (metric, value)"))
      .select(col("p_partkey"), col("metric"), round(col("value"), 2).as("value"))
      .orderBy(col("p_partkey"), col("metric"))

  val queries: Map[String, Q] = Map(
    "q38_pivot" -> q38,
    "q39_unpivot" -> q39)

  val oracles: Map[String, String] = Map(
    "q38_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
        |COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q39_unpivot" ->
      """SELECT p_partkey, metric, ROUND(value, 2) AS value FROM (
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |  UNION ALL SELECT p_partkey, 'retail', p_retailprice FROM part
        |  UNION ALL SELECT p_partkey, 'name_len', CAST(length(p_name) AS DOUBLE) FROM part)
        |WHERE p_partkey <= 50 ORDER BY p_partkey, metric""".stripMargin)
}
