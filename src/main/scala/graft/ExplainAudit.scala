package graft

import org.apache.spark.sql.SparkSession

/** Plan audit over every SparkEntry query: flags the anti-patterns the 100 TB
  * mandate forbids (unexpected cartesian products, nested-loop joins off the
  * broadcast path, global sorts where none is required). One line per query.
  * Usage: runMain graft.ExplainAudit [sfDir]
  */
object ExplainAudit {
  // queries where a BroadcastNestedLoopJoin/cartesian is the intended shape
  // (explicit all-pairs or scalar-broadcast crossJoin)
  private val intendedCross = Set(
    "q29_cosine_topk", "x20_cosine_neardup", "x22_ann_ivf", "q37_in_subquery",
    "x23_multi_query_topk") // corpus × broadcast query-vector sweep, as q29

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          // a plan-level cartesian (not the broadcast variant) never survives scale
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          // nested-loop join anywhere we didn't explicitly choose an all-pairs sweep
          "NestedLoop" -> (plan.contains("BroadcastNestedLoopJoin") && !intendedCross(name))
        ).filter(_._2).map(_._1)
        if (flags.nonEmpty) { flagged += 1; println(s"[audit] $name: ${flags.mkString(",")}") }
        else println(s"[audit] $name: ok")
      } catch { case e: Throwable =>
        flagged += 1; println(s"[audit] $name: ERROR ${e.getMessage.take(120)}")
      }
    }
    println(s"[audit] flagged: $flagged")
    spark.stop()
  }
}
