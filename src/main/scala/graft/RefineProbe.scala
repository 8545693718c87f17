package graft

import org.apache.spark.sql.functions._

/** x85 refine diagnostic: shortlist recall of true top-3 vs shortlist size,
  * per query — which queries lose hits, and by what ADC rank margin.
  * runMain graft.RefineProbe [sfDir]
  */
object RefineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8")
    val fresh = operators.AdvancedQueries.x27(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val short = operators.AdvancedQueries.refineShortlist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val missing = fresh.filterNot { case (q, v) => short.getOrElse(q, Set.empty).contains(v) }
    println(s"PROBE true-top3 pairs=${fresh.length} missing-from-shortlist=${missing.length}")
    println(s"PROBE queries-affected=${missing.map(_._1).distinct.length}")
    // full ADC ranking per query (no TopK cutoff): at what ADC rank does the
    // worst true-top-3 hit sit? -> the L needed for recall 1.0
    val fullRank = operators.AdvancedQueries.refineAdcRanks(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val ranks = fresh.map { case (q, v) => fullRank.getOrElse((q, v), -1L) }
    println(s"PROBE adc-rank of true hits: max=${ranks.max} " +
      s"p99=${ranks.sorted.apply(ranks.length * 99 / 100)} " +
      s"p90=${ranks.sorted.apply(ranks.length * 9 / 10)} " +
      s"median=${ranks.sorted.apply(ranks.length / 2)}")
    spark.stop()
    sys.exit(0)
  }
}
