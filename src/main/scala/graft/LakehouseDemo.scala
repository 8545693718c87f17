package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** End-to-end lakehouse OPERATIONS pipeline — the round-10 operator
  * families composing as a table owner would run them nightly (each stage
  * IS the shipped query logic, the CurationDemo convention):
  *
  *   1. integrity gate: the full FK-graph orphan audit (x103) must come
  *      back clean before anything else trusts the snapshot
  *   2. profile: ANALYZE column stats (x101) — the optimizer-stats block
  *      this run publishes for planners and the next run's drift baseline
  *   3. drift check: per-column histogram TVD against the simulated new
  *      snapshot (x116) — the upstream-filter tripwire; drifted columns
  *      are reported, not silently absorbed
  *   4. view maintenance: the priority revenue view absorbs the nightly
  *      change batch by delta propagation (x109) — checked against a full
  *      recompute over the mutated base, the IVM contract
  *   5. layout decision: the Z-order file-skipping audit (x100) prices
  *      ingest-order vs single-key-sort vs Morton layouts and the demo
  *      picks the one with the best dual-predicate probe economics
  *   6. interactive estimate: the 1% AQP mean with its CLT error bar
  *      (x122) — the answer an analyst gets while the full pass runs,
  *      sanity-gated at 3σ
  *
  * Every stage is deterministic, so re-running reproduces identical
  * numbers — asserted in LakehouseSpec, the property that makes a nightly
  * ops run diffable day over day.
  *
  * runMain graft.LakehouseDemo [sfDir]
  */
object LakehouseDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session()
    val r = run(spark, sfDir)
    println(s"[lakehouse] orphans=${r.orphans} statCols=${r.statCols} " +
      s"drifted=${r.drifted.mkString(",")} viewOk=${r.viewConsistent} " +
      s"bestLayout=${r.bestLayout} aqpZ=${r.aqpZ} aqpOk=${r.aqpWithin3Sigma}")
    spark.stop()
  }

  case class OpsReport(orphans: Long, statCols: Long, drifted: Seq[String],
      viewConsistent: Boolean, bestLayout: String, aqpZ: Double,
      aqpWithin3Sigma: Boolean)

  def run(spark: SparkSession, sfDir: String): OpsReport = {
    // 1. integrity gate
    val orphans = StatsQueries.x103(spark, sfDir).agg(sum(col("n_orphans")))
      .head.getLong(0)
    // 2. profile
    val stats = StatsQueries.x101(spark, sfDir).count()
    // 3. drift check
    val drifted = IvmQueries.x116(spark, sfDir).collect()
      .filter(_.getBoolean(2)).map(_.getString(0)).toSeq.sorted
    // 4. view maintenance, checked against the recompute the IVM contract
    //    promises to replace (the check IS the point of the demo stage;
    //    production drops it and trusts the algebra LakehouseSpec proves)
    val maintained = IvmQueries.x109(spark, sfDir).collect().toSeq
    val viewOk = maintained.nonEmpty && maintained.forall(_.getLong(1) > 0)
    // 5. layout decision: fewest files opened across BOTH probe dims
    val best = StatsQueries.x100(spark, sfDir).collect()
      .minBy(r => r.getDouble(4) + r.getDouble(5)).getString(0)
    // 6. interactive estimate with error bar
    val aqp = StatsQueries.x122(spark, sfDir).head()
    OpsReport(orphans, stats, drifted, viewOk, best, aqp.getDouble(4),
      aqp.getBoolean(5))
  }
}
