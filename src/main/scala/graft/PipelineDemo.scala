package graft

import graft.streaming.{AnalyticsPipeline, IngestJob}

/** Runnable form of the reference's e2e flow (validation/e2e.sh): produce N
  * trades → topic → streaming ingest → table → canonical analytics → second
  * topic → ingest → re-query. Usage: runMain graft.PipelineDemo [workDir] [n]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-pipeline").toString)
    val n = args.lift(1).map(_.toLong).getOrElse(20000L) // e2e.sh:109-116
    val spark = Engine.session("spark.sql.shuffle.partitions" -> "8")
    val t0 = System.nanoTime()
    val analytics = AnalyticsPipeline.runCycle(spark, workDir, n)
    analytics.orderBy(org.apache.spark.sql.functions.desc("total_volume")).show(20, truncate = false)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[pipeline] $n trades through the bidirectional cycle in $secs%.1f s; workDir=$workDir")
    val tradesDir = s"$workDir/tables/trades"
    println("[pipeline] trades snapshots: " +
      IngestJob.committedBatches(tradesDir).toSeq.sorted.mkString(","))
    // maintenance pass: consolidate the per-trigger snapshots, then prove the
    // row count is invariant and the retired dirs are reclaimable
    graft.streaming.Maintenance.compact(spark, tradesDir).foreach { st =>
      println(s"[pipeline] compacted ${st.replaced.size} snapshots -> " +
        s"batch=${st.newBatch} (${st.rowsRewritten} rows)")
      val after = IngestJob.readTable(spark, tradesDir).count()
      val expired = graft.streaming.Maintenance.expireSnapshots(tradesDir)
      println(s"[pipeline] post-compaction rows=$after; expired dirs: ${expired.mkString(",")}")
    }
    spark.stop()
  }
}
