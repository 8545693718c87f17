package graft

/** Batch plan dumper for the optimization-round artifacts:
  * runMain graft.ExplainMany <outDir> <suffix> <name1,name2,...> [sfDir]
  * writes `outDir/<name>_<suffix>.txt` with the formatted physical plan of
  * each SparkEntry query, under the SAME session profile Bench times
  * (Engine defaults + AQE off + 8 shuffle partitions), so committed plan
  * files describe the benched plans. */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        Engine.reapLocalCheckpoints(spark)
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $n failed: $e")
      }
    }
    spark.stop()
  }
}
