package graft

/** Measurement harness (r16): time one query under a given table-cache
  * mode and print the join nodes of its executed plan — built to attribute
  * the sf10 anomaly where the `memory` cache mode ran x151 5× slower than
  * plain parquet re-reads. Results recorded in BASELINE.md.
  *
  * runMain graft.CacheProbe <sfDir> <queryName> <mode: off|meta|memory>
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, name, mode) = (args(0), args(1), args(2))
    val spark = Engine.session(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "64")
    spark.conf.set("spark.graft.tableCache", mode)
    val q = SparkEntry.queries(name)
    // warm pass (codegen/classloading), then the measured pass
    q(spark, sfDir).write.mode("overwrite").format("noop").save()
    val df = q(spark, sfDir)
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    val plan = df.queryExecution.executedPlan.toString
    val joins = plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("InMemory"))
      .map(_.trim.take(140)).toSeq
    println(f"[cacheprobe] $name mode=$mode sec=$sec%.2f")
    joins.foreach(l => println(s"[cacheprobe]   $l"))
    spark.stop()
  }
}
