package graft

/** x85 phase attribution: shortlist-alone vs full refine, best-of-N hot.
  * runMain graft.RefineTime [sfDir] [reps]
  */
object RefineTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Engine.session(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8")
    spark.conf.set("spark.graft.tableCache", "memory")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def best(name: String)(fn: => Unit): Unit = {
      val ts = (1 to reps).map(_ => time(fn))
      println(f"TIME $name%-12s best=${ts.min}%.3f all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    best("shortlist") {
      operators.AdvancedQueries.refineShortlist(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    best("x85") {
      operators.AdvancedQueries.queries("x85_refine_search")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    best("x28") {
      operators.AdvancedQueries.queries("x28_indexed_retrieval")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
    sys.exit(0)
  }
}
