package graft

import org.apache.spark.sql.DataFrame

/** x25/x26 timing probe under the Engine defaults (AQE on, 32 shuffle
  * partitions — the Bench session shape, unlike RunQ's AQE-off/8).
  *
  * runMain graft.SemProbe [sfDir] [reps]
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Engine.session()
    spark.conf.set("spark.graft.tableCache", "memory")
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "x25" -> (() => operators.AdvancedQueries.x25(spark, sfDir)),
      "x26" -> (() => operators.AdvancedQueries.x26(spark, sfDir)))
    variants.foreach { case (name, q) =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        q().write.mode("overwrite").format("noop").save()
        println(f"[semprobe] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
