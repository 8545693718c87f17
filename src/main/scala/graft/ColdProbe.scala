package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Cold-start attribution probe (BASELINE.md methodology): fresh JVM, run
  * the full suite ONCE in one of three modes, print per-query seconds and
  * the wall total. Each mode needs its own JVM (`sbt "runMain ..."` forks).
  *
  *   seq        — the classic sequential cold pass (what BENCH_r02 measured)
  *   nocodegen  — sequential, whole-stage codegen OFF: the delta vs `seq`
  *                attributes janino compilation
  *   conc [n]   — first pass served by n concurrent clients (default 8):
  *                compilation parallelizes across cores
  *
  * runMain graft.ColdProbe [seq|nocodegen|conc] [clients]
  */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("seq")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8",
      "spark.scheduler.mode" -> "FAIR")
    spark.conf.set("spark.graft.tableCache", "meta")
    if (mode == "nocodegen") spark.conf.set("spark.sql.codegen.wholeStage", "false")

    val names = SparkEntry.queries.keys.toSeq.sorted
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val t0 = System.nanoTime()
    val times: Seq[(String, Double)] = mode match {
      case "conc" =>
        val clients = args.lift(1).map(_.toInt).getOrElse(8)
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(Executors.newFixedThreadPool(clients))
        Await.result(Future.sequence(names.map(n => Future(n -> run(n)))), Duration.Inf)
      case _ => names.map(n => n -> run(n))
    }
    val wall = (System.nanoTime() - t0) / 1e9
    times.sortBy(-_._2).take(12).foreach { case (n, s) => println(f"COLD $n%-28s $s%7.3f") }
    println(f"""{"metric":"cold_$mode","wall":$wall%.2f,"sum":${times.map(_._2).sum}%.2f,"queries":${names.size}}""")
    spark.stop()
    sys.exit(0)
  }
}
