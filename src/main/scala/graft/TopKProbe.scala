package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** x61 Aggregator cost probe (VERDICT r2 #2 follow-up): the bounded TopK
  * Aggregator vs the ROW_NUMBER window form over the IDENTICAL joined
  * input (q21 windows a 20k-row dim table — 7.5× fewer rows, no join —
  * so "x61 within 2× of q21" compares different workloads; this isolates
  * the aggregation strategy on equal data).
  *
  * runMain graft.TopKProbe [reps]
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8")
    spark.conf.set("spark.graft.tableCache", "memory")

    def aggregator(s: SparkSession, d: String): DataFrame =
      operators.UdfQueries.x61(s, d)

    // same join, same output shape, ROW_NUMBER instead of the Aggregator
    def window(s: SparkSession, d: String): DataFrame = {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn").cast("long").as("rn"),
          col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }

    val ref = aggregator(spark, sfDir).collect().map(_.toSeq).toSeq
    val got = window(spark, sfDir).collect().map(_.toSeq).toSeq
    println(s"CHECK window rows=${got.size} match=${got == ref}")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    Seq("aggregator" -> (aggregator _), "window" -> (window _)).foreach { case (n, f) =>
      val ts = (1 to reps).map(_ => time(
        f(spark, sfDir).write.mode("overwrite").format("noop").save()))
      println(f"TIME $n%-12s best=${ts.min}%.3f all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
    sys.exit(0)
  }
}
