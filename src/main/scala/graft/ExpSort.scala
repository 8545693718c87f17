package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables.{t, davg, fround}

/** Scratch experiment: cost of the final presentation sort.
  * Variants of q03: no sort / global orderBy (range exchange + sampling job) /
  * coalesce(1)+sortWithinPartitions (single-partition total sort). */
object ExpSort {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.tableCache", "memory")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def agg() = t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("c"), fround(davg(col("l_extendedprice")), 2).as("ap"),
        sum(col("l_quantity").cast("long")).as("vol"))

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "nosort" -> (() => agg()),
      "orderBy" -> (() => agg().orderBy(desc("vol"), col("l_returnflag"))),
      "coalesce1" -> (() => agg().coalesce(1).sortWithinPartitions(desc("vol"), col("l_returnflag"))))

    variants.foreach { case (n, f) => // warmup
      f().write.mode("overwrite").format("noop").save()
    }
    variants.foreach { case (n, f) =>
      val times = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-12s best=${times.min}%.3f median=${times.sorted.apply(3)}%.3f")
    }
    spark.stop()
  }
}

object ExpStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    def show(n: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.optimizedPlan
      println(s"== $n: ${p.getClass.getSimpleName} stats=${p.stats.sizeInBytes} rowCount=${p.stats.rowCount} maxRows=${p.maxRows}")
      p.children.foreach(c => println(s"   child ${c.getClass.getSimpleName} stats=${c.stats.sizeInBytes} rows=${c.stats.rowCount} maxRows=${c.maxRows}"))
    }
    show("q03", SparkEntry.queries("q03_returnflag_agg")(spark, sfDir))
    show("q05", SparkEntry.queries("q05_topk_customers")(spark, sfDir))
    show("q18", SparkEntry.queries("q18_row_number")(spark, sfDir))
    show("q16", SparkEntry.queries("q16_tpch_q1")(spark, sfDir))
    spark.stop()
  }
}

object ExpSession {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.Tables.{t, tsStr}
    val spark = Engine.session(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8")
    spark.conf.set("spark.graft.tableCache", "memory")
    val d = "/root/testdata/sf0.1"

    def native() = t(spark, d, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), tsStr(col("session_window.start")).as("s_start"),
        tsStr(col("session_window.end")).as("s_end"), col("n"))
      .orderBy(col("user_id"), col("s_start"))

    def islands() = {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val marks = t(spark, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_s", when(col("prev").isNull ||
          col("ts") >= col("prev") + expr("interval 30 minutes"), 1).otherwise(0))
        .withColumn("island", sum(col("new_s")).over(w))
      marks.groupBy(col("user_id"), col("island"))
        .agg(min(col("ts")).as("start"), max(col("ts")).as("last"), count(lit(1)).as("n"))
        .select(col("user_id"), tsStr(col("start")).as("s_start"),
          tsStr(col("last") + expr("interval 30 minutes")).as("s_end"), col("n"))
        .orderBy(col("user_id"), col("s_start"))
    }

    Seq("native" -> native _, "islands" -> islands _).foreach { case (n, f) =>
      f().write.mode("overwrite").format("noop").save() // warm
      val times = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-10s best=${times.min}%.3f median=${times.sorted.apply(3)}%.3f")
    }
    // equivalence check
    val a = native().collect().map(_.toSeq)
    val b = islands().collect().map(_.toSeq)
    println(s"equal=${a.toSeq == b.toSeq} (${a.length} vs ${b.length} rows)")
    spark.stop()
  }
}
