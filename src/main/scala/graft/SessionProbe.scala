package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{t, tsStr}

/** q34 session-window attribution probe (VERDICT r2 #3): measure the native
  * session_window plan against the alternative formulations on one warm
  * engine, print best-of-N seconds per variant + the native plan.
  *
  * runMain graft.SessionProbe [reps]
  */
object SessionProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8")
    spark.conf.set("spark.graft.tableCache", "memory")
    import spark.implicits._

    def native(s: SparkSession, d: String): DataFrame =
      operators.TemporalQueries.q34(s, d)

    // gaps-and-islands: lag -> running-sum session ids -> groupBy
    def islands(s: SparkSession, d: String): DataFrame = {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("new_s",
          when(unix_micros(col("ts").cast("timestamp"))
              - unix_micros(lag(col("ts"), 1).over(byUser).cast("timestamp")) >= 1800000000L
            || lag(col("ts"), 1).over(byUser).isNull, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(run))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).as("start"), max(col("ts")).as("mend"), count(lit(1)).as("n"))
        .select(col("user_id"), tsStr(col("start")).as("s_start"),
          tsStr(col("mend") + expr("INTERVAL 30 MINUTE")).as("s_end"), col("n"))
        .orderBy(col("user_id"), col("s_start"))
    }

    // repartition + sortWithinPartitions + one linear pass per partition
    def linear(s: SparkSession, d: String): DataFrame = {
      val ev = t(s, d, "events").select(col("user_id"), col("ts"))
        .repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"))
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tsl"), col("ts"))
      val sessions = ev.as[(Long, Long, java.sql.Timestamp)].mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, java.sql.Timestamp, Long, Long)]
        var curUser = Long.MinValue
        var start: java.sql.Timestamp = null
        var lastL = 0L
        var startL = 0L
        var n = 0L
        def flush(): Unit = if (n > 0) out += ((curUser, start, lastL, n))
        for ((u, tl, tts) <- it) {
          if (u != curUser || tl - lastL >= 1800000000L) {
            flush(); curUser = u; start = tts; startL = tl; n = 0
          }
          lastL = tl; n += 1
        }
        flush()
        out.iterator
      }.toDF("user_id", "start", "last_l", "n")
      sessions.select(col("user_id"), tsStr(col("start")).as("s_start"),
        tsStr(timestamp_micros(col("last_l") + 1800000000L)).as("s_end"), col("n"))
        .orderBy(col("user_id"), col("s_start"))
    }

    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "native" -> native,
      "native_localmerge" -> ((s: SparkSession, d: String) => {
        s.conf.set("spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", "true")
        val r = native(s, d); r
      }),
      "islands" -> islands,
      "linear_mapPartitions" -> linear)

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    // correctness cross-check first (count + sample hash vs native)
    val ref = native(spark, sfDir).collect().map(_.toSeq).toSeq
    variants.foreach { case (name, fn) =>
      val got = fn(spark, sfDir).collect().map(_.toSeq).toSeq
      println(s"CHECK $name rows=${got.size} match=${got == ref}")
      spark.conf.set("spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", "false")
    }
    variants.foreach { case (name, fn) =>
      val ts = (1 to reps).map(_ => time(
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()))
      println(f"TIME $name%-22s best=${ts.min}%.3f all=${ts.map(x => f"$x%.3f").mkString(",")}")
      spark.conf.set("spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", "false")
    }
    println("=== native plan ===")
    native(spark, sfDir).explain("formatted")
    spark.stop()
    sys.exit(0)
  }
}
