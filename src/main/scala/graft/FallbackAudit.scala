package graft
import org.apache.spark.sql.SparkSession

/** One-shot audit for SILENT whole-stage-codegen fallbacks (r18): a stage
  * whose generated method exceeds spark.sql.codegen.hugeMethodLimit
  * reverts to expression-tree interpretation with only an INFO log — a
  * 50–100× per-row tax invisible at WARN (the x94 finding). Runs every
  * SparkEntry query once at INFO and reports which keys trip it.
  * Usage: runMain graft.FallbackAudit [sfDir] */
object FallbackAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // capture only the fallback logger at INFO
    val lg = org.apache.logging.log4j.LogManager.getLogger(
      "org.apache.spark.sql.execution.WholeStageCodegenExec")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.WholeStageCodegenExec",
      org.apache.logging.log4j.Level.INFO)
    val _ = lg
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "fallback-audit", null,
      org.apache.logging.log4j.core.layout.PatternLayout.createDefaultLayout(),
      false, Array.empty) {
      @volatile var current: String = "?"
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("Found too long generated codes"))
          counts.synchronized { counts(current) = counts.getOrElse(current, 0) + 1 }
      }
    }
    appender.start()
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    ctx.getConfiguration.getLoggerConfig(
      "org.apache.spark.sql.execution.WholeStageCodegenExec").addAppender(
      appender, org.apache.logging.log4j.Level.INFO, null)
    ctx.updateLoggers()
    // Attribution caveat (r19, ADVICE): events are attributed to
    // `appender.current` at ARRIVAL time. The noop write below blocks
    // until its job completes, so task-thread events normally land before
    // `current` advances — but log4j delivery is not barriered with job
    // completion, so a straggling event can in principle charge query N's
    // fallback to query N+1. Acceptable for a one-shot diagnostic: the
    // audit's contract is "which keys trip it", and a ±1-key smear still
    // points at the right family.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      appender.current = name
      try fn(spark, dir).write.mode("overwrite").format("noop").save()
      catch { case e: Exception =>
        System.err.println(s"[audit] $name failed: ${e.getMessage.take(100)}")
      }
    }
    counts.toSeq.sortBy(-_._2).foreach { case (k, n) =>
      println(s"FALLBACK $k x$n")
    }
    if (counts.isEmpty) println("FALLBACK none")
    spark.stop()
  }
}
