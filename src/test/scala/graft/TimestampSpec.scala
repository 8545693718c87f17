package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalQueries

/** Physical-timestamp-type immunity (VERDICT r8 #1): the driver regenerated
  * testdata with tz-less `timestamp[us]`, which Spark 4 infers as
  * TIMESTAMP_NTZ and strict functions (`unix_micros`) reject. The engine now
  * pins `inferTimestampNTZ=false` (Engine.scala) AND normalizes NTZ columns
  * at the Tables.load seam, so the same query must produce identical results
  * whether the parquet stores the column as TIMESTAMP (tz/UTC-adjusted) or
  * TIMESTAMP_NTZ (tz-less) — the two physical forms a generator can emit.
  */
class TimestampSpec extends SparkSpec {

  /** Write the sf0.001 events table twice: once with an explicit
    * instant-semantics TIMESTAMP column, once with TIMESTAMP_NTZ. */
  private lazy val (tzDir, ntzDir): (String, String) = {
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val tz = tmpDir("ts-tz")
    val ntz = tmpDir("ts-ntz")
    ev.withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tz/events.parquet")
    ev.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$ntz/events.parquet")
    (tz, ntz)
  }

  test("Tables.t normalizes TIMESTAMP_NTZ parquet to TimestampType") {
    val schema = Tables.t(spark, ntzDir, "events").schema
    val tsField = schema.fields.find(_.name == "ts").get
    assert(tsField.dataType == org.apache.spark.sql.types.TimestampType,
      s"expected TimestampType after seam normalization, got ${tsField.dataType}")
  }

  test("x35 sessions run identically over tz and ntz physical forms") {
    val a = TemporalQueries.x35(spark, tzDir).collect().map(_.toSeq).toSeq
    val b = TemporalQueries.x35(spark, ntzDir).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty, "x35 returned no sessions")
    assert(a == b, "x35 differs between tz and ntz physical timestamp forms")
  }

  test("q34 session_window matches x35 linear pass on both physical forms") {
    for (d <- Seq(tzDir, ntzDir)) {
      val native = TemporalQueries.q34(spark, d).collect().map(_.toSeq).toSeq
      val linear = TemporalQueries.x35(spark, d).collect().map(_.toSeq).toSeq
      assert(native == linear, s"q34 vs x35 mismatch on $d")
    }
  }
}
