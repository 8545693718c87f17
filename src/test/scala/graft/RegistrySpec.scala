package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.streaming._

/** A7 — schema-registry emulation: versioning, compatibility, and the
  * `value_schema_latest` evolution contract (validation/e2e.sh:67-105,
  * CLAUDE.md:165-171). */
class RegistrySpec extends SparkSpec {

  private val v1 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sym", StringType),
    StructField("px", DoubleType),
    StructField("ts_event", TimestampType)))
  private val v2 = StructType(v1.fields.toIndexedSeq :+
    StructField("venue", StringType, nullable = true))

  test("register/lookup: versions increment, identical re-register is idempotent") {
    val reg = SchemaRegistry(tmpDir("graft-reg"))
    assert(reg.latest("trades").isEmpty)
    assert(reg.register("trades", v1) == 1)
    assert(reg.register("trades", v1) == 1) // idempotent
    assert(reg.register("trades", v2) == 2)
    assert(reg.versions("trades") == Seq(1, 2))
    assert(reg.latest("trades").map(_._1).contains(2))
    assert(reg.get("trades", 1).contains(v1))
    assert(reg.latest("trades").map(_._2).contains(v2))
    // subjects are independent
    assert(reg.register("orders", v1) == 1)
  }

  test("BACKWARD compatibility: type change, removal, non-nullable addition rejected") {
    val reg = SchemaRegistry(tmpDir("graft-reg-compat"))
    reg.register("t", v1)
    val typeChanged = StructType(v1.fields.map(f =>
      if (f.name == "px") f.copy(dataType = StringType) else f).toIndexedSeq)
    intercept[IllegalArgumentException](reg.register("t", typeChanged))
    val removed = StructType(v1.fields.filterNot(_.name == "px").toIndexedSeq)
    intercept[IllegalArgumentException](reg.register("t", removed))
    val requiredAdd = StructType(v1.fields.toIndexedSeq :+
      StructField("must", LongType, nullable = false))
    intercept[IllegalArgumentException](reg.register("t", requiredAdd))
    // all rejected registers leave the registry at v1
    assert(reg.versions("t") == Seq(1))
  }

  test("schema must exist before data: ingest refuses an unregistered subject") {
    val work = tmpDir("graft-reg-nodata")
    val reg = SchemaRegistry(s"$work/registry")
    intercept[IllegalStateException] {
      IngestJob.startWithRegistry(spark, FileTopic(s"$work/topic"), s"$work/table",
        reg, "ghost", Seq("id"), "ts_event", s"$work/ckpt", Trigger.AvailableNow())
    }
  }

  test("evolution mid-stream: v2 registered between batches; v1 rows read null") {
    val work = tmpDir("graft-reg-evolve")
    val reg = SchemaRegistry(s"$work/registry")
    val topic = FileTopic(s"$work/topic")
    import spark.implicits._

    def publish(rows: Seq[String]): Unit =
      topic.publish(rows.toDF("value").select(
        get_json_object(col("value"), "$.id").as("key"), col("value")))
    def drain(): Unit = {
      val q = IngestJob.startWithRegistry(spark, topic, s"$work/table",
        reg, "trades", Seq("id", "sym"), "ts_event", s"$work/ckpt", Trigger.AvailableNow())
      q.awaitTermination()
    }

    reg.register("trades", v1)
    publish(Seq(
      """{"id":1,"sym":"AAA","px":10.0,"ts_event":"2026-01-01T10:00:00Z"}""",
      """{"id":2,"sym":"BBB","px":20.0,"ts_event":"2026-01-01T11:00:00Z"}"""))
    drain() // batch decoded with v1

    // register v2 mid-stream (new nullable column) — no restart ceremony:
    // the NEXT batch decodes with it
    assert(reg.register("trades", v2) == 2)
    publish(Seq(
      """{"id":3,"sym":"CCC","px":30.0,"ts_event":"2026-01-02T10:00:00Z","venue":"X"}"""))
    drain()

    val table = IngestJob.readTable(spark, s"$work/table")
    // v2's column exists table-wide; v1-era rows read null for it
    assert(table.columns.contains("venue"))
    val byId = table.select(col("id"), col("venue")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some("X")))
    assert(table.count() == 3L)

    // a v1-shaped row arriving AFTER v2 still parses (venue reads null):
    // BACKWARD compatibility is exactly what makes this safe
    publish(Seq("""{"id":4,"sym":"DDD","px":40.0,"ts_event":"2026-01-03T10:00:00Z"}"""))
    drain()
    val t2 = IngestJob.readTable(spark, s"$work/table")
    assert(t2.count() == 4L)
    assert(t2.filter(col("id") === 4 && col("venue").isNull).count() == 1L)
  }
}
