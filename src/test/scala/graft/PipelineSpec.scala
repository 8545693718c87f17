package graft

import org.apache.spark.sql.functions._
import graft.streaming._

/** Tier-4 pipeline e2e (SURVEY §5.2): the reference's bidirectional cycle —
  * producer → topic → ingest → table → analytics → topic → ingest → table →
  * re-query (validation/e2e.sh re-expressed in Spark). */
class PipelineSpec extends SparkSpec {

  test("bidirectional cycle: 2000 trades -> 8 analytics rows -> re-ingested table") {
    val work = tmpDir("graft-pipeline")
    val n = 2000L
    val result = AnalyticsPipeline.runCycle(spark, work, n)

    // e2e.sh:147-148 — one analytics row per symbol
    assert(result.count() == 8L)
    val rows = result.collect()
    assert(rows.map(_.getAs[String]("symbol")).sorted.toSeq == TradeGen.symbols.sorted)

    // counts add back to the produced total (e2e.sh:161)
    assert(rows.map(_.getAs[Long]("trade_count")).sum == n)
    // buy+sell = total per group (B8 conditional counts)
    rows.foreach { r =>
      assert(r.getAs[Long]("buy_count") + r.getAs[Long]("sell_count") == r.getAs[Long]("trade_count"))
      assert(r.getAs[Double]("min_price") >= 50.0 && r.getAs[Double]("max_price") <= 500.0)
    }

    // the re-ingested analytics table round-trips the published query result
    val direct = AnalyticsPipeline.tradeStats(
      IngestJob.readTable(spark, s"$work/tables/trades"))
    val a = direct.orderBy("symbol").collect().map(_.toSeq)
    val b = result.select(direct.columns.map(col).toIndexedSeq: _*)
      .orderBy("symbol").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)

    // snapshot log committed exactly once per batch (exactly-once ingest)
    val batches = IngestJob.committedBatches(s"$work/tables/trades")
    assert(batches.nonEmpty)
  }

  test("ingest is idempotent: a replayed batch id is skipped") {
    val work = tmpDir("graft-idem")
    val topic = FileTopic(s"$work/topic")
    TradeGen.produce(spark, topic, 100L)
    val q = IngestJob.start(spark, topic, s"$work/table",
      AnalyticsPipeline.tradeSchema,
      Seq("trade_id", "symbol"), "ts_event", s"$work/ckpt",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    val n1 = IngestJob.readTable(spark, s"$work/table").count()
    // wipe the checkpoint (simulated lost offset state) and re-run: the
    // snapshot log must reject the replayed batch ids
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$work/ckpt"))
    val q2 = IngestJob.start(spark, topic, s"$work/table",
      AnalyticsPipeline.tradeSchema,
      Seq("trade_id", "symbol"), "ts_event", s"$work/ckpt",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q2.awaitTermination()
    assert(IngestJob.readTable(spark, s"$work/table").count() == n1)
  }

  test("time travel: readTableAsOf(snapshot) sees only that snapshot's data") {
    val work = tmpDir("graft-tt")
    val topic = FileTopic(s"$work/topic")
    def ingest(): Unit = {
      val q = IngestJob.start(spark, topic, s"$work/table",
        AnalyticsPipeline.tradeSchema,
        Seq("trade_id", "symbol"), "ts_event", s"$work/ckpt",
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    TradeGen.produce(spark, topic, 100L, seed = 1L)
    ingest() // snapshot 0
    TradeGen.produce(spark, topic, 50L, seed = 2L)
    ingest() // snapshot 1
    assert(IngestJob.committedBatches(s"$work/table") == Set(0L, 1L))
    assert(IngestJob.readTableAsOf(spark, s"$work/table", 0L).count() == 100L)
    assert(IngestJob.readTableAsOf(spark, s"$work/table", 1L).count() == 150L)
    assert(IngestJob.readTable(spark, s"$work/table").count() == 150L)
    // unknown snapshot id is rejected
    intercept[IllegalArgumentException] {
      IngestJob.readTableAsOf(spark, s"$work/table", 99L)
    }
  }

  test("schema evolution: a column added in a later snapshot reads as null for older rows") {
    val work = tmpDir("graft-evo")
    val topic = FileTopic(s"$work/topic")
    import org.apache.spark.sql.types._
    val v2 = StructType(AnalyticsPipeline.tradeSchema.fields :+ StructField("venue", StringType))
    def ingest(schema: StructType): Unit = {
      val q = IngestJob.start(spark, topic, s"$work/table", schema,
        Seq("trade_id", "symbol"), "ts_event", s"$work/ckpt",
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    TradeGen.produce(spark, topic, 40L, seed = 1L)
    ingest(AnalyticsPipeline.tradeSchema) // snapshot 0: v1 schema
    // v2 producer includes a venue field
    val withVenue = TradeGen.trades(spark, 20L, seed = 2L)
      .withColumn("venue", org.apache.spark.sql.functions.lit("XNAS"))
    topic.publish(Topics.envelope(withVenue, "trade_id"))
    ingest(v2) // snapshot 1: v2 schema
    val table = IngestJob.readTable(spark, s"$work/table")
    assert(table.columns.contains("venue"))
    assert(table.count() == 60L)
    assert(table.filter(org.apache.spark.sql.functions.col("venue").isNull).count() == 40L)
    assert(table.filter(org.apache.spark.sql.functions.col("venue") === "XNAS").count() == 20L)
  }

  test("schema enforcement: rows missing required fields are rejected, not ingested") {
    val work = tmpDir("graft-reject")
    val topic = FileTopic(s"$work/topic")
    import spark.implicits._
    // 2 valid + 1 junk (unparseable) + 1 missing required symbol
    val good = TradeGen.trades(spark, 2L)
    topic.publish(Topics.envelope(good, "trade_id"))
    topic.publish(Seq(
      ("k3", "{not json at all"),
      ("k4", """{"trade_id":"t4","price":1.0}""")).toDF("key", "value"))
    val q = IngestJob.start(spark, topic, s"$work/table",
      AnalyticsPipeline.tradeSchema,
      Seq("trade_id", "symbol", "price"), "ts_event", s"$work/ckpt",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    assert(IngestJob.readTable(spark, s"$work/table").count() == 2L)
    // reject count recorded in the snapshot log
    val log = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$work/table/_snapshots.jsonl"))
    assert(log.contains("\"rejects\":2"))
  }

  test("key_value mode: raw key/value blobs land verbatim with exactly-once commits") {
    val work = tmpDir("graft-kv")
    val topic = FileTopic(s"$work/topic")
    import spark.implicits._
    val rows = (1 to 50).map(i => (s"k$i", s"""{"payload":$i}"""))
    topic.publish(rows.toDF("key", "value"))
    val q = IngestJob.startKeyValue(spark, topic, s"$work/table", s"$work/ckpt",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    val got = IngestJob.readTable(spark, s"$work/table")
    // raw BLOB columns, no decode applied
    assert(got.schema("key").dataType == org.apache.spark.sql.types.BinaryType)
    assert(got.schema("value").dataType == org.apache.spark.sql.types.BinaryType)
    val back = got.collect().map(r => (
      new String(r.getAs[Array[Byte]]("key"), "UTF-8"),
      new String(r.getAs[Array[Byte]]("value"), "UTF-8"))).toSet
    assert(back == rows.toSet)
    assert(IngestJob.committedBatches(s"$work/table").nonEmpty)
  }

  test("avro schema-id-prefix mode: per-id decode, mixed versions mid-batch, junk rejected") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val work = tmpDir("graft-avro")
    val topic = FileTopic(s"$work/topic")
    val registry = SchemaRegistry(s"$work/registry")
    val v1 = StructType(Seq(
      StructField("trade_id", LongType, nullable = false),
      StructField("symbol", StringType, nullable = false),
      StructField("price", DoubleType, nullable = false),
      StructField("ts_event", TimestampType, nullable = false)))
    val id1 = registry.register("trades", v1)
    val v2 = StructType(v1.fields.toIndexedSeq :+ StructField("venue", StringType, nullable = true))
    val id2 = registry.register("trades", v2)
    val av1 = AvroCodec.avroSchema("trades", v1)
    val av2 = AvroCodec.avroSchema("trades", v2)
    def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
    val ts = java.sql.Timestamp.valueOf("2026-01-02 03:04:05.123456")

    val rows1 = (1 to 30).map(i =>
      (s"k$i", b64(AvroCodec.encode(Row(i.toLong, "AAPL", 100.5, ts), v1, av1, id1))))
    val rows2 = (31 to 50).map(i =>
      (s"k$i", b64(AvroCodec.encode(Row(i.toLong, "MSFT", 200.25, ts, "NYSE"), v2, av2, id2))))
    val junk = Seq(
      ("bad-magic", b64(Array[Byte](9, 9, 9, 9, 9, 9))),
      ("bad-id", b64(AvroCodec.encode(Row(99L, "X", 1.0, ts), v1, av1, 99))))
    import spark.implicits._
    topic.publish((rows1 ++ rows2 ++ junk).toDF("key", "value"))

    val q = IngestJob.startAvroWithRegistry(spark, topic, s"$work/table",
      registry, "trades", Seq("trade_id", "symbol"), "ts_event", s"$work/ckpt",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()

    val got = IngestJob.readTable(spark, s"$work/table")
    assert(got.count() == 50L)
    // v1 rows read null for the v2-only column; v2 rows carry it
    assert(got.filter(col("venue").isNull).count() == 30L)
    assert(got.filter(col("venue") === "NYSE").count() == 20L)
    // value fidelity incl. microsecond timestamps through the avro long
    val r1 = got.filter(col("trade_id") === 1L).collect().head
    assert(r1.getAs[String]("symbol") == "AAPL" && r1.getAs[Double]("price") == 100.5)
    assert(r1.getAs[java.sql.Timestamp]("ts_event") == ts)
    // junk (wrong magic / unregistered id) → reject count, not rows
    val log = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$work/table/_snapshots.jsonl"))
    assert(log.contains("\"rejects\":2"), log)
  }
}
