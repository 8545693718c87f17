package graft

import java.sql.Timestamp
import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming._
import graft.operators.StreamReplayQueries

/** Round-16 replay-faithfulness tests (VERDICT r15 #1): each x176–x180
  * batch-replay key must emit exactly what the STREAMED operator emits
  * trigger by trigger on the same data in the same arrival order — the
  * property that makes the DuckDB hash-check of the replay a check of the
  * streaming op itself. */
/** x183 planted-event row (top-level: Encoder derivation needs a stable
  * Product type, not a method-local class). */
case class Ev183(event_id: Long, ts: Timestamp, dk: Long)

class StreamReplaySpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: SQLContext = spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("x176: replay decomposition equals streamed curateDocs trigger by trigger") {
    // Planted corpus, batch = doc_id % 3: gate failures (token floor,
    // stopword floor), PII scrub, and CROSS-batch canonical dups.
    val good = "the quick brown fox jumps over the lazy dog in a sunny field today"
    val pii = "contact the admin on alice@example.com about the delayed shipment of parts"
    val other = "a completely different document with plenty of the required tokens in it"
    val docs = Seq(
      (0L, "en", good),
      (3L, "en", "too short"), // fails the 10-token floor
      (6L, "en", pii),
      (9L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      // ^ 12 tokens, zero stopwords — fails the 0.05 stop-ratio floor
      (1L, "en", "The QUICK brown fox, jumps over the lazy dog in a sunny field today!"),
      // ^ batch 1: canonical dup of doc 0 (batch 0) — must be dropped
      (4L, "en", other),
      (2L, "en", other.toUpperCase), // batch 2: canonical dup of doc 4 (batch 1)
      (5L, "en", "the third kept document is here with its own set of many fine tokens"))
    val byBatch = docs.groupBy(_._1 % 3)

    val input = MemoryStream[Doc]
    val q = StreamOps.curateDocs(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("curate176").outputMode("append").start()
    var seen = Set.empty[(Long, Long, Long)]
    val emitted = (0L until 3L).flatMap { b =>
      input.addData(byBatch.getOrElse(b, Nil).sortBy(_._1)
        .map { case (id, lang, text) => Doc(id, ts(id.toInt), lang, text) })
      q.processAllAvailable()
      val cum = spark.table("curate176").select("doc_id", "n_chars", "canon_h")
        .as[(Long, Long, Long)].collect().toSet
      val fresh = (cum -- seen).map(t => (b, t._1, t._2, t._3))
      seen = cum
      fresh
    }.toSet
    q.stop()

    val replay = StreamReplayQueries
      .curateReplay(docs.toDF("doc_id", "lang", "text"), 3)
      .select("batch_id", "doc_id", "n_chars", "canon_h")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(replay == emitted,
      s"replay decomposition diverged from the streamed emissions:\n$replay\nvs\n$emitted")
    // the dedup actually fired: dups 1 and 2 dropped, gate dropped 3 and 9
    assert(replay.map(_._2) == Set(0L, 6L, 4L, 5L))
  }

  test("x183: replay equals the real dropDuplicatesWithinWatermark late-drop + dedup per trigger") {
    // Planted arrival plan (delay 10 min; ONE row per dk per batch so the
    // real op's within-batch keep choice is never ambiguous):
    //   b0: e0(t0,dk0) e1(t30,dk1) e2(t40,dk2)        -> watermark 30
    //   b1: e3(t5,dk3)  LATE (5 < 30)
    //       e4(t35,dk1) dup of e1 (state alive: 30 < 30+10)
    //       e5(t50,dk3) EMITS — e3 was late-dropped BEFORE dedup, so dk3
    //                   never created state (the contract under test)
    //       e6(t41,dk4) emit                           -> watermark 40
    //   b2: e7(t39,dk5) LATE (39 < 40)
    //       e8(t45,dk2) dup of e2
    //       e9(t60,dk6) emit
    val plan = Seq( // (batch, event_id, minute, dk)
      (0L, 0L, 0, 0L), (0L, 1L, 30, 1L), (0L, 2L, 40, 2L),
      (1L, 3L, 5, 3L), (1L, 4L, 35, 1L), (1L, 5L, 50, 3L), (1L, 6L, 41, 4L),
      (2L, 7L, 39, 5L), (2L, 8L, 45, 2L), (2L, 9L, 60, 6L))

    val input = MemoryStream[Ev183]
    val q = input.toDF().withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("dk")
      .writeStream.format("memory").queryName("late183").outputMode("append").start()
    var seen = Set.empty[Long]
    val emitted = (0L until 3L).flatMap { b =>
      input.addData(plan.filter(_._1 == b).sortBy(_._2)
        .map { case (_, id, m, dk) => Ev183(id, ts(m), dk) })
      q.processAllAvailable()
      val cum = spark.table("late183").select("event_id").as[Long].collect().toSet
      val fresh = (cum -- seen).map(id => (b, id))
      seen = cum
      fresh
    }.toSet
    q.stop()
    assert(emitted == Set((0L, 0L), (0L, 1L), (0L, 2L), (1L, 5L), (1L, 6L), (2L, 9L)),
      s"real-stream emissions off: $emitted")

    val arr = plan.map { case (b, id, m, dk) => (id, ts(m), b, dk) }
      .toDF("event_id", "ts", "batch_id", "dk")
    val replay = StreamReplayQueries.lateDropReplay(arr, 10)
      .select("batch_id", "event_id", "disposition")
      .as[(Long, Long, String)].collect().toSet
    assert(replay.filter(_._3 == "emit").map(t => (t._1, t._2)) == emitted,
      s"replay emissions diverge from the streamed op: $replay")
    assert(replay.filter(_._3 == "late").map(_._2) == Set(3L, 7L),
      s"late set off: $replay")
    assert(replay.filter(_._3 == "dup").map(_._2) == Set(4L, 8L),
      s"dup set off: $replay")
  }

  test("x177: replay rows are exactly the x59 scores tagged with the arrival batch") {
    val base = SparkEntry.queries("x59_dsir_weights")(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_toks"), col("imp_weight"))
      .as[(Long, String, Long, Double)].collect().toSet
    val replay = StreamReplayQueries.x177(spark, sfDir)
      .as[(Long, Long, String, Long, Double)].collect()
    assert(replay.forall(r => r._1 == r._2 % 3), "batch tag must be doc_id % 3")
    assert(replay.map(r => (r._2, r._3, r._4, r._5)).toSet == base,
      "per-batch scoring must equal whole-corpus scoring (per-doc chain)")
  }

  test("x178: the replay's fold algebra equals the real cdcApply MOR state per trigger") {
    val work = tmpDir("cdcreplay")
    val topic = FileTopic(s"$work/topic")
    TradeGen.produce(spark, topic, 40, 3L)
    IngestJob.start(spark, topic, s"$work/table", AnalyticsPipeline.tradeSchema,
      Seq("trade_id", "symbol"), "ts_event", s"$work/ckpt", Trigger.AvailableNow())
      .awaitTermination()
    val table = s"$work/table"
    val ids = IngestJob.readTable(spark, table)
      .select("trade_id").as[String].collect().sorted.take(3).toSeq
    def cts(m: Int) = Timestamp.valueOf(f"2030-01-01 10:$m%02d:00")
    val batches = Seq(
      Seq(CdcTrade(ids(0), "ZZZ", 11.0, 1, "buy", cts(1), "", "U"),
        CdcTrade("NEW-1", "ZZZ", 22.0, 1, "buy", cts(1), "", "I"),
        CdcTrade(ids(1), "ZZZ", 1.0, 1, "buy", cts(1), "", "U"),
        CdcTrade(ids(1), "ZZZ", 2.0, 1, "buy", cts(2), "", "D")), // in-batch D after U
      Seq(CdcTrade(ids(0), "ZZZ", 33.0, 1, "buy", cts(3), "", "U"), // upsert-over-upsert
        CdcTrade("NEW-1", "ZZZ", 0.0, 1, "buy", cts(3), "", "D"),
        CdcTrade(ids(2), "ZZZ", 44.0, 1, "buy", cts(3), "", "U")),
      Seq(CdcTrade(ids(1), "ZZZ", 55.0, 1, "buy", cts(4), "", "U"), // recreate after D
        CdcTrade(ids(2), "ZZZ", 0.0, 1, "buy", cts(4), "", "D")))

    val input = MemoryStream[CdcTrade]
    val q = StreamOps.cdcApply(input.toDF(), table, "trade_id", "ts_event")
      .option("checkpointLocation", s"$work/cdcckpt").start()
    var fold = IngestJob.readTable(spark, table).select(col("trade_id"), col("price"))
    batches.foreach { b =>
      input.addData(b)
      q.processAllAvailable()
      // the x178 fold: trigger-body latest-wins + the MOR visible-state algebra
      val (ups, tombs) = StreamOps.cdcLatestWins(b.toDF(), "trade_id", "ts_event", "op")
      val touched = ups.select(col("trade_id")).unionAll(tombs).distinct()
      fold = ups.select(col("trade_id"), col("price"))
        .unionAll(fold.join(touched, Seq("trade_id"), "left_anti"))
      val real = IngestJob.readTable(spark, table).select("trade_id", "price")
        .as[(String, Double)].collect().toSet
      val folded = fold.as[(String, Double)].collect().toSet
      assert(folded == real,
        s"fold diverged from the committed MOR state:\n$folded\nvs\n$real")
    }
    q.stop()
  }

  test("x179: replay equals the streamed maintained view after every trigger") {
    val batchRows = operators.IvmQueries.ivmDeltaBatches(spark, sfDir)
      .map(_.select("g", "dn", "ds").as[(String, Long, Long)].collect().toSeq
        .map { case (g, dn, ds) => ViewDelta(g, dn, ds) })
    val expect = StreamReplayQueries.x179(spark, sfDir)
      .as[(Long, String, Long, Double)].collect()
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(r => (r._2, r._3, r._4)).toSet }

    val input = MemoryStream[ViewDelta]
    val q = StreamOps.maintainAggView(input.toDF())
      .writeStream.format("memory").queryName("ivm179").outputMode("complete").start()
    batchRows.zipWithIndex.foreach { case (rows, b) =>
      input.addData(rows)
      q.processAllAvailable()
      val view = spark.table("ivm179").filter(col("n_orders") > 0)
        .select(col("g"), col("n_orders"),
          Tables.fround(col("sc") / 100.0, 2).as("sum_price"))
        .as[(String, Long, Double)].collect().toSet
      assert(view == expect(b.toLong),
        s"trigger $b: streamed view != replay prefix:\n$view\nvs\n${expect(b.toLong)}")
    }
    q.stop()
  }

  test("x180: the drift monitor flags exactly the drifted micro-batch") {
    val rows = StreamReplayQueries.x180(spark, sfDir)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.length == 3)
    assert(rows.forall(_._2 > 0))
    // batches 0/1 are same-distribution samples; batch 2 is hit by x116's
    // drifted-snapshot predicate (upper quantity bins gutted) and must flag
    assert(!rows(0)._4 && !rows(1)._4, s"clean batches must not flag: ${rows.toSeq}")
    assert(rows(2)._4 && rows(2)._3 > 0.4, s"drifted batch must flag: ${rows.toSeq}")
  }
}
