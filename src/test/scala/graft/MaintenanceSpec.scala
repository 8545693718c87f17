package graft

import org.apache.spark.sql.streaming.Trigger
import graft.streaming._

/** Small-file compaction + snapshot expiry over the ingest table. */
class MaintenanceSpec extends SparkSpec {

  private def ingestOnce(work: String, n: Long): Unit = {
    val topic = FileTopic(s"$work/topic")
    TradeGen.produce(spark, topic, n)
    val q = IngestJob.start(spark, topic, s"$work/table",
      AnalyticsPipeline.tradeSchema,
      Seq("trade_id", "symbol"), "ts_event", s"$work/ckpt", Trigger.AvailableNow())
    q.awaitTermination()
  }

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    if (!d.exists) Seq.empty
    else {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      walk(d)
    }
  }

  test("compaction: one consolidated snapshot, same rows, fewer files, time travel intact") {
    val work = tmpDir("graft-compact")
    ingestOnce(work, 100); ingestOnce(work, 50); ingestOnce(work, 50)
    val table = s"$work/table"
    assert(IngestJob.committedBatches(table) == Set(0L, 1L, 2L))

    val before = IngestJob.readTable(spark, table)
      .collect().map(_.toSeq).toSet
    val filesBefore = parquetFiles(s"$table/data").size

    val cid = Maintenance.CompactionIdBase
    val stats = Maintenance.compact(spark, table).get
    assert(stats.newBatch == cid && stats.replaced == Seq(0L, 1L, 2L))
    assert(stats.rowsRewritten == 200L)
    assert(Maintenance.visibleBatches(table) == Set(cid))

    // readers flip atomically: same rows, no duplicates
    val after = IngestJob.readTable(spark, table).collect().map(_.toSeq).toSet
    assert(after == before)
    // consolidated: fewer live data files than the 3-snapshot layout
    val live = parquetFiles(s"$table/data/batch=$cid").size
    assert(live < filesBefore, s"expected <$filesBefore files, got $live")

    // time travel: pre-compaction snapshots still resolve from original dirs
    assert(IngestJob.readTableAsOf(spark, table, 0L).count() == 100L)
    assert(IngestJob.readTableAsOf(spark, table, 1L).count() == 150L)
    // as-of the compaction snapshot = current state, not doubled
    assert(IngestJob.readTableAsOf(spark, table, cid).count() == 200L)

    // a second run is a no-op: only one visible snapshot remains
    assert(Maintenance.compact(spark, table).isEmpty)

    // expiry physically removes the replaced dirs; current reads unaffected
    assert(Maintenance.expireSnapshots(table) == Seq(0L, 1L, 2L))
    assert(!new java.io.File(s"$table/data/batch=0").exists)
    assert(IngestJob.readTable(spark, table).count() == 200L)
  }

  test("mergeInto: copy-on-write upsert updates matched keys, inserts new ones") {
    import spark.implicits._
    val work = tmpDir("graft-merge")
    ingestOnce(work, 100)
    val table = s"$work/table"
    val before = IngestJob.readTable(spark, table)
    val cols = before.columns
    // 2 updates of existing trade_ids with a sentinel price + 2 brand-new ids
    import org.apache.spark.sql.functions.{concat, lit}
    val ids = before.select("trade_id").as[String].orderBy("trade_id").take(2).toSeq
    val upd = before.filter($"trade_id".isin(ids: _*)).withColumn("price", lit(9999.0))
    val ins = before.filter($"trade_id".isin(ids: _*))
      .withColumn("trade_id", concat($"trade_id", lit("-NEW")))
      .withColumn("price", lit(1234.0))
    val updates = upd.unionByName(ins)
      .select(cols.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)

    val stats = Maintenance.mergeInto(spark, table, updates, "trade_id", "ts_event")
    assert(stats.rowsRewritten == 102L) // 100 - 2 matched + 4 upserts

    val after = IngestJob.readTable(spark, table)
    assert(after.count() == 102L)
    // matched keys carry the updated price, inserted keys the new one
    assert(after.filter($"price" === 9999.0).select("trade_id").as[String]
      .collect().sorted.toSeq == ids.sorted)
    assert(after.filter($"price" === 1234.0).select("trade_id").as[String]
      .collect().sorted.toSeq == ids.map(_ + "-NEW").sorted)
    // time travel sees the pre-merge table
    assert(IngestJob.readTableAsOf(spark, table, 0L).count() == 100L)
    assert(IngestJob.readTableAsOf(spark, table, 0L)
      .filter($"price" === 9999.0).count() == 0L)
  }

  test("torn compaction write is invisible and the retry commits cleanly") {
    val work = tmpDir("graft-torn")
    ingestOnce(work, 60); ingestOnce(work, 60)
    val table = s"$work/table"
    val cid = Maintenance.CompactionIdBase
    // simulate a compactor crash AFTER the data write but BEFORE the log
    // append: fabricate a data dir under the compaction id with bogus rows
    val orphan = new java.io.File(s"$table/data/batch=$cid/p_date=2020-01-01")
    orphan.mkdirs()
    IngestJob.readTable(spark, table).limit(7).write.mode("overwrite")
      .parquet(orphan.toString)
    // not in the log -> not visible
    assert(IngestJob.readTable(spark, table).count() == 120L)
    assert(Maintenance.visibleBatches(table) == Set(0L, 1L))
    // the retried compaction overwrites the torn dir and commits atomically
    val stats = Maintenance.compact(spark, table).get
    assert(stats.newBatch == cid && stats.rowsRewritten == 120L)
    assert(IngestJob.readTable(spark, table).count() == 120L)
  }

  test("ingest after compaction: no id collision, no dropped batch") {
    val work = tmpDir("graft-compact2")
    ingestOnce(work, 40); ingestOnce(work, 40)
    val table = s"$work/table"
    val cid = Maintenance.CompactionIdBase
    assert(Maintenance.compact(spark, table).get.newBatch == cid)
    // the stream checkpoint's next batch id is 2 — it must NOT collide with
    // the compaction snapshot (disjoint id ranges), or the exactly-once
    // guard would silently drop these 20 rows
    ingestOnce(work, 20)
    assert(Maintenance.visibleBatches(table) == Set(cid, 2L))
    assert(IngestJob.readTable(spark, table).count() == 100L)
    // lineage as-of: ingest batch 2 commits AFTER the compaction
    assert(IngestJob.readTableAsOf(spark, table, 2L).count() == 100L)
    assert(IngestJob.readTableAsOf(spark, table, cid).count() == 80L)
  }
}
