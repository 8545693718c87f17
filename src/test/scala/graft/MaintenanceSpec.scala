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
