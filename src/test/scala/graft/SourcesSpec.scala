package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** DataSource V2 connector tests (sources/CommitLogSource): short-name
  * registration, row parity with Maintenance.commits, the lineage
  * visibility fold, column pruning reaching the reader, and SQL over the
  * registered view. The log fixture is written in the library's own
  * `_snapshots.jsonl` format (the contract `Maintenance.commits` parses —
  * the same lines `IngestJob`/`Maintenance` append in production). */
class SourcesSpec extends SparkSpec {

  private def writeLog(dir: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "_snapshots.jsonl"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  private val fixture = Seq(
    """{"batch":0}""",
    """{"batch":1}""",
    """{"batch":1000000000000,"compacts":[0, 1]}""",
    """{"batch":2}""",
    """{"batch":1000000000001,"deleteKey":"user_id"}""")

  test("graft-commits: short-name load matches Maintenance.commits with the visibility fold") {
    val dir = tmpDir("dsv2")
    writeLog(dir, fixture)
    val rows = spark.read.format("graft-commits").load(dir)
      .orderBy(col("seq_pos")).collect()
    val expected = streaming.Maintenance.commits(dir)
    assert(rows.length == expected.length && rows.length == 5)
    rows.zip(expected).zipWithIndex.foreach { case ((r, c), i) =>
      assert(r.getInt(0) == i && r.getLong(1) == c.id)
      assert(r.getSeq[Long](3) == c.compacts)
      assert(Option(r.getString(4)) == c.deleteKey)
    }
    val kinds = rows.map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(kinds(0L) == "ingest" && kinds(1000000000000L) == "compaction" &&
      kinds(1000000000001L) == "merge")
    val vis = rows.map(r => r.getLong(1) -> r.getBoolean(6)).toMap
    assert(!vis(0L) && !vis(1L), "compacted-away batches are not visible")
    assert(vis(1000000000000L) && vis(2L) && vis(1000000000001L))
  }

  test("graft-commits: column pruning reaches the reader and SQL works over the view") {
    val dir = tmpDir("dsv2p")
    writeLog(dir, fixture)
    val df = spark.read.format("graft-commits").load(dir)
    val pruned = df.select(col("snapshot_id"))
    // the optimized scan must carry only the requested column
    val scanSchema = pruned.queryExecution.executedPlan.collectLeaves()
      .head.schema.fieldNames.toSeq
    assert(scanSchema == Seq("snapshot_id"), s"pruned scan schema: $scanSchema")
    df.createOrReplaceTempView("snapshots_v")
    val n = spark.sql(
      "SELECT COUNT(*) FROM snapshots_v WHERE kind = 'ingest' AND is_visible").head.getLong(0)
    assert(n == 1L, "only batch 2 is a visible ingest commit")
  }

  test("graft-commits: micro-batch stream tails the log exactly-once across appends") {
    val dir = tmpDir("dsv2s")
    writeLog(dir, fixture.take(2))
    val q = spark.readStream.format("graft-commits").load(dir)
      .writeStream.format("memory").queryName("commit_feed")
      .option("checkpointLocation", tmpDir("dsv2sc")).start()
    q.processAllAvailable()
    assert(spark.table("commit_feed").count() == 2L)
    // append the compaction + two more commits; only the NEW lines emit
    writeLog(dir, fixture)
    q.processAllAvailable()
    val rows = spark.table("commit_feed").orderBy(col("seq_pos")).collect()
    q.stop()
    assert(rows.length == 5, s"no duplicates, no gaps: ${rows.length}")
    assert(rows.map(_.getInt(0)).toSeq == (0 until 5), "lineage positions in order")
    // visibility is as-of the emitting micro-batch: batch 0 was visible
    // when first emitted (before the compaction line existed)
    assert(rows.head.getBoolean(6), "batch 0 emitted before the compaction, visible then")
  }

  test("graft-commits: empty table dir yields an empty relation, missing path fails loudly") {
    val dir = tmpDir("dsv2e")
    assert(spark.read.format("graft-commits").load(dir).count() == 0L)
    intercept[Exception] {
      spark.read.format("graft-commits").load().count()
    }
  }
}
