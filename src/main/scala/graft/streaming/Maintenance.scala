package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table maintenance for the ingest table: small-file compaction + snapshot
  * expiry (the role Iceberg's `rewrite_data_files` / `expire_snapshots`
  * actions play for the reference's translator-written tables — every
  * 10 s trigger commits a snapshot (`redpanda/redpanda.yaml:11`), so a
  * day-old table holds thousands of tiny parquet files and a scan pays one
  * task + one footer-read per file).
  *
  * Log design: a compaction appends a normal commit line whose `compacts`
  * field lists the batch ids it replaces. Visibility = committed − replaced,
  * so readers atomically flip from the small files to the compacted file the
  * moment the line lands (crash before the append ⇒ the new data dir is
  * simply invisible and the next run overwrites it — same idempotent-write +
  * commit-log protocol as the ingest itself).
  *
  * Time travel: `readTableAsOf(b)` only looks at batches ≤ b, and a
  * compacted batch id is always > its inputs, so as-of reads keep resolving
  * against the ORIGINAL snapshot dirs until `expireSnapshots` physically
  * deletes them (exactly Iceberg's rewrite-then-expire contract).
  *
  * Single-writer assumption (as in the reference: the datalake translator is
  * the topic's only committer): run maintenance from the table's owner, not
  * concurrently with another compactor.
  */
object Maintenance {
  case class CompactionStats(newBatch: Long, replaced: Seq[Long], rowsRewritten: Long)

  /** Compaction snapshot ids live in a disjoint high range: the streaming
    * checkpoint's batch counter owns the low range, and an id collision
    * would make the ingest guard silently skip a real data batch (or write
    * into the compaction's data dir). */
  val CompactionIdBase = 1000000000000L

  /** The snapshot log in APPEND ORDER: (snapshot id, batches it replaced —
    * empty for ingest commits). As-of reads replay this lineage; snapshot
    * ids are NOT wall-clock ordered across ingest and maintenance. */
  def lineage(tableDir: String): Seq[(Long, Seq[Long])] = {
    val log = Paths.get(tableDir, "_snapshots.jsonl")
    if (!Files.exists(log)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val idRe = "\"batch\":(\\d+)".r
      val compRe = "\"compacts\":\\[([0-9, ]*)\\]".r
      Files.readAllLines(log).asScala.toSeq.flatMap { line =>
        idRe.findFirstMatchIn(line).map { m =>
          m.group(1).toLong -> compRe.findFirstMatchIn(line).toSeq.flatMap(
            _.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong))
        }
      }
    }
  }

  /** compaction snapshot id → the batch ids it replaced. */
  def compactionLog(tableDir: String): Map[Long, Seq[Long]] =
    lineage(tableDir).filter(_._2.nonEmpty).toMap

  /** Batch ids replaced by some committed compaction. */
  def replacedBatches(tableDir: String): Set[Long] =
    compactionLog(tableDir).values.flatten.toSet

  /** Currently visible batch ids: committed minus compacted-away. */
  def visibleBatches(tableDir: String): Set[Long] =
    IngestJob.committedBatches(tableDir) -- replacedBatches(tableDir)

  private def dirSize(p: java.nio.file.Path): Long = {
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
      finally s.close()
    }
  }

  /** Rewrite all visible batches whose data dir is smaller than
    * `smallBytes` into ONE new consolidated snapshot with ~`targetBytes`
    * files, preserving the p_date partitioning. No-op (None) unless at
    * least two small snapshots exist. The read+write is a distributed
    * Spark job — at 100 TB scale this is the same shape as an Iceberg
    * rewrite action: scan the small files cluster-wide, repartition to
    * target file count, one atomic commit. */
  def compact(
      spark: SparkSession,
      tableDir: String,
      smallBytes: Long = 32L << 20,
      targetBytes: Long = 128L << 20): Option[CompactionStats] = {
    val committed = IngestJob.committedBatches(tableDir)
    if (committed.isEmpty) return None
    val candidates = visibleBatches(tableDir).toSeq.sorted
      .filter(b => dirSize(Paths.get(s"$tableDir/data/batch=$b")) < smallBytes)
    if (candidates.size < 2) return None

    val newId = math.max(CompactionIdBase, committed.max + 1)
    val totalBytes = candidates.map(b => dirSize(Paths.get(s"$tableDir/data/batch=$b"))).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read
      .option("basePath", s"$tableDir/data")
      .option("mergeSchema", "true")
      .parquet(candidates.map(b => s"$tableDir/data/batch=$b"): _*)
    val rows = df.drop("batch")
      .repartition(nFiles, col("p_date"))
    rows.write.mode("overwrite").partitionBy("p_date")
      .parquet(s"$tableDir/data/batch=$newId")
    val n = spark.read.parquet(s"$tableDir/data/batch=$newId").count()
    val line = s"""{"batch":$newId,"rows":$n,"rejects":0,"committed":true,""" +
      s""""compacts":[${candidates.mkString(",")}]}""" + "\n"
    Files.write(Paths.get(tableDir, "_snapshots.jsonl"), line.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    Some(CompactionStats(newId, candidates, n))
  }

  /** Copy-on-write MERGE (Iceberg `MERGE INTO … WHEN MATCHED THEN UPDATE
    * WHEN NOT MATCHED THEN INSERT` analog): upsert `updates` into the table
    * by `key`. The new snapshot is (current rows whose key has no update) ∪
    * updates, committed as a replacement of every previously visible
    * snapshot — the same atomic log protocol as compaction, so readers flip
    * in one commit and time travel to the pre-merge state keeps working.
    *
    * Scale note: this rewrites the whole visible table, which is COW
    * semantics at its bluntest. At 100 TB an engine scopes the rewrite to
    * the partitions that contain matched keys (file-level manifests) or
    * defers it with merge-on-read delete files; the commit protocol here is
    * identical either way, and the anti-join that computes surviving rows
    * is the same distributed shape (update keys broadcast when small). */
  def mergeInto(
      spark: SparkSession,
      tableDir: String,
      updates: org.apache.spark.sql.DataFrame,
      key: String,
      tsCol: String): CompactionStats = {
    val visible = visibleBatches(tableDir).toSeq.sorted
    require(visible.nonEmpty, s"mergeInto: no visible snapshots in $tableDir")
    val current = IngestJob.readTable(spark, tableDir)
    val merged = current
      .join(updates.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates.select(current.columns.map(col).toIndexedSeq: _*))
    val newId = math.max(CompactionIdBase, IngestJob.committedBatches(tableDir).max + 1)
    merged.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite").partitionBy("p_date")
      .parquet(s"$tableDir/data/batch=$newId")
    val n = spark.read.parquet(s"$tableDir/data/batch=$newId").count()
    val line = s"""{"batch":$newId,"rows":$n,"rejects":0,"committed":true,""" +
      s""""compacts":[${visible.mkString(",")}]}""" + "\n"
    Files.write(Paths.get(tableDir, "_snapshots.jsonl"), line.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    CompactionStats(newId, visible, n)
  }

  /** Physically delete the data dirs of compacted-away snapshots (ends
    * time travel to them — run on a retention schedule, as with Iceberg's
    * expire_snapshots). Returns the deleted batch ids. */
  def expireSnapshots(tableDir: String): Seq[Long] = {
    val dead = replacedBatches(tableDir).toSeq.sorted
    dead.filter { b =>
      val dir = Paths.get(s"$tableDir/data/batch=$b")
      if (!Files.exists(dir)) false
      else {
        val s = Files.walk(dir)
        val all = try s.sorted(java.util.Comparator.reverseOrder()).toArray(new Array[java.nio.file.Path](_))
        finally s.close()
        all.foreach(Files.deleteIfExists(_))
        true
      }
    }
  }
}
