package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Event row for streaming ops (mirrors testdata `events`). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Document row for streaming curation ops (testdata `documents` columns
  * plus the ingest event time the dedup watermark rides on). */
case class Doc(doc_id: Long, ts: Timestamp, lang: String, text: String)

/** Signed view delta (E117 streaming IVM): group, count delta, sum delta. */
case class ViewDelta(g: String, dn: Long, ds: Long)

/** Document row with a source stratum (E70 stream-static scoring). */
case class SrcDoc(doc_id: Long, ts: Timestamp, source: String, text: String)

/** CDC change record over the trade table (E102): full row + op (I/U/D). */
case class CdcTrade(trade_id: String, symbol: String, price: Double, qty: Int,
    side: String, ts_event: Timestamp, notes: String, op: String)

case class UserRunningCount(user_id: Long, n: Long, total_value: Double)

/** E23–E28 — streaming semantics (SURVEY §2.2). Each op takes a streaming
  * (or batch — same expressions work in both: that equivalence is the test)
  * DataFrame/Dataset and returns the transformed one; the caller owns
  * writeStream/trigger/checkpoint.
  *
  * Watermark-bounded state (SURVEY §7 risk 6): every stateful op here bounds
  * its state by watermark (windows, dedup) or explicit timeout (running
  * counts) — at 100 TB, unbounded keyed state is what kills a streaming job.
  */
object StreamOps {

  /** E23 — tumbling event-time window with watermark-dropped late data. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sv"))

  /** E24 — sliding window. */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** E25 — session window (30-minute gap). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n"))

  /** E26 — stream-stream interval join: pair each left event with right
    * events for the same key within `[l.ts, l.ts + within]`.
    *
    * Both sides carry watermarks and the join condition bounds event time in
    * BOTH directions — that is what lets Spark evict buffered state: a left
    * row older than (right watermark − within) can never match again and is
    * dropped. Without the time bound the state store grows with the full
    * history of both streams — the 100 TB streaming killer. Keys shuffle
    * both sides to the same partition, so the match is local per key.
    *
    * Output columns: key, l_ts, r_ts + renamed payloads (caller projects). */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      within: String = "10 minutes",
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r,
      expr(s"l.$key = r.$key AND r.ts >= l.ts AND r.ts <= l.ts + interval $within"),
      joinType) // leftOuter: unmatched left rows emit null-padded once the
                // watermark proves no match can still arrive
      .select(col(s"l.$key").as(key), col("l.ts").as("l_ts"), col("r.ts").as("r_ts"),
        col("l.value").as("l_value"), col("r.value").as("r_value"))
  }

  /** E27 — streaming dedup on event_id; watermark bounds the dedup state to
    * the lateness horizon (without it, state grows forever). */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** E27b — dedup with EXPLICIT state eviction:
    * `dropDuplicatesWithinWatermark` guarantees removal of a key's state
    * once the watermark passes its event time + delay, whereas plain
    * dropDuplicates only evicts when the event-time column is part of the
    * key set. This is the API a 100 TB stream wants: duplicates arrive
    * within the delivery-retry horizon, not arbitrarily late, so state is
    * strictly bounded by (keys seen within the watermark window). */
  def dedupEventsWithinWatermark(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** E27c — normalization-aware streaming dedup: dedup-on-ingest, the
    * continuous form of x36 + x40. Key = h60 of the x36 canonical form
    * (lowercase / punct→space / ws collapse / stopword strip), so case,
    * punctuation and stopword variants of a document collapse to one kept
    * copy ACROSS micro-batches, not just within one. State is bounded the
    * E27b way: at 100 TB/day the store holds only the 8-byte canon-hash
    * keys seen within the delivery-retry horizon — never the text, which
    * stays out of both the state store and the exchange. */
  def dedupDocsCanonical(docs: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("canon_h", canonKey(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("canon_h")

  /** The E27c dedup key — h60 of the x36 canonical form. Shared with the
    * x176 batch-replay twin so the replayed dedup hashes the byte-identical
    * key the state store would have held. */
  def canonKey(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.Tables.h60(
      array_join(graft.operators.TextQueries.canonToks(text), " "))

  /** E68 — streaming curation stage: the map-only curation chain as ONE
    * ingest-time transform — quality floor (x30's stop-ratio/token-count
    * predicate) → PII scrub (x46's replace chain, shipped text is the
    * scrubbed text with n_chars recomputed) → canonical dedup within the
    * watermark horizon (E27c on the SCRUBBED text). Curate-on-ingest is
    * how a 100 TB/day pipeline avoids re-reading the firehose: every stage
    * here is a per-row expression or watermark-bounded state, so the
    * composition is exactly as scalable as its parts — no corpus-wide
    * statistics (those stages — x78's df, x58's LM — stay batch, run over
    * the already-curated store).
    *
    * Batch-parity: applied to a static frame (minus the dedup), the gate +
    * scrub produce byte-identical rows to CurationDemo's stages 2+5 —
    * asserted in StreamingSpec. */
  def curateDocs(docs: DataFrame, minStopRatio: Double = 0.05,
      minTokens: Long = 10, watermark: String = "10 minutes"): DataFrame =
    dedupDocsCanonical(curateGateScrub(docs, minStopRatio, minTokens), watermark)

  /** The map-only half of [[curateDocs]] — quality gate on the RAW text,
    * then PII scrub (text column replaced, n_chars recomputed). Extracted
    * so the x176 batch-replay twin runs the byte-identical expressions the
    * streaming stage ships; the dedup half is replayed separately (its
    * first-arrival-wins semantics need the batch order made explicit). */
  def curateGateScrub(docs: DataFrame, minStopRatio: Double = 0.05,
      minTokens: Long = 10): DataFrame = {
    import graft.operators.TextQueries
    docs
      .filter(TextQueries.tokenCountCol(col("text")) >= minTokens &&
        TextQueries.stopRatioCol(col("text")) >= minStopRatio)
      // x46's ONE-PASS codegen scanner (r16 — the serial 4-regex chain
      // cost 18 s of x176's sf10 replay; the scanner is contract-identical
      // to the piiPatterns regex fold, differentially spec'd in CurationSpec)
      .withColumn("text",
        graft.functions.PiiExprs.piiScrubScan(col("text")).getField("scrubbed"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** E70 — stream-static enrichment: score an incoming doc stream against
    * a STATIC model table (x59's fitted 256-row bucket-ratio frame — or
    * any dimension). The static side is re-resolved per micro-batch and
    * broadcast into the join, the canonical Spark enrichment pattern; the
    * scoring chain is LmQueries.dsirScore VERBATIM, so a doc scored on the
    * stream carries the same imp_weight the batch x59 computes (asserted
    * stream-equals-batch in StreamingSpec). At 100 TB/day: the model is
    * fit in batch over the curated store (corpus-wide statistics don't
    * stream), serving is this map-side join — each micro-batch touches
    * only its own rows. */
  def scoreDocsDsir(docs: DataFrame, ratio: DataFrame): DataFrame =
    graft.operators.LmQueries.dsirScore(docs, ratio)

  /** E84 — near-dup flagging at ingest: screen each arriving micro-batch
    * against the standing corpus with x41's MinHash-LSH chain, as a
    * `foreachBatch` body (the E76 pattern — inside foreachBatch a batch is
    * a plain DataFrame, so the candidate `distinct` is per-batch work, not
    * unbounded stream state).
    *
    * Both sides run the IDENTICAL chain (3-shingles → 32 minhashes → 8
    * bands of 4): candidates are (band_id, band_hash) equi-join collisions,
    * verified with exact shingle Jaccard, flagged at `tau`. At 100 TB the
    * corpus side is the persisted band index (build once, append on
    * ingest — the E76 lifecycle), the BATCH side is the broadcast side
    * (a micro-batch is MBs against a corpus of TBs), and every batch row
    * that survives screening appends its own bands to the index. Here the
    * corpus bands derive inline from the docs table — same plan shape,
    * no index-maintenance coupling in the operator. */
  def flagNearDups(batch: DataFrame, corpus: DataFrame, tau: Double = 0.5): DataFrame = {
    import graft.operators.DedupQueries
    def prep(df: DataFrame, idAs: String, shAs: String): DataFrame = df
      .select(col("doc_id").as(idAs), split(col("text"), " ").as("toks"))
      .select(col(idAs), array_distinct(DedupQueries.shingles3(col("toks"))).as(shAs))
    def banded(df: DataFrame, idCol: String, shCol: String): DataFrame = df
      .select(col(idCol), graft.functions.VectorExprs.minHashSigs(col(shCol), 32).as("sigs"))
      .select(col(idCol), explode(DedupQueries.bandsFromSigs(col("sigs"), 8, 4)).as("b"))
      .select(col(idCol), col("b.band_id"), col("b.band_hash"))
    val bs = prep(batch, "doc_id", "sh")
    val cs = prep(corpus, "c_id", "c_sh")
    val cand = banded(bs, "doc_id", "sh")
      .join(banded(cs, "c_id", "c_sh"), Seq("band_id", "band_hash"))
      .filter(col("doc_id") =!= col("c_id"))
      .select(col("doc_id"), col("c_id")).distinct()
    cand.join(bs, "doc_id").join(cs, "c_id")
      .select(col("doc_id"), col("c_id"),
        graft.Tables.fround(size(array_intersect(col("sh"), col("c_sh")))
          / size(array_union(col("sh"), col("c_sh"))).cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= tau)
      .orderBy(col("doc_id"), desc("jaccard"), col("c_id"))
  }

  /** E85 — streaming heavy hitters: x81's Misra–Gries sketch as a
    * CONTINUOUS aggregation. The MG buffer is mergeable and its guarantee
    * (every token above total/k survives) holds under ANY merge order, so
    * the same udaf that powers the batch sketch runs as a streaming global
    * aggregate — the state store holds ONE fixed-k buffer (constant state,
    * no watermark needed), each micro-batch folds in via the Aggregator's
    * reduce/merge, and complete-mode output republishes the current
    * candidate set + running total every trigger. The exact-verify half
    * stays batch (x81's verify pass over the accumulated store) — the
    * stream maintains the candidate superset cheaply; verification is a
    * bounded batch join whenever a consumer wants exact counts. */
  def streamingHeavyHitters(docs: DataFrame): DataFrame = {
    import graft.operators.UdfQueries
    docs.select(explode(split(col("text"), " ")).as("tok"))
      .select(xxhash64(col("tok")).as("gh"))
      .agg(UdfQueries.mgUdaf(col("gh")).as("cands"), count(lit(1)).as("total"))
  }

  /** E105 — streaming distinct count: x107's deterministic HLL registers
    * as a CONTINUOUS per-group aggregation. The register buffer merges by
    * elementwise max — exact under any merge order and any micro-batch
    * boundary — so the state store holds 1024 bytes per group (constant,
    * no watermark) and complete-mode output republishes the running
    * vocabulary estimate per trigger. Shares the batch op's h60 stream and
    * register arithmetic ([[graft.operators.UdfQueries.HllSketch]]), so
    * the streamed estimate is BIT-IDENTICAL to running x107 over the
    * accumulated corpus — the sketch-equivalence the spec asserts. At
    * 100 TB this is the cardinality monitor on the ingest path: per-source
    * vocab growth, join-key NDV drift, dedup-rate tracking, each a 1 KB
    * state cell. */
  def streamingDistinctShingles(docs: DataFrame): DataFrame =
    docs.select(col("lang"), split(col("text"), " ").as("toks"))
      .select(col("lang"), explode(
        array_distinct(graft.operators.DedupQueries.shingles3(col("toks")))).as("g"))
      .select(col("lang"), graft.Tables.h60(col("g")).as("gh"))
      .groupBy(col("lang"))
      .agg(graft.operators.UdfQueries.hllUdaf(col("gh")).as("hll_ndv"))

  /** E28 (transformWithState form) — the same running per-user totals on
    * Spark 4's arbitrary-state API: typed `ValueState` handles, explicit
    * TTL support, multiple state variables per key, timers — and it runs on
    * the RocksDB state store (required by the operator), the large-state
    * backend a 100 TB streaming job needs. Kept alongside the
    * mapGroupsWithState form so both state APIs stay covered. */
  class RunningCountProcessor extends StatefulProcessor[Long, Event, UserRunningCount] {
    @transient private var state: ValueState[UserRunningCount] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunningCount](
        "running", Encoders.product[UserRunningCount], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserRunningCount] = {
      val prev = Option(state.get()).getOrElse(UserRunningCount(key, 0L, 0.0))
      val batch = rows.toSeq
      val next = UserRunningCount(key,
        prev.n + batch.size, prev.total_value + batch.map(_.value).sum)
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningUserCountsTws(events: Dataset[Event])(
      implicit enc: org.apache.spark.sql.Encoder[UserRunningCount],
      longEnc: org.apache.spark.sql.Encoder[Long]): Dataset[UserRunningCount] =
    events.groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update())

  /** E28 — custom keyed state: running count + value total per user.
    * `idleTimeout` evicts state for keys gone quiet (the 100 TB guard:
    * unbounded keyed state is what kills a long-running job). Note
    * ProcessingTimeTimeout keeps the query scheduling timeout-check batches,
    * so processAllAvailable()-style synchronous tests should pass None. */
  def runningUserCounts(events: Dataset[Event], idleTimeout: Option[String] = None)(
      implicit enc: org.apache.spark.sql.Encoder[UserRunningCount],
      longEnc: org.apache.spark.sql.Encoder[Long]): Dataset[UserRunningCount] = {
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunningCount, UserRunningCount](timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserRunningCount]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserRunningCount(userId, 0L, 0.0))
            val batch = rows.toSeq
            val next = UserRunningCount(userId,
              prev.n + batch.size, prev.total_value + batch.map(_.value).sum)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  /** E117 — streaming incremental view maintenance: x109's counting-
    * algorithm deltas as a NATIVE streaming aggregation. The insight IVM
    * and Structured Streaming share is the same algebra — signed deltas
    * (dn, ds) are mergeable, so the state store IS the materialized view
    * (one (n, Σ) cell per group, constant per key, no watermark), each
    * micro-batch folds in via the agg's merge, and complete-mode output
    * republishes the maintained view every trigger. Seeding: the base
    * table enters as batch 0's +1/+value deltas — after that the base is
    * NEVER re-scanned, the x109 contract. The spec proves the streamed
    * view over (base-as-deltas + change batch) equals the batch x109
    * result bit-exactly; consumers filter n > 0 (a group deleted down to
    * zero vanishes, as in x109). */
  def maintainAggView(deltas: DataFrame): DataFrame =
    deltas.groupBy(col("g"))
      .agg(sum(col("dn")).as("n_orders"), sum(col("ds")).as("sc"))

  /** E118 — streaming drift monitor: x116's TVD check per micro-batch
    * against a STATIC baseline histogram (the stream-static posture of
    * E70 — the baseline is yesterday's persisted x102/x116 audit row, the
    * stream is today's ingest). Called from foreachBatch; one bounded
    * (bin) hash agg per batch, the comparison joins the B-row baseline —
    * cost independent of batch size beyond the scan. Bins CLAMP into the
    * baseline's [mn, mx) frame (drifted data lands in the edge bins —
    * exactly the signal; x116's shared-bounds recompute is the batch-side
    * variant where bounds may move). Returns one row: (n, tvd, drifted).
    */
  def driftTvd(batch: DataFrame, baseline: DataFrame, mn: Double, mx: Double,
      nBins: Int = 8, tau: Double = 0.1): DataFrame = {
    val binc = greatest(lit(0L),
      least(floor((col("v") - mn) * nBins / (mx - mn)), lit(nBins - 1L))).cast("long")
    val h = batch.where(col("v").isNotNull)
      .select(binc.as("bin")).groupBy(col("bin")).agg(count(lit(1)).as("nb"))
    val tot = h.agg(sum(col("nb")).as("n"))
    baseline.join(h, Seq("bin"), "left")
      .crossJoin(broadcast(tot)) // 1-row global aggregate
      .select(col("pb"), (coalesce(col("nb"), lit(0L)) / col("n")).as("pv"), col("n"))
      .agg(max(col("n")).as("n"), (sum(abs(col("pb") - col("pv"))) / 2).as("tvd"))
      .select(col("n"), graft.Tables.fround(col("tvd"), 6).as("tvd"),
        (col("tvd") > tau).as("drifted"))
  }

  /** E102 — streaming CDC apply: a change-record stream (op column `I`/`U`
    * upserts, `D` tombstones) applied continuously to a committed table as
    * merge-on-read upserts — the Debezium→lakehouse ingestion shape. Each
    * micro-batch: (1) latest-wins per key by the event-time column (CDC
    * feeds carry multiple changes per key per batch; the merge contract is
    * ≤1), (2) split upserts from tombstones, (3) one `mergeIntoMor` commit:
    * upsert rows become the data snapshot, upsert+tombstone keys the
    * equality-delete file. Nothing rewrites — write cost per trigger is
    * O(|batch|) however large the table, the property continuous upserts
    * need; `Maintenance.rewriteDeletes` folds the accumulated delete debt
    * on a maintenance schedule, independent of this stream.
    *
    * Crash/replay: a foreachBatch replay re-commits the same changes, and
    * re-applying an upsert batch converges (the replay's equality-deletes
    * retire the first attempt's rows, the data re-lands identically) — the
    * effective table state is exactly-once even though the commit count is
    * at-least-once. */
  def cdcApply(changes: DataFrame, tableDir: String, key: String, tsCol: String,
      opCol: String = "op"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val (upserts, tombstones) = cdcLatestWins(batch, key, tsCol, opCol)
        Maintenance.mergeIntoMor(spark, tableDir, upserts, key, tsCol,
          tombstoneKeys = Some(tombstones))
      }
      ()
    }

  /** Step (1)+(2) of the [[cdcApply]] trigger body — latest-wins per key
    * by the event-time column, then split into (upsert rows, tombstone
    * keys). Extracted so the x178 batch-replay twin folds the IDENTICAL
    * per-batch net effect; step (3)'s `mergeIntoMor` visible-state algebra
    * (new rows land, touched keys' earlier rows retire via the equality
    * delete) is exactly `upserts ∪ (state ⟕anti touched-keys)`, the
    * equivalence MaintenanceSpec asserts at the file layer. */
  def cdcLatestWins(batch: DataFrame, key: String, tsCol: String,
      opCol: String = "op"): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(desc(tsCol))
    val latest = batch
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    (latest.filter(col(opCol) =!= "D").drop(opCol),
      latest.filter(col(opCol) === "D").select(col(key)))
  }
}
