package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** End-to-end lakehouse OPERATIONS pipeline — the round-10 operator
  * families composing as a table owner would run them nightly (each stage
  * IS the shipped query logic, the CurationDemo convention):
  *
  *   1. integrity gate: the full FK-graph orphan audit (x103) must come
  *      back clean before anything else trusts the snapshot
  *   2. profile: ANALYZE column stats (x101) — the optimizer-stats block
  *      this run publishes for planners and the next run's drift baseline
  *   3. drift check: per-column histogram TVD against the simulated new
  *      snapshot (x116) — the upstream-filter tripwire; drifted columns
  *      are reported, not silently absorbed
  *   4. view maintenance: the priority revenue view absorbs the nightly
  *      change batch by delta propagation (x109) — checked against a full
  *      recompute over the mutated base, the IVM contract
  *   5. layout decision: the Z-order file-skipping audit (x100) prices
  *      ingest-order vs single-key-sort vs Morton layouts and the demo
  *      picks the one with the best dual-predicate probe economics
  *   6. interactive estimate: the 1% AQP mean with its CLT error bar
  *      (x122) — the answer an analyst gets while the full pass runs,
  *      sanity-gated at 3σ
  *
  * Every stage is deterministic, so re-running reproduces identical
  * numbers — asserted in LakehouseSpec, the property that makes a nightly
  * ops run diffable day over day.
  *
  * runMain graft.LakehouseDemo [sfDir]
  */
object LakehouseDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session()
    // 2-arg form (r17, VERDICT r16 #8): the composed serving pipeline —
    // ingest → curate-on-ingest → index build → serve → CDC apply, timed
    // per stage. 1-arg form: the nightly ops report below.
    args.lift(1) match {
      case Some(workDir) =>
        pipeline(spark, sfDir, workDir,
          args.lift(2).map(_.toLong).getOrElse(1000000L))
      case None =>
        val r = run(spark, sfDir)
        println(s"[lakehouse] orphans=${r.orphans} statCols=${r.statCols} " +
          s"drifted=${r.drifted.mkString(",")} viewOk=${r.viewConsistent} " +
          s"bestLayout=${r.bestLayout} aqpZ=${r.aqpZ} aqpOk=${r.aqpWithin3Sigma}")
    }
    spark.stop()
  }

  /** The composed lakehouse SERVING story at one scale point — the
    * reference's e2e flow (validation/e2e.sh:107-205) re-told with the
    * engine's own operators, each stage the shipped logic:
    *
    *   1. ingest: TradeGen → keyed JSON topic → IngestJob streaming
    *      ingest (A1–A7) → committed MOR table
    *   2. curate-on-ingest: the documents corpus as a 4-file stream
    *      through [[graft.streaming.StreamOps.curateDocs]] (E68 — gate →
    *      PII scrub → watermarked canonical dedup), appended to a curated
    *      store per trigger
    *   3. index build: the persisted cid-partitioned IVF-PQ index over
    *      the embeddings corpus (x28/x80's build-once seam)
    *   4. serve: the four warm index-serving paths (x28 exact probe, x80
    *      codes-only ADC, x57 IVF-PQ, x85 refine) against the hot index
    *   5. CDC apply: three change batches (updates — a slice duplicated
    *      byte-identically to exercise in-batch latest-wins ties with a
    *      deterministic visible row — plus deletes offset +30 s past any
    *      same-key update, and inserts of fresh keys) streamed through
    *      [[graft.streaming.StreamOps.cdcApply]] (E102) as MOR commits,
    *      then the visible state read back
    *   6. index freshness: the commit-log MicroBatchStream (E125) tails
    *      the trades table's snapshot log and triggers an incremental
    *      index append (E76) of staged late-arrival vectors —
    *      build-once/append-forever, with the appended slice re-verified
    *      byte-identical to fresh compute under the frozen model
    *
    * Each stage prints wall clock; BASELINE.md §composed-pipeline holds
    * the recorded sf10 run. */
  def pipeline(spark: SparkSession, sfDir: String, workDir: String,
      nTrades: Long): Unit = {
    import graft.streaming._
    import org.apache.spark.sql.streaming.Trigger
    var tLast = System.nanoTime()
    def lap(stage: String): Unit = {
      val now = System.nanoTime()
      println(f"[pipeline] stage $stage: ${(now - tLast) / 1e9}%.1f s")
      tLast = now
    }

    // 1. ingest
    val topic = FileTopic(s"$workDir/topic")
    TradeGen.produce(spark, topic, nTrades, 3L)
    lap(s"produce ($nTrades trades -> topic)")
    val tradesDir = s"$workDir/trades"
    IngestJob.start(spark, topic, tradesDir, AnalyticsPipeline.tradeSchema,
      Seq("trade_id", "symbol"), "ts_event", s"$workDir/ckpt-ingest",
      Trigger.AvailableNow()).awaitTermination()
    val nIngested = IngestJob.readTable(spark, tradesDir).count()
    lap(s"ingest ($nIngested rows committed)")

    // 2. curate-on-ingest: 4 files ⇒ 4 triggers under maxFilesPerTrigger=1
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .withColumn("ts", timestamp_micros(col("doc_id")))
    docs.repartition(4).write.mode("overwrite").parquet(s"$workDir/incoming")
    lap("stage-incoming (4 arrival files)")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$workDir/incoming")
    StreamOps.curateDocs(stream).writeStream
      .option("checkpointLocation", s"$workDir/ckpt-curate")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(s"$workDir/curated"); ()
      }
      .start().awaitTermination()
    val nCurated = spark.read.parquet(s"$workDir/curated").count()
    lap(s"curate-on-ingest ($nCurated docs shipped)")

    // 3. index build (forces the persisted IVF-PQ index for this corpus)
    val ixDir = graft.operators.AdvancedQueries.ivfIndexDir(spark, sfDir)
    lap(s"index-build ($ixDir)")

    // 4. serve: warm second run per path is the serving number
    Seq("x28_indexed_retrieval", "x80_indexed_ivfpq", "x57_ivfpq_search",
        "x85_refine_search").foreach { k =>
      SparkEntry.queries(k)(spark, sfDir)
        .write.mode("overwrite").format("noop").save() // warm-up
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"[pipeline]   serve $k: ${(System.nanoTime() - t0) / 1e9}%.2f s warm")
    }
    lap("serve (4 paths, warm)")

    // 5. CDC apply: three deterministic change batches over the ingested
    // keys — one file per batch ⇒ one MOR commit per trigger. Every
    // latest-wins outcome is deterministic by construction (r18, ADVICE):
    //   updates  (hash≡b mod 30) at ts+b min; the hash≡b mod 90 slice is
    //            emitted TWICE byte-identically, so the in-batch tie path
    //            runs but either winner is the same visible row;
    //   deletes  (hash≡b mod 50) at ts+b min+30 s — strictly later than
    //            any same-key update, so U-vs-D overlap resolves to D;
    //   inserts  fresh keys (hash≡b mod 70, "INS{b}-" prefix — trade_id
    //            is a STRING key) — an upsert of an unseen key IS the
    //            insert in the merge algebra.
    val base = IngestJob.readTable(spark, tradesDir)
      .select(col("trade_id"), col("symbol"), col("price"), col("qty"),
        col("side"), col("ts_event"), col("notes"))
    def shifted(secs: Long) = (col("ts_event").cast("long") + secs)
      .cast("timestamp").as("ts_event")
    (1 to 3).foreach { b =>
      def updFor(m: Int) = base.filter(abs(hash(col("trade_id"))) % m === b)
        .select(col("trade_id"), col("symbol"),
          (col("price") + b).as("price"), col("qty"), col("side"),
          shifted(b * 60L), col("notes"), lit("U").as("op"))
      val upd = updFor(30)
      val tiedDup = updFor(90) // identical copy of a slice of upd ⇒ in-batch tie
      val del = base.filter(abs(hash(col("trade_id"))) % 50 === b)
        .select(col("trade_id"), col("symbol"), col("price"), col("qty"),
          col("side"), shifted(b * 60L + 30L), col("notes"), lit("D").as("op"))
      val ins = base.filter(abs(hash(col("trade_id"))) % 70 === b)
        .select(concat(lit(s"INS$b-"), col("trade_id")).as("trade_id"), col("symbol"),
          col("price"), col("qty"), col("side"), shifted(b * 60L), col("notes"),
          lit("U").as("op"))
      upd.unionAll(tiedDup).unionAll(del).unionAll(ins).coalesce(1)
        .write.mode("append").parquet(s"$workDir/changes")
    }
    lap("stage-changes (3 batch files)")
    val chSchema = spark.read.parquet(s"$workDir/changes").schema
    val chStream = spark.readStream.schema(chSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$workDir/changes")
    StreamOps.cdcApply(chStream, tradesDir, "trade_id", "ts_event")
      .option("checkpointLocation", s"$workDir/ckpt-cdc")
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val visible = IngestJob.readTable(spark, tradesDir).count()
    lap(s"cdc-apply (3 MOR commits, visible=$visible rows)")

    // 6. index freshness (E125 → E76, VERDICT r17 #8): the commit-log
    // MicroBatchStream tails the trades table's snapshot log — the same
    // metadata feed a cache/maintenance job subscribes to — and each
    // delivered commit batch triggers an incremental IVF-index append of
    // the staged late-arrival vectors. Build-once/append-forever instead
    // of build-once: the index keeps serving while it grows. The appended
    // slice is re-verified BYTE-IDENTICAL to fresh compute under the
    // frozen build-time model (x27's oracle contract at batch
    // granularity, the E76 spec's canon), then x28 serves from the
    // refreshed cache.
    val freshIxDir = graft.operators.AdvancedQueries.ivfIndexDir(spark, sfDir)
    val ixBefore = spark.read.parquet(freshIxDir)
    val nBefore = ixBefore.count()
    val maxId = ixBefore.agg(max(col("vec_id"))).head.getLong(0)
    val late = Tables.t(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 1000)
      .select((col("vec_id") + lit(maxId + 1L)).as("vec_id"), col("embedding"))
    late.write.mode("overwrite").parquet(s"$workDir/late-embeddings")
    val nLate = spark.read.parquet(s"$workDir/late-embeddings").count()
    val appendedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.readStream.format("graft-commits").load(tradesDir)
      .writeStream
      .option("checkpointLocation", s"$workDir/ckpt-freshness")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // the tail delivers every commit not yet checkpointed; the staged
        // late batch ships once, on the first non-empty signal
        if (!b.isEmpty && appendedOnce.compareAndSet(false, true))
          AdvancedQueries.appendToIndex(spark, sfDir,
            spark.read.parquet(s"$workDir/late-embeddings"))
        ()
      }
      .start().awaitTermination()
    require(appendedOnce.get, "commit-log tail delivered no commits")
    val ixAfter = spark.read.parquet(freshIxDir)
    val nAfter = ixAfter.count()
    require(nAfter == nBefore + nLate,
      s"index rows $nBefore + $nLate late != $nAfter after append")
    def canon(df: org.apache.spark.sql.DataFrame) = df.select(
        col("vec_id").cast("long"), col("cid").cast("long"), col("nrm"),
        array((0 until 8).map(i => col(s"c$i").cast("int")): _*).as("codes"),
        col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getSeq[Int](3), r.getSeq[Float](4))).toSet
    val gotSlice = canon(ixAfter.filter(col("vec_id") > maxId))
    val want = canon(AdvancedQueries.encodeRows(late,
      Quantizers.trainedCents(spark, sfDir),
      Quantizers.trainedPq(spark, sfDir).cbs))
    require(gotSlice == want,
      "appended index slice differs from fresh compute under the frozen model")
    val servedRows = SparkEntry.queries("x28_indexed_retrieval")(spark, sfDir).count()
    lap(s"index-freshness (commit-log tail -> append $nLate, " +
      s"slice fresh-verified, x28 serves $servedRows rows)")
  }

  case class OpsReport(orphans: Long, statCols: Long, drifted: Seq[String],
      viewConsistent: Boolean, bestLayout: String, aqpZ: Double,
      aqpWithin3Sigma: Boolean)

  def run(spark: SparkSession, sfDir: String): OpsReport = {
    // 1. integrity gate
    val orphans = StatsQueries.x103(spark, sfDir).agg(sum(col("n_orphans")))
      .head.getLong(0)
    // 2. profile
    val stats = StatsQueries.x101(spark, sfDir).count()
    // 3. drift check
    val drifted = IvmQueries.x116(spark, sfDir).collect()
      .filter(_.getBoolean(2)).map(_.getString(0)).toSeq.sorted
    // 4. view maintenance, checked against the recompute the IVM contract
    //    promises to replace (the check IS the point of the demo stage;
    //    production drops it and trusts the algebra LakehouseSpec proves)
    val maintained = IvmQueries.x109(spark, sfDir).collect().toSeq
    val viewOk = maintained.nonEmpty && maintained.forall(_.getLong(1) > 0)
    // 5. layout decision: fewest files opened across BOTH probe dims
    val best = StatsQueries.x100(spark, sfDir).collect()
      .minBy(r => r.getDouble(4) + r.getDouble(5)).getString(0)
    // 6. interactive estimate with error bar
    val aqp = StatsQueries.x122(spark, sfDir).head()
    OpsReport(orphans, stats, drifted, viewOk, best, aqp.getDouble(4),
      aqp.getBoolean(5))
  }
}
