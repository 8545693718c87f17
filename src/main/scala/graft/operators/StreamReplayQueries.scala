package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Batch-replay oracle twins for the streaming curation ops (VERDICT r10
  * #7): E84 (streaming near-dup flagging) and E85 (streaming heavy
  * hitters) carry planted StreamingSpec tests, but their per-batch
  * DECOMPOSITION was not oracle-checked. These keys replay the identical
  * decomposition in batch mode — documents split into `nReplayBatches`
  * deterministic micro-batches by `doc_id % B` (arrival order) — running
  * the SAME operator chain the foreachBatch body runs
  * ([[graft.streaming.StreamOps.flagNearDups]], the MG sketch + exact
  * verify), so DuckDB can hash-check what each trigger would have
  * emitted.
  *
  * Scale note: each replayed trigger is the streaming op's own plan —
  * x135's band join keeps the micro-batch as the small side against the
  * standing-corpus bands, x136's verify is a ≤k-candidate exact count —
  * so the replay inherits the 100 TB posture of the ops it checks. */
object StreamReplayQueries {
  type Q = (SparkSession, String) => DataFrame

  private val nReplayBatches = 3
  /** Same default τ as the streaming op. */
  private val tau = 0.5

  /** x135 — E84's decomposition: for each arriving batch b ∈ {1,2}, flag
    * its near-dups against the standing corpus (batches < b) via the
    * exact streaming chain. Union over triggers = all flagged pairs where
    * batch(doc) > batch(corpus doc) — which is what the twin states
    * declaratively in one banded join. */
  val x135: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val parts = (1 until nReplayBatches).map { b =>
      graft.streaming.StreamOps.flagNearDups(
          docs.filter(pmod(col("doc_id"), lit(nReplayBatches)) === b),
          docs.filter(pmod(col("doc_id"), lit(nReplayBatches)) < b), tau)
        .withColumn("batch_id", lit(b.toLong))
    }
    parts.reduce(_ unionAll _)
      .select(col("batch_id"), col("doc_id"), col("c_id"), col("jaccard"))
      .orderBy(col("batch_id"), col("doc_id"), desc("jaccard"), col("c_id"))
  }

  /** x136 — E85's decomposition: after each trigger b, the streaming op's
    * complete-mode output is (MG candidates, running total) over the
    * accumulated prefix; the exact-verify half counts only the ≤k
    * candidates and thresholds at total/k. That verified output is EXACT
    * heavy hitters of the prefix — deterministic whatever merge order the
    * state-store fold used (the MG guarantee: every key above total/k
    * survives any fold), which is exactly why DuckDB can check it with a
    * plain per-prefix frequency query. */
  val x136: Q = (s, d) => {
    import s.implicits._
    val docs = t(s, d, "documents")
    val perTrigger = (0 until nReplayBatches).map { b =>
      val toks = graft.Tables.spread(
          docs.filter(pmod(col("doc_id"), lit(nReplayBatches)) <= b))
        .select(explode(split(col("text"), " ")).as("tok"))
        .select(col("tok"), xxhash64(col("tok")).as("gh"))
      val head = toks.agg(UdfQueries.mgUdaf(col("gh")).as("cands"),
        count(lit(1)).as("total")).head
      val cands = head.getSeq[Long](0) // ≤k by the sketch bound
      val total = head.getLong(1)
      toks.filter(col("gh").isin(cands: _*))
        .groupBy(col("tok")).agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") > lit(total) / lit(UdfQueries.hhK.toDouble))
        .select(lit(b.toLong).as("batch_id"), col("tok"), col("n_occ"),
          graft.Tables.fround(col("n_occ") / lit(total.toDouble), 6).as("freq"))
    }
    perTrigger.reduce(_ unionAll _)
      .orderBy(col("batch_id"), desc("n_occ"), col("tok"))
  }

  val queries: Map[String, Q] = Map(
    "x135_stream_neardup_replay" -> x135,
    "x136_stream_hh_replay" -> x136)

  val oracles: Map[String, String] = Map(
    // GENERATED twin of the E84 chain: the x41 minhash/band SQL with the
    // cross-batch arrival condition (batch(a) > batch(b)) and the rounded
    // τ filter the streaming op applies.
    "x135_stream_neardup_replay" -> {
      import graft.functions.MinHash
      val h60 = graft.Tables.h60Sql _
      val sigCols = (0 until 32).map(j =>
        s"list_min(list_transform(hb, h -> ${MinHash.permSql(j, "h")})) AS s$j")
        .mkString(",\n    ")
      val bands = (0 until 8).map { bnd =>
        val cc = (0 until 4).map(r => s"CAST(s${bnd * 4 + r} AS VARCHAR)")
          .mkString(" || ',' || ")
        s"  SELECT doc_id, $bnd AS band_id, ${h60(s"($cc)")} AS bh FROM sg"
      }.mkString("\n  UNION ALL\n")
      s"""WITH ${DedupQueries.shingleCte},
         |hs AS (SELECT doc_id, s, list_transform(s, x -> ${h60("x")}) AS hb FROM sh),
         |sg AS (SELECT doc_id,
         |    $sigCols
         |  FROM hs),
         |bd AS (
         |$bands),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bd a JOIN bd b ON a.band_id = b.band_id AND a.bh = b.bh
         |    AND (a.doc_id % $nReplayBatches) > (b.doc_id % $nReplayBatches)),
         |j AS (
         |  SELECT c.a_id % $nReplayBatches AS batch_id, c.a_id AS doc_id, c.b_id AS c_id,
         |    floor(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         |      / len(list_distinct(list_concat(x.s, y.s))) * 10000 + 0.5) / 10000 AS jaccard
         |  FROM cand c JOIN sh x ON x.doc_id = c.a_id JOIN sh y ON y.doc_id = c.b_id)
         |SELECT batch_id, doc_id, c_id, jaccard FROM j WHERE jaccard >= $tau
         |ORDER BY batch_id, doc_id, jaccard DESC, c_id""".stripMargin
    },
    // Per-prefix exact heavy hitters (the x81 oracle, once per trigger).
    "x136_stream_hh_replay" -> {
      val prefixes = (0 until nReplayBatches).map { b =>
        s"""SELECT CAST($b AS BIGINT) AS batch_id, tok, n_occ,
           |  floor(n_occ / CAST(t.total AS DOUBLE) * 1000000 + 0.5) / 1000000 AS freq
           |FROM (SELECT tok, COUNT(*) AS n_occ FROM g WHERE bid <= $b GROUP BY tok) c,
           |  (SELECT COUNT(*) AS total FROM g WHERE bid <= $b) t
           |WHERE n_occ > t.total / ${UdfQueries.hhK}.0""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH g AS (
         |  SELECT doc_id % $nReplayBatches AS bid, unnest(string_split(text, ' ')) AS tok
         |  FROM documents)
         |$prefixes
         |ORDER BY batch_id, n_occ DESC, tok""".stripMargin
    })
}
