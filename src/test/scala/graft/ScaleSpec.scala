package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Scale-mechanism evidence: AQE's automatic skew-join splitting — the
  * engine-default path for skewed keys (Salting covers the manual path,
  * SaltingSpec). Thresholds are lowered so a local-scale skew triggers the
  * same rewrite a 100 TB hot key would. */
class ScaleSpec extends SparkSpec {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._

    // 200k rows, 99% on one hot key -> one shuffle partition dwarfs the rest
    val left = s.range(0, 200000)
      .select(when($"id" % 100 === 0, $"id" % 50).otherwise(lit(7L)).as("k"),
        concat(lit("payload-"), $"id").as("pad"))
    val right = s.range(0, 50).select($"id".as("k"), lit("dim").as("v"))

    val joined = left.join(right, "k")
    // collect() executes THIS QueryExecution (count() would plan a separate
    // one, leaving joined's adaptive plan un-finalized)
    assert(joined.collect().length === 200000)

    val plan = joined.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(finalPlan.contains("skew=true"),
      s"expected AQE skew-split in final plan:\n$finalPlan")
  }

  /** Planted documents table: 80% of docs in ONE 64-token band (the
    * degenerate distribution x77's docstring bounds by), the rest spread
    * over distinct bands. */
  private lazy val skewDir: String = {
    val dir = tmpDir("skewdocs")
    import spark.implicits._
    val rows = (0L until 500L).map { id =>
      val n = if (id % 5 != 0) 70 // 400 docs -> band 1 (tokens 65..128)
              else 140 + (id.toInt / 5 % 30) * 64 // spread over bands >= 2
      (id, "en", (1 to n).map(j => s"d${id}w$j").mkString(" "))
    }
    rows.toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x77Decomposed is byte-identical to x77 on an 80%-one-band corpus") {
    // the decomposition must actually engage: the hot band's doc_ids span
    // several salt ranges (so its window partition genuinely sub-splits)
    val width = math.max(1L, 499L / 8L + 1)
    val hotSalts = (0L until 500L).filter(_ % 5 != 0).map(_ / width).distinct
    assert(hotSalts.length >= 4, s"hot band spans only $hotSalts")

    val plain = operators.SamplingQueries.x77(spark, skewDir).collect().toSeq
    val decomp = operators.SamplingQueries.x77Decomposed(spark, skewDir).collect().toSeq
    assert(plain.nonEmpty)
    assert(decomp == plain, "decomposed x77 diverged from the window form")
    // and the hot band really is 80% of the corpus, cut into full batches
    val hot = plain.filter(_.getLong(0) == 1L)
    assert(hot.map(_.getLong(2)).sum == 400L, s"hot band docs: $hot")
  }

  test("x77Decomposed matches x77 on the real documents table") {
    val plain = operators.SamplingQueries.x77(spark, sfDir).collect().toSeq
    val decomp = operators.SamplingQueries.x77Decomposed(spark, sfDir).collect().toSeq
    assert(decomp == plain)
  }

  test("shardAssignDecomposed is byte-identical to shardAssign (planted + real)") {
    import spark.implicits._
    val planted = (0L until 500L).toDF("doc_id")
    val a = operators.SamplingQueries.shardAssign(planted)
      .orderBy(col("doc_id")).collect().toSeq
    val b = operators.SamplingQueries.shardAssignDecomposed(planted)
      .orderBy(col("doc_id")).collect().toSeq
    assert(a.nonEmpty && b == a)

    val real = graft.Tables.t(spark, sfDir, "documents")
    val ra = operators.SamplingQueries.shardAssign(real)
      .orderBy(col("doc_id")).collect().toSeq
    val rb = operators.SamplingQueries.shardAssignDecomposed(real)
      .orderBy(col("doc_id")).collect().toSeq
    assert(rb == ra)
  }

  test("x125 banded escape: byte-identical to the exact pair join on a planted motif corpus") {
    import spark.implicits._
    // 72 hourly points, one type: hours 0-11 and 24-35 carry the IDENTICAL
    // pattern (the planted motif, z-dist exactly 0 -> collides in every
    // quantized band); every other hour gets a distinct deterministic value
    val pattern = Seq(5.0, 9.0, 2.0, 14.0, 7.0, 11.0, 3.0, 8.0, 12.0, 6.0, 10.0, 4.0)
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val rows = (0 until 72).map { h =>
      val v =
        if (h < 12) pattern(h)
        else if (h >= 24 && h < 36) pattern(h - 24)
        else ((h * 2654435761L) % 1000L) / 10.0
      ("purchase", new java.sql.Timestamp(base + h * 3600000L), v)
    }
    val dir = tmpDir("graft-motif")
    rows.toDF("event_type", "ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val winz = operators.TemporalQueries.motifWinz(spark, dir)
    val exact = operators.TemporalQueries.motifExact(winz).collect().toSeq
    val banded = operators.TemporalQueries.motifBanded(winz).collect().toSeq
    assert(exact.nonEmpty)
    assert(banded == exact, s"banded $banded != exact $exact")
    // the winning motif is a zero-distance pair (the planted repeat
    // guarantees one exists; z-norm shift-invariance means the linear
    // noise can legitimately produce another — either wins only at 0)
    assert(exact.head.getDouble(3) == 0.0, exact.head.toString)
  }

  test("x125 gate: a zero banded-threshold flips the served query to the banded plan") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val exact = operators.TemporalQueries.x125(s, sfDir).collect().toSeq
    s.conf.set("spark.graft.motif.bandedThreshold", "0")
    val bandedDf = operators.TemporalQueries.x125(s, sfDir)
    // banded plan is recognizable by its band-key join (3 join keys)
    assert(bandedDf.queryExecution.optimizedPlan.toString.contains("band"),
      "threshold=0 must route to the banded candidate generator")
    val banded = bandedDf.collect().toSeq
    s.conf.unset("spark.graft.motif.bandedThreshold")
    // on the real corpus the motifs are near-duplicate window pairs and
    // collide; equality here is evidence, not a guarantee (documented
    // LSH recall trade in SCALING.md)
    assert(banded == exact, s"banded $banded != exact $exact")
  }
}
