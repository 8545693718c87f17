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
}
