package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Sampling / split / binning invariants (x70–x72). Value parity with the
  * DuckDB twins is the Verify gate's job; these assert the contracts. */
class SamplingSpec extends SparkSpec {

  private def docs = graft.Tables.t(spark, sfDir, "documents")

  test("x70 hash sample is deterministic and near the 2% target") {
    val a = SamplingQueries.x70(spark, sfDir).collect()
    val b = SamplingQueries.x70(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "same data must sample identically")
    val total = docs.count().toDouble
    val frac = a.length / total
    // md5 buckets are uniform; 2% ± generous binomial slack at small N
    assert(frac > 0.002 && frac < 0.06, s"fraction $frac out of band")
  }

  test("x71 splits partition the corpus exactly") {
    val rows = SamplingQueries.x71(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    assert(rows.values.sum == docs.count())
    // 80/10/10 within coarse bounds
    val total = rows.values.sum.toDouble
    assert(rows("train") / total > 0.6, s"train share ${rows("train") / total}")
  }

  test("x71 split assignment is stable under table growth") {
    // a row's split depends only on its key hash, not on what else is in
    // the table: recompute on a half-table, assignments must agree
    val half = docs.filter(col("doc_id") % 2 === 0)
    val b = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 10000
    val full = docs.withColumn("s", when(b < 8000, "train").when(b < 9000, "val").otherwise("test"))
      .select(col("doc_id"), col("s"))
    val sub = half.withColumn("s", when(b < 8000, "train").when(b < 9000, "val").otherwise("test"))
      .select(col("doc_id"), col("s").as("s2"))
    val disagree = full.join(sub, "doc_id").filter(col("s") =!= col("s2")).count()
    assert(disagree == 0)
  }

  test("x73 stratified sample takes at most the quota per language, deterministically") {
    val rows = SamplingQueries.x73(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val perLang = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ <= 20), s"quota exceeded: $perLang")
    val langsWithEnough = docs.groupBy(col("lang")).count()
      .filter(col("count") >= 20).count()
    assert(perLang.count(_._2 == 20) == langsWithEnough,
      "every language with >= 20 docs must fill its quota")
    val again = SamplingQueries.x73(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == again.toSeq)
  }

  test("x48 rebalances every source to exactly the smallest source's size") {
    val rows = SamplingQueries.x48(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val minBefore = rows.map(_._2).min
    // exact quota: every source lands on min(n_before), none above, and a
    // source already at the min keeps all its docs
    rows.foreach { case (src, before, after) =>
      assert(after == math.min(before, minBefore), s"$src: $before -> $after (quota $minBefore)")
    }
    assert(rows.map(_._1).toSet == docs.select(col("source")).distinct()
      .collect().map(_.getString(0)).toSet, "no source may vanish")
    // deterministic: identical on re-run
    val again = SamplingQueries.x48(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("x72 bins do not depend on exchange reuse (partitioning is pinned)") {
    // the offset branch and the rank branch must see the SAME range
    // partitioning even when Catalyst cannot unify their exchanges
    val withReuse = SamplingQueries.x72(spark, sfDir).collect().toSeq
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val noReuse = SamplingQueries.x72(spark, sfDir).collect().toSeq
      assert(noReuse == withReuse,
        "bins changed when exchange reuse was disabled — partitioning not pinned")
    } finally spark.conf.unset("spark.sql.exchange.reuse")
  }

  test("x74 corpus profile matches independently computed facts") {
    val p = SamplingQueries.x74(spark, sfDir).collect()(0)
    assert(p.getLong(0) == docs.count())
    assert(p.getLong(3) == 0 && p.getLong(4) == 0, "clean synthetic corpus")
    assert(p.getLong(5) <= p.getLong(6), "min <= max")
    val avg = p.getDouble(7)
    assert(avg >= p.getLong(5) && avg <= p.getLong(6), "avg within [min,max]")
  }

  test("x72 bins are balanced and boundary-monotonic") {
    val bins = SamplingQueries.x72(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bins.map(_._1).toSeq == (1L to 10L), "ten dense bins")
    val counts = bins.map(_._2)
    assert(counts.max - counts.min <= 1, s"ntile balance: ${counts.toSeq}")
    // each bin's hi <= next bin's lo (equal allowed: ties span bins)
    bins.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._3, s"bins overlap: $lo vs $hi")
    }
  }

  test("x72 ntile matches Spark's own ntile and runs no full-data global window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // value parity with the single-partition reference form
    val expected = docs
      .withColumn("bin", ntile(10).over(
        Window.orderBy(col("n_chars"), col("doc_id"))).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), min(col("n_chars")).as("lo"),
        max(col("n_chars")).as("hi"))
      .orderBy(col("bin")).collect().toSeq
    val got = SamplingQueries.x72(spark, sfDir).collect().toSeq
    assert(got == expected, s"distributed ntile diverged:\n$got\n$expected")
    // plan hygiene: every Window node over the fact rows is partitioned;
    // the only permitted unpartitioned window is the 32-row offset side,
    // recognizable by its partial count input
    val p = SamplingQueries.x72(spark, sfDir).queryExecution.executedPlan.toString
    val ntileNodes = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(ntileNodes.exists(_.contains("pid#")),
      s"fact-side window must partition by the range-partition id:\n$p")
    // no materialization: pid is a pure expression over literal cut points,
    // so the plan must read parquet directly — a localCheckpoint/cache would
    // surface as a Scan ExistingRDD / InMemoryTableScan node
    assert(!p.contains("ExistingRDD") && !p.contains("InMemoryTableScan"),
      s"x72 must not materialize the table:\n$p")
  }

  test("x76 source card: within-source dup count and exact integer-weight mean quality") {
    import spark.implicits._
    val rows = Seq(
      (0L, "en", "srcA", "same text here"),
      (1L, "en", "srcA", "same text here"), // within-source exact dup
      (2L, "fr", "srcA", "different text entirely"),
      (3L, "en", "srcB", "same text here")) // same text in ANOTHER source: no dup there
    val dir = tmpDir("card")
    rows.toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SamplingQueries.x76(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == Set("srcA", "srcB"))
    val (docsA, charsA, langsA, dupsA, _) = got("srcA")
    assert((docsA, charsA, langsA, dupsA) == ((3L, 14L + 14L + 23L, 2L, 1L)), got("srcA").toString)
    assert(got("srcB")._4 == 0L, "cross-source copy must not count as a within-source dup")
    // mean quality recomputed from the published x30 weights
    val w = TextQueries.qualityScores(spark, dir).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(4) * 10000)).toMap
    val expA = math.floor((w(0) + w(1) + w(2)).toDouble / 3 * 100 + 0.5) / 100
    assert(got("srcA")._5 == expA, s"got ${got("srcA")._5} want $expA")
  }

  test("x75 keeps exactly the docs whose bucket clears their quality weight") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % 10000
    def h60(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)
    // weight from the PUBLISHED x30 quality column (single-source check)
    val w = TextQueries.qualityScores(spark, sfDir).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(4) * 10000)).toMap
    val all = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val kept = all.filter { case (id, _) => bucket(id) < w(id) }
    assert(kept.nonEmpty && kept.length < all.length, "weighting must be partial")
    val expect = kept.groupBy(_._2).map { case (lang, xs) =>
      lang -> (xs.length.toLong, xs.map(x => h60(x._1.toString)).reduce(_ ^ _))
    }
    val got = SamplingQueries.x75(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (lang, (n, x)) =>
      assert(got(lang) == ((n, x)), s"$lang: got ${got(lang)} want ($n, $x)")
    }
  }

  test("x79 shard assignment matches an independent md5 recompute exactly") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % 10000
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val expect: Map[Long, (Long, Long)] = ids.map(id => (id, bucket(id)))
      .groupBy(_._2 % 16).flatMap { case (shard, xs) =>
        xs.sortBy(x => (x._2, x._1)).zipWithIndex
          .map { case ((id, _), i) => id -> (shard, i.toLong) }
      }
    val got = SamplingQueries.x79(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == ids.length && got == expect)
  }

  test("x77 length batches: band assignment, 32-doc batch cut, exact padding") {
    import spark.implicits._
    // Bucket 0 (1–64 tokens): 34 docs, n_tokens = 1 + (id % 4) -> batch 0
    // holds ids 0..31 (8 full 1,2,3,4 cycles: sum 80, max 4), batch 1
    // holds ids 32,33 (n=1,2). Doc 34 has 70 tokens -> bucket 1, alone.
    val rows = (0L until 34L).map(i =>
      (i, "en", Seq.fill((1 + i % 4).toInt)("w").mkString(" "))) :+
      ((34L, "en", Seq.fill(70)("w").mkString(" ")))
    val dir = tmpDir("batches")
    rows.toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.SamplingQueries.x77(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq == Seq(
      (0L, 0L, 32L, 4L, 80L, 48L, 0.375),
      (0L, 1L, 2L, 2L, 3L, 1L, 0.25),
      (1L, 0L, 1L, 70L, 70L, 0L, 0.0)), got.toSeq.toString)
  }
}
