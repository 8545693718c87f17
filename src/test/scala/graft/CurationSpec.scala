package graft

import org.apache.spark.sql.functions._

/** CurationDemo: stage arithmetic and byte-level reproducibility. */
class CurationSpec extends SparkSpec {

  test("curation pipeline filters monotonically and reproduces identical splits") {
    val out1 = tmpDir("curation1")
    val (raw, kept, surv) = CurationDemo.run(spark, sfDir, out1)
    assert(raw > 0 && kept <= raw && surv <= kept, s"($raw, $kept, $surv)")
    assert(surv > 0, "pipeline must not drop everything")

    val splitCounts = Seq("train", "val", "test").map { s =>
      s -> spark.read.parquet(s"$out1/$s").count()
    }.toMap
    assert(splitCounts.values.sum == surv, s"$splitCounts vs $surv")

    // reproducibility: second run writes value-identical splits
    val out2 = tmpDir("curation2")
    CurationDemo.run(spark, sfDir, out2)
    Seq("train", "val", "test").foreach { s =>
      val a = spark.read.parquet(s"$out1/$s").orderBy(col("doc_id")).collect().toSeq
      val b = spark.read.parquet(s"$out2/$s").orderBy(col("doc_id")).collect().toSeq
      assert(a == b, s"split $s not reproducible")
    }
  }

  test("no dropped cluster member survives, every keeper does (modulo quality gate)") {
    val members = operators.DedupQueries.clusterMembers(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    val out = tmpDir("curation3")
    CurationDemo.run(spark, sfDir, out)
    val surviving = Seq("train", "val", "test").flatMap { s =>
      spark.read.parquet(s"$out/$s").select("doc_id").collect().map(_.getLong(0))
    }.toSet
    members.filter(!_._2).foreach { case (id, _) =>
      assert(!surviving.contains(id), s"non-keeper $id survived dedup")
    }
  }
}
