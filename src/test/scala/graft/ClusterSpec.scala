package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** x44 dedup clustering: the connectedComponents primitive and the
  * end-to-end cluster/keeper contracts. Value parity with the recursive-CTE
  * DuckDB twin is the Verify gate's job. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  /** Runs BOTH the driver-side union-find (default threshold) and the
    * distributed loop (threshold 0) and asserts they agree — every CC test
    * below exercises both strategies. */
  private def cc(nodeIds: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val local = DedupQueries.connectedComponents(
      nodeIds.toDF("id"), edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = DedupQueries.connectedComponents(
      nodeIds.toDF("id"), edges.toDF("a", "b"), 25, 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, s"local union-find and distributed loop disagree:\n$local\n$dist")
    local
  }

  test("connectedComponents: chain, star, and singletons resolve to min labels") {
    val labels = cc(
      (1L to 12L),
      // a 6-chain (worst case for plain propagation), a star, one pair
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
        (8L, 7L), (8L, 9L), (8L, 10L), (11L, 12L)))
    assert((1L to 6L).forall(labels(_) == 1L), s"chain: $labels")
    assert((7L to 10L).forall(labels(_) == 7L), s"star: $labels")
    assert(labels(11L) == 11L && labels(12L) == 11L)
  }

  test("connectedComponents: 60-hop chain converges (path halving, not diameter rounds)") {
    val n = 60L
    val labels = cc((1L to n), (1L until n).map(i => (i, i + 1)))
    assert(labels.values.forall(_ == 1L), "single component expected")
  }

  test("connectedComponents: exhausted iteration budget throws, never returns partial labels") {
    // a 60-chain cannot reach its fixed point in one round; the distributed
    // loop (threshold 0) must fail loudly rather than hand back wrong labels
    val n = 60L
    val e = intercept[IllegalStateException] {
      DedupQueries.connectedComponents(
        (1L to n).toDF("id"), (1L until n).map(i => (i, i + 1)).toDF("a", "b"),
        maxIter = 1, localMaxEdges = 0L)
        .collect()
    }
    assert(e.getMessage.contains("still changing"), e.getMessage)
  }

  test("x44 clusters are edge-consistent and keepers are the longest members") {
    val out = DedupQueries.x44(spark, sfDir).collect()
    assert(out.nonEmpty, "sf0.001 corpus must contain near-dup chains")
    // recompute membership + edges independently
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"),
        array_distinct(split(col("text"), " ")).as("tk"))
    val ta = docs.select(col("doc_id").as("a"), col("tk").as("ta"))
    val tb = docs.select((col("doc_id") - 1).as("a"), col("doc_id").as("b"), col("tk").as("tb"))
    val edges = ta.join(tb, "a")
      .filter(size(array_intersect(col("ta"), col("tb")))
        / size(array_union(col("ta"), col("tb"))).cast("double") >= 0.6)
      .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val lab = DedupQueries.connectedComponents(
      docs.select(col("doc_id").as("id")),
      edges.toSeq.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge's endpoints agree on the cluster
    edges.foreach { case (a, b) =>
      assert(lab(a) == lab(b), s"edge ($a,$b) split across clusters")
    }
    val chars = docs.select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (cid, size, keeperId, keeperChars) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val members = lab.filter(_._2 == cid).keys.toSeq
      assert(members.size == size, s"cluster $cid size")
      assert(members.contains(keeperId))
      assert(members.forall(m => chars(m) <= keeperChars),
        s"keeper $keeperId is not the longest in $cid")
    }
  }

  test("x182 split leakage equals an independent replay from x44 members + the x71 split") {
    // independent reference: cluster membership via the SHARED clusterMembers
    // (its own correctness is pinned by the x44 oracle + specs), split via a
    // driver-side md5 replay of the x70/x71 bucket convention
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16) % 10000
    }
    def splitOf(id: Long): String = {
      val b = bucket(id)
      if (b < 8000) "train" else if (b < 9000) "val" else "test"
    }
    val mem = DedupQueries.clusterMembers(spark, sfDir)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCl = mem.groupBy(_._2).filter(_._2.length >= 2)
    val docSplit = mem.map(_._1).map(id => id -> splitOf(id)).toMap
    val crossDocs = byCl.values.flatMap { ms =>
      val splits = ms.map(m => docSplit(m._1)).toSet
      if (splits.size > 1) ms.map(_._1) else Nil
    }.toSet
    val clusteredDocs = byCl.values.flatten.map(_._1).toSet
    val allDocs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    def f6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = Seq("test", "train", "val").map { sp =>
      val nd = allDocs.count(splitOf(_) == sp).toLong
      val nc = clusteredDocs.count(splitOf(_) == sp).toLong
      val nx = crossDocs.count(splitOf(_) == sp).toLong
      (sp, nd, nc, nx, f6(nx.toDouble / nd))
    }
    val got = DedupQueries.queries("x182_split_leakage")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // the audit must actually see leakage on this duplicate-heavy corpus
    info(s"per-split (n_docs, n_clustered, n_cross): $got")
  }
}
