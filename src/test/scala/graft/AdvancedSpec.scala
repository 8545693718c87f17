package graft

import org.apache.spark.sql.functions._
import graft.functions.Salting
import graft.operators.{AdvancedQueries, VectorQueries}
import graft.streaming._

/** Salting equivalence, IVF recall, continuous streaming analytics. */
class AdvancedSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result equals plain join on skewed data") {
    // 10k rows, 90% on one hot key
    val big = spark.range(0, 10000)
      .select((when($"id" % 10 === 0, $"id" % 7).otherwise(lit(42L))).as("k"), $"id".as("v"))
    val small = Seq((42L, "hot"), (1L, "a"), (3L, "b"), (99L, "miss")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Salting.saltedJoin(big, small, "k", 8).select("k", "v", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("salted count equals plain count per key") {
    val big = spark.range(0, 5000)
      .select(when($"id" % 5 === 0, $"id" % 3).otherwise(lit(7L)).as("k"))
    val plain = big.groupBy("k").count().as[(Long, Long)].collect().toMap
    val salted = Salting.saltedCount(big, "k", 8).as[(Long, Long)].collect().toMap
    assert(salted == plain)
  }

  test("x64 approx percentiles: rank error bounded vs exact q35") {
    // The deterministic bottom-k(=1024)-by-hash sample estimates quantiles
    // with rank error O(n·√(q(1−q)/k)) ≈ 1.6%·n at p50; assert the picked
    // values sit within a generous value-epsilon of the exact order
    // statistics from q35 (events.value is dense enough at sf0.001 that
    // rank error ~ value error).
    val exact = AdvancedQueries.q35(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val approx = AdvancedQueries.x64(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      val span = math.max(1e-9, math.abs(p90) + math.abs(p50))
      assert(math.abs(a50 - p50) / span < 0.05, s"$k p50: exact=$p50 approx=$a50")
      assert(math.abs(a90 - p90) / span < 0.05, s"$k p90: exact=$p90 approx=$a90")
    }
  }

  test("x108 rank quantiles: exact order statistics, q35-consistent, monotone in q") {
    val got = AdvancedQueries.x108(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    // independent reference: local sort per group, pick ⌊(n−1)·q⌋
    val vals = Tables.t(spark, sfDir, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    assert(got.keySet == vals.keySet.flatMap(k => qs.map(k -> _)))
    vals.foreach { case (k, sorted) =>
      val n = sorted.length
      qs.foreach { q =>
        val (qv, gotN) = got((k, q))
        assert(gotN == n.toLong)
        assert(qv == sorted(math.floor((n - 1) * q).toInt),
          s"$k q=$q: got $qv want ${sorted(math.floor((n - 1) * q).toInt)}")
      }
      // monotone in q (sorted-element selection guarantees it; assert anyway)
      val picked = qs.map(q => got((k, q))._1)
      assert(picked == picked.sorted, s"$k quantiles not monotone: $picked")
    }
    // p50 agrees with q35's exact element pick (ceil(n·0.5) 1-indexed equals
    // ⌊(n−1)·0.5⌋ 0-indexed for even n, and for odd n both hit the middle)
    val q35p50 = AdvancedQueries.q35(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    q35p50.foreach { case (k, p50) => assert(got((k, 0.5))._1 == p50, s"$k p50 vs q35") }
  }

  test("IVF ANN: top-10 is a plausible subset with bounded recall loss") {
    val brute = operators.VectorQueries.q29(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    val ivf = AdvancedQueries.x22(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.size == 10)
    assert(ivf.contains(0L), "query vector must match itself")
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    // 6/16 buckets probed on near-orthogonal vectors: expect at least the
    // probe fraction's worth of the true top-10
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("continuous analytics stream republisher: 8 rows per snapshot, matches batch") {
    val work = tmpDir("graft-cont")
    val topic = FileTopic(s"$work/topic")
    val out = FileTopic(s"$work/analytics")
    TradeGen.produce(spark, topic, 1000L)
    val q = AnalyticsPipeline.startContinuousAnalytics(spark, topic, out,
      s"$work/ckpt", org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    val msgs = out.readBatch(spark)
    assert(msgs.count() == 8L)
    val parsed = msgs.select(from_json($"value", AnalyticsPipeline.analyticsSchema).as("d"))
      .select($"d.*").orderBy($"symbol")
    val direct = AnalyticsPipeline.tradeStats(
      topic.readBatch(spark)
        .select(from_json($"value", AnalyticsPipeline.tradeSchema).as("d")).select($"d.*"))
      .orderBy($"symbol")
    assert(parsed.collect().map(_.toSeq).toSeq == direct.collect().map(_.toSeq).toSeq)
  }

  /** Independent Scala recompute of the x25/x26 shared front: TRAINED
    * centroid assignment (argmax dot, tie -> max cid) and within-cluster
    * cosines, in the same double op order as the Spark/DuckDB formulations.
    * The centroids come from the trainer (whose own arithmetic QuantizerSpec
    * and the x83 oracle verify); everything downstream is recomputed here. */
  private def clusteredCosines() = {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def dotD(a: Array[Float], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    val cents = operators.Quantizers.trainedKm(spark, sfDir).cents
    val cid = embs.map { case (id, e) =>
      // max score, tie -> max cid (the struct-max comparator)
      id -> cents.map { case (c, ce) => (dotD(e, ce), c) }.max._2
    }.toMap
    val cos = (a: Array[Float], b: Array[Float]) =>
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    (embs, cid, cos)
  }

  test("x25 semantic dedup: keep flags match a brute-force within-cluster recompute") {
    val (embs, cid, cos) = clusteredCosines()
    val byId = embs.toMap
    val expected = embs.map { case (id, e) =>
      val dropped = embs.exists { case (oid, oe) =>
        oid < id && cid(oid) == cid(id) &&
          math.floor(cos(oe, e) * 1e4 + (if (cos(oe, e) >= 0) 0.5 else -0.5)) / 1e4 > 0.3
      }
      id -> (if (dropped) 0L else 1L)
    }.toMap
    val got = AdvancedQueries.x25(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(got.length == embs.length) // one row per vector
    got.foreach { case (id, (c, keep)) =>
      assert(c == cid(id), s"vec $id cluster: got $c want ${cid(id)}")
      assert(keep == expected(id), s"vec $id keep: got $keep want ${expected(id)}")
    }
    assert(got.count(_._2._2 == 0L) > 0, "threshold should drop at least one near-dup")
    assert(byId.nonEmpty)
  }

  test("x26 knn graph: every vector ranked, sims non-increasing, top-1 exact") {
    val (embs, cid, cos) = clusteredCosines()
    val rows = AdvancedQueries.x26(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byVec = rows.groupBy(_._1)
    assert(byVec.keySet.size == embs.length, "every vector gets neighbors (no empty clusters at this nlist)")
    byVec.foreach { case (_, nbrs) =>
      val sims = nbrs.sortBy(_._2).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "sims non-increasing in rank")
    }
    // top-1 neighbor matches the brute-force within-cluster argmax
    embs.foreach { case (id, e) =>
      val mates = embs.filter { case (oid, _) => oid != id && cid(oid) == cid(id) }
      if (mates.nonEmpty) {
        val best = mates.map { case (oid, oe) =>
          val s = cos(oe, e)
          (math.floor(s * 1e4 + (if (s >= 0) 0.5 else -0.5)) / 1e4, oid)
        }.maxBy { case (s, oid) => (s, -oid) } // max sim, tie -> min id
        val got = byVec(id).minBy(_._2)
        assert(got._3 == best._2 && got._4 == best._1,
          s"vec $id top-1: got (${got._3},${got._4}) want (${best._2},${best._1})")
      }
    }
  }

  test("x27 retrieval join equals brute force restricted to each query's probe set") {
    val (embs, cid, cos) = clusteredCosines()
    val cents = operators.Quantizers.trainedKm(spark, sfDir).cents
    def dotA(a: Array[Float], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    val got = AdvancedQueries.x27(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    embs.filter(_._1 < 100).foreach { case (qid, qe) =>
      // probe set: top-6 centroids by dot, tie -> lower cid
      val probes = cents.map { case (c, ce) => (dotA(qe, ce), c) }
        .sortBy { case (sc, c) => (-sc, c) }.take(6).map(_._2).toSet
      val best = embs
        .filter { case (oid, _) => oid != qid && probes.contains(cid(oid)) }
        .map { case (oid, oe) =>
          val s = cos(oe, qe)
          (math.floor(s * 1e4 + (if (s >= 0) 0.5 else -0.5)) / 1e4, oid)
        }
        .sortBy { case (s, oid) => (-s, oid) }.take(3)
      val mine = got(qid).sortBy(_._2).map(r => (r._4, r._3)).toSeq
      assert(mine == best.toSeq, s"q$qid: got $mine want ${best.toSeq}")
    }
  }

  test("x29 recall@3 equals a Scala brute-force intersection with x27") {
    val (embs, _, cos) = clusteredCosines()
    val approx = AdvancedQueries.x27(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val got = AdvancedQueries.x29(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == approx.size, "one row per query, including zero-hit queries")
    got.foreach { case (qid, nHit, recall) =>
      val qe = embs.find(_._1 == qid).get._2
      val exact = embs.filter(_._1 != qid)
        .map { case (oid, oe) =>
          val s = cos(oe, qe)
          (math.floor(s * 1e4 + (if (s >= 0) 0.5 else -0.5)) / 1e4, oid)
        }
        .sortBy { case (s, oid) => (-s, oid) }.take(3).map(_._2).toSet
      val want = approx(qid).intersect(exact).size
      assert(nHit == want, s"q$qid: n_hit=$nHit want $want")
      assert(math.abs(recall - math.floor(nHit / 3.0 * 1e4 + 0.5) / 1e4) < 1e-9)
    }
    // the eval must be informative: IVF with 6/16 probes on this corpus
    // should recover well over half the true neighbors overall
    val mean = got.map(_._3).sum / got.length
    assert(mean > 0.5, s"suspiciously low mean recall $mean")
  }

  test("x28 serves x27's exact output from the persisted index, partitions pruned") {
    val fresh = AdvancedQueries.x27(spark, sfDir).collect().toSeq
    val served = AdvancedQueries.x28(spark, sfDir).collect().toSeq
    assert(served == fresh, "index serving must be indistinguishable from fresh compute")
    val p = AdvancedQueries.x28(spark, sfDir).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p).isDefined,
      "index scan must carry a static cid partition filter:\n" + p)
  }

  test("x80 serves x57's exact output from the persisted index: pruned, codes-only scan") {
    val fresh = AdvancedQueries.x57(spark, sfDir).collect().toSeq
    val served = AdvancedQueries.queries("x80_indexed_ivfpq")(spark, sfDir).collect().toSeq
    assert(served == fresh, "ADC index serving must be indistinguishable from fresh compute")
    val p = AdvancedQueries.queries("x80_indexed_ivfpq")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p).isDefined,
      "index scan must carry a static cid partition filter:\n" + p)
    // the serving path reads ONLY the 4-bit code columns — never embedding
    val schema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(schema.contains("c0") && !schema.contains("embedding"),
      s"serving scan must read codes only: $schema")
  }

  test("x85 refine: codes-tier shortlist, bounded exact re-rank, recall lifted over ADC-only") {
    val truth = AdvancedQueries.x27(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val served = AdvancedQueries.queries("x85_refine_search")(spark, sfDir).collect()
    assert(served.length == 300, s"3 hits x 100 queries: ${served.length}")
    // exactness of the served SCORES: every refine sim is the true cosine,
    // so it must equal the x27 sim whenever the (q, vec) pair is in both
    val exactSims = AdvancedQueries.x27(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    served.foreach { r =>
      exactSims.get((r.getLong(0), r.getLong(2))).foreach { want =>
        assert(r.getDouble(3) == want, s"refine sim drifted for ${(r.getLong(0), r.getLong(2))}")
      }
    }
    // the shortlist stage reads codes + the 8-byte norm from probed
    // partitions only — never embedding bytes
    val sp = AdvancedQueries.refineShortlist(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(sp).isDefined,
      "shortlist scan must carry a static cid partition filter:\n" + sp)
    val schema = "ReadSchema: [^\\n]*".r.findFirstIn(sp).getOrElse("")
    assert(schema.contains("c0") && !schema.contains("embedding"),
      s"shortlist scan must read codes+nrm only: $schema")
    // bounded: at most k·nprobe ids per query
    val short = AdvancedQueries.refineShortlist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    short.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 18, s"q$q shortlist ${rows.length} > k·nprobe")
    }
    // the refine payoff: exact re-rank of the shortlist recovers MORE of
    // the true top-3 than trusting the ADC ranking's own top-3 (and scores
    // are exact either way a row survives) — the FAISS refine premise
    def recall(hits: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) => hits.getOrElse(q, Set.empty).intersect(t).size / 3.0 }
        .sum / truth.size
    val adcTop3 = short.filter(_._3 <= 3).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val refineTop3 = served.map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val (ra, rr) = (recall(adcTop3), recall(refineTop3))
    info(s"recall@3: adc-only=$ra refine=$rr")
    assert(rr > ra, s"refine must lift recall over ADC-only: $rr <= $ra")
  }

  test("VectorDemo lifecycle: hygiene, build-once/serve-both, eval, dedup — reproducible") {
    val r1 = VectorDemo.run(spark, sfDir)
    assert(r1.vectors == graft.Tables.t(spark, sfDir, "embeddings").count())
    assert(r1.outliers < r1.vectors)
    assert(r1.servedExact == 300L, s"x28 serves 3 hits x 100 queries: ${r1.servedExact}")
    assert(r1.servedAdc == 10L)
    assert(r1.servedRefine == 300L, s"x85 serves 3 hits x 100 queries: ${r1.servedRefine}")
    assert(r1.meanRecall > 0.5, s"index quality gate: ${r1.meanRecall}")
    val r2 = VectorDemo.run(spark, sfDir)
    assert(r1 == r2, "the lifecycle must be deterministic")
  }

  test("x24 quantization: error bounded by half a quant step, zero vectors safe") {
    val rows = operators.VectorQueries.x24(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (maxAbs, qMin, qMax, errMax) = (r.getDouble(2), r.getLong(3), r.getLong(4), r.getDouble(6))
      // int8 range respected and reconstruction error <= step/2 (+ rounding slack)
      assert(qMin >= -127 && qMax <= 127, s"q out of int8 range: $r")
      assert(errMax <= 0.5 * maxAbs / 127.0 + 1e-6, s"error above half-step: $r")
      if (maxAbs > 0) assert(qMax == 127 || qMin == -127,
        s"scale must map the max-magnitude dim to ±127: $r")
    }
  }

  test("x49 chunking: full token coverage, correct overlap, budget respected") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = operators.CurationQueries.x49(spark, sfDir)
      .select(col("doc_id"), col("chunk_id"), col("n_toks")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (cs, st) = (operators.CurationQueries.chunkSize, operators.CurationQueries.chunkStride)
    chunks.groupBy(_._1).foreach { case (id, cks) =>
      val n = docs(id)
      val sorted = cks.sortBy(_._2)
      // every chunk but the last is full-budget; ids are 1..k contiguous
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      sorted.init.foreach { case (_, _, t) => assert(t == cs, s"doc $id: short mid-chunk") }
      assert(sorted.map(_._3).forall(_ <= cs))
      // coverage: last chunk must reach the last token exactly
      val lastStart = (sorted.length - 1) * st
      assert(lastStart + sorted.last._3 == n, s"doc $id: tokens uncovered")
      // minimality: one fewer chunk would leave a gap (unless single-chunk)
      if (sorted.length > 1)
        assert((sorted.length - 2) * st + cs < n, s"doc $id: redundant trailing chunk")
    }
  }

  test("x139: integer PageRank matches a plain-Scala replay of the same 5 rounds") {
    val edges = operators.AdvancedQueries.x26(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val nodes = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id")).as[Long].collect().toSeq
    val outd = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.toSeq.groupBy(_._2)
        .map { case (dst, es) => dst -> es.map { case (s, _) => pr(s) / outd(s) }.sum }
      pr = nodes.map(n => n -> (150000L + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    val expected = nodes.map(n => (n, pr(n)))
      .sortBy { case (id, p) => (-p, id) }.take(20).zipWithIndex
      .map { case ((id, p), i) => (i + 1L, id, p) }
    val got = operators.AdvancedQueries.x139(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got ${got.take(3)} … expected ${expected.take(3)} …")
    // the damped floor is the minimum attainable score
    assert(got.forall(_._3 >= 150000L))
  }

  test("x155: onion layers match a naive synchronous k=4 peel of the kNN graph") {
    val und = operators.AdvancedQueries.x26(spark, sfDir).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(2)), math.max(r.getLong(0), r.getLong(2))))
      .distinct
    var edges = und.toSet
    def degs(es: Set[(Long, Long)]): Map[Long, Int] =
      es.toSeq.flatMap { case (u, v) => Seq(u, v) }.groupBy(identity).map { case (k, xs) => k -> xs.size }
    val init = degs(edges)
    var keep = init.keySet
    val expect = scala.collection.mutable.Map[Long, Long]()
    for (i <- 1 to 8) {
      val d = degs(edges)
      val keepNext = d.filter(_._2 >= 4).keySet
      (keep -- keepNext).foreach(n => expect(n) = i.toLong)
      edges = edges.filter { case (u, v) => keepNext(u) && keepNext(v) }
      keep = keepNext
    }
    keep.foreach(n => expect(n) = 0L)
    val got = operators.AdvancedQueries.x155(spark, sfDir).collect()
    assert(got.length == init.size, "one row per node with at least one edge")
    got.foreach { r =>
      val (id, layer, deg) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(deg == init(id).toLong, s"init_degree($id)")
      assert(layer == expect(id), s"layer($id): $layer vs ${expect(id)}")
    }
    // the peel must actually stratify (more than one distinct layer), or
    // the decomposition is vacuous on this corpus
    assert(got.map(_.getLong(1)).distinct.length > 1, "multiple onion layers")
  }

  test("x148: triangle counts match a naive all-triples check over the undirected kNN graph") {
    val und = operators.AdvancedQueries.x26(spark, sfDir).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(2)), math.max(r.getLong(0), r.getLong(2))))
      .distinct.toSet
    val nodes = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id")).as[Long].collect().toSeq
    val adj = (und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    val got = operators.AdvancedQueries.x148(spark, sfDir).collect()
    assert(got.length == nodes.length, "one row per corpus vector")
    got.foreach { r =>
      val (id, deg, tri) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val nbrs = adj.getOrElse(id, Set.empty)
      assert(deg == nbrs.size.toLong, s"degree($id): $deg vs ${nbrs.size}")
      // naive: triangles at this node = neighbor pairs that are themselves edges
      val ns = nbrs.toSeq.sorted
      val expect = (for (i <- ns.indices; j <- i + 1 until ns.size
        if und.contains((ns(i), ns(j)))) yield 1).size.toLong
      assert(tri == expect, s"triangles($id): $tri vs $expect")
      if (deg < 2) assert(r.isNullAt(3), s"degree<2 must emit NULL coefficient: $r")
      else {
        val c = 2.0 * tri / (deg.toDouble * (deg.toDouble - 1.0))
        assert(math.abs(r.getDouble(3) - c) < 1e-6, s"coefficient($id)")
      }
    }
    // the kNN graph at this sf must actually contain triangles, or the test is vacuous
    assert(got.map(_.getLong(2)).sum > 0, "corpus has no triangles — fixture too sparse")
  }

  test("x163: LPA communities match a plain-Scala synchronous 4-round replay") {
    val und = operators.AdvancedQueries.x26(spark, sfDir).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(2)), math.max(r.getLong(0), r.getLong(2))))
      .distinct
    val nbrs = und.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2) }
    val nodes = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id")).as[Long].collect().toSeq
    var lab = nodes.map(n => n -> n).toMap
    var lastMoves = 0L
    for (_ <- 1 to 4) {
      val next = nodes.map { n =>
        nbrs.get(n) match {
          case Some(ns) =>
            val cnt = ns.map(lab).groupBy(identity).map { case (l, xs) => (l, xs.size) }
            n -> cnt.toSeq.maxBy { case (l, c) => (c, -l) }._1 // majority, tie min label
          case None => n -> n
        }
      }.toMap
      lastMoves = nodes.count(n => next(n) != lab(n)).toLong
      lab = next
    }
    val expected = lab.values.groupBy(identity).toSeq
      .map { case (l, xs) => (l, xs.size.toLong) }
      .sortBy { case (l, n) => (-n, l) }.take(20).zipWithIndex
      .map { case ((l, n), i) => (i + 1L, l, n, lastMoves) }
    val got = operators.AdvancedQueries.x163(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got ${got.take(3)} … expected ${expected.take(3)} …")
    // communities must be non-trivial: strictly fewer labels than nodes
    assert(lab.values.toSet.size < nodes.size, "LPA merged nothing — fixture too sparse")
  }

  test("x181 matryoshka recall equals an independent driver-side brute replay") {
    import org.apache.spark.sql.functions.col
    // independent reference at spec scale: collect the corpus and replay
    // every tier's top-3 with plain Scala in the same comparator order
    val rows = graft.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def simAt(m: Int, a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        (0 until m).foldLeft(0.0)((acc, i) => acc + x(i).toDouble * y(i).toDouble)
      r4(d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b))))
    }
    val qs = rows.filter(_._1 < 100)
    def top3(m: Int, qid: Long, qv: Array[Float]): Set[Long] =
      rows.filter(_._1 != qid)
        .map { case (id, v) => (simAt(m, v, qv), id) }
        .sortBy { case (sim, id) => (-sim, id) }.take(3).map(_._2).toSet
    val expect = (for {
      (qid, qv) <- qs
      truth = top3(64, qid, qv)
      m <- Seq(8, 16, 32)
    } yield ((m.toLong, qid), {
      val hit = top3(m, qid, qv).count(truth.contains).toLong
      (hit, r4(hit / 3.0))
    })).toMap
    val got = AdvancedQueries.queries("x181_matryoshka_recall")(spark, sfDir).collect()
    assert(got.length == expect.size, s"rows ${got.length} vs ${expect.size}")
    got.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(expect(k) == ((r.getLong(2), r.getDouble(3))), s"mismatch at $k: $r")
    }
    // monotone-on-average sanity: more dimensions should not hurt recall
    val mean = got.groupBy(_.getLong(0)).view.mapValues(rs =>
      rs.map(_.getDouble(3)).sum / rs.length).toMap
    info(s"mean recall by tier: $mean")
    assert(mean(32L) >= mean(8L) - 0.05, s"tier-32 recall ${mean(32L)} < tier-8 ${mean(8L)}")
  }
}
