package graft

import org.apache.spark.sql.functions._
import graft.operators.{AdvancedQueries, Quantizers, VectorQueries}

/** E73/E74 — k-means quantizer training: the Lloyd's guarantees (monotone
  * objective/distortion), unit-norm invariants, and the payoff assertions
  * (training must beat the seed convention it starts from: ANN recall up,
  * PQ distortion down). Arithmetic parity with DuckDB is the x83/x84 oracle
  * gate's job; this spec owns the semantic properties. */
class QuantizerSpec extends SparkSpec {

  // Fix-point slack for the monotonicity assertions: each centroid
  // coordinate is quantized to the nearest micro-unit when the means are
  // fixed (≤0.5e-6 absolute error per coordinate), and a row's objective
  // term can move by at most dim × that; summed over the corpus the drift
  // bound is rows × dim × 0.5 micro-units. Derived here from the actual
  // corpus/model sizes rather than a hard-coded constant so a testdata
  // regeneration at a different scale or dimension does not flake the
  // suite (ADVICE r8). The strict-improvement assertions below
  // (trace.last beats trace.head, trained recall >= seeded) are
  // corpus-dependent by design: they hold for any corpus where training is
  // not a no-op, which a degenerate (e.g. all-identical-vector) corpus
  // could violate.
  private lazy val embRows: Long = graft.Tables.t(spark, sfDir, "embeddings").count()
  private def slack(dim: Long): Long = math.max(50L, embRows * dim / 2000000L + 50L)

  test("x83 spherical k-means: objective monotone non-decreasing, trace well-formed") {
    val m = Quantizers.trainedKm(spark, sfDir)
    assert(m.trace.length == Quantizers.kmRounds)
    assert(m.trace.map(_._1).toSeq == (0L until Quantizers.kmRounds.toLong))
    // the spherical-k-means guarantee, modulo fix-point quantization of the
    // centroid means (see `slack` — scales with corpus rows × dim)
    val eps = slack(m.cents.head._2.length.toLong)
    m.trace.map(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - eps, s"objective regressed: $a -> $b (slack $eps)")
    }
    // training must actually move the needle vs the seeded start
    assert(m.trace.last._2 > m.trace.head._2,
      s"no improvement: ${m.trace.head._2} -> ${m.trace.last._2}")
  }

  test("x83 trained centroids are unit vectors with stable cids") {
    val m = Quantizers.trainedKm(spark, sfDir)
    assert(m.cents.map(_._1).toSeq == (0L until 16L))
    m.cents.foreach { case (cid, c) =>
      val nrm = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
      assert(math.abs(nrm - 1.0) < 1e-9, s"cid $cid norm $nrm")
    }
  }

  test("x84 PQ Lloyd's: distortion monotone non-increasing, beats the seeded codebooks") {
    val m = Quantizers.trainedPq(spark, sfDir)
    assert(m.trace.length == Quantizers.pqRounds)
    // per-subspace distortion terms quantize like the k-means objective;
    // the PQ sum spans pqM subspaces of pqDims dims = the full dim width
    val eps = slack(m.cbs.map(_.head._1.length.toLong).sum)
    m.trace.map(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + eps, s"distortion regressed: $a -> $b (slack $eps)")
    }
    // round 0 is measured under the SEED codebooks — the final round
    // strictly improving on it is "training beats the seed convention"
    assert(m.trace.last._2 < m.trace.head._2,
      s"no improvement: ${m.trace.head._2} -> ${m.trace.last._2}")
  }

  test("trained IVF recall@3 beats the seeded-centroid index") {
    def meanRecall(cents: Array[(Long, Array[Double])]): Double = {
      val r = AdvancedQueries.recallWith(spark, sfDir, cents)
        .select(col("recall")).collect().map(_.getDouble(0))
      r.sum / r.length
    }
    val seeded = meanRecall(AdvancedQueries.seedCentroids(
      graft.Tables.t(spark, sfDir, "embeddings")))
    val trained = meanRecall(Quantizers.trainedCents(spark, sfDir))
    info(s"recall@3: seeded=$seeded trained=$trained")
    assert(trained >= seeded,
      s"trained index must not lose recall: $trained < $seeded")
  }

  test("x87 SQ8 search equals an independent Scala reference; codes stay 8-bit") {
    // Independent reference: collect the sf0.001 corpus (100 rows — spec
    // scale only; the operator itself never collects data) and re-run the
    // whole SQ8 chain with plain Scala arithmetic in the same association
    // order (foldLeft = floatDoubleDot's left-to-right accumulation).
    val rows = graft.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val dim = rows.head._2.length
    val mn = Array.tabulate(dim)(i => rows.map(_._2(i).toDouble).min)
    val mx = Array.tabulate(dim)(i => rows.map(_._2(i).toDouble).max)
    def codeOf(x: Double, d: Int): Double =
      if (mx(d) == mn(d)) 0.0
      else math.floor((x - mn(d)) / (mx(d) - mn(d)) * 255.0 + 0.5)
    // 8-bit invariant: every code lands in [0, 255]
    rows.foreach { case (_, v) =>
      (0 until dim).foreach { i =>
        val c = codeOf(v(i).toDouble, i)
        assert(c >= 0.0 && c <= 255.0, s"code $c out of byte range at dim $i")
      }
    }
    val deq = rows.map { case (id, v) =>
      (id, Array.tabulate(dim)(i =>
        mn(i) + codeOf(v(i).toDouble, i) * (mx(i) - mn(i)) / 255.0))
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = rows.filter(_._1 < VectorQueries.sqQn).flatMap { case (qid, qv) =>
      deq.filter(_._1 != qid)
        .map { case (cid, dv) =>
          val sc = (0 until dim).foldLeft(0.0)((a, i) => a + qv(i).toDouble * dv(i))
          (cid, r6(sc))
        }
        .sortBy { case (cid, sc) => (-sc, cid) }
        .take(VectorQueries.sqK).zipWithIndex
        .map { case ((cid, sc), rk) => (qid, rk + 1L, cid, sc) }
    }.toSeq
    val got = VectorQueries.x87(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
  }

  test("x91 PCA training: orthonormal axes, descending spectrum, eigen + trace identities") {
    val m = Quantizers.trainedPca(spark, sfDir)
    val dim = m.mean.length
    // covariance is symmetric with nonnegative diagonal
    for (i <- 0 until dim; j <- i until dim)
      assert(m.cov(i)(j) == m.cov(j)(i))
    (0 until dim).foreach(i => assert(m.cov(i)(i) >= -1e-12))
    // full spectrum: descending, trace-preserving (Σλ = tr C — rotations
    // preserve the trace exactly up to fp roundoff)
    m.eigVals.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-12) }
    val trace = (0 until dim).foldLeft(0.0)((a, i) => a + m.cov(i)(i))
    assert(math.abs(m.eigVals.sum - trace) < 1e-9, s"${m.eigVals.sum} vs $trace")
    // axes orthonormal and actually eigen: ‖Cv − λv‖∞ small
    for (k <- 0 until dim; l <- k until dim) {
      val d = (0 until dim).foldLeft(0.0)((a, i) => a + m.eigVecs(k)(i) * m.eigVecs(l)(i))
      if (k == l) assert(math.abs(d - 1.0) < 1e-9, s"axis $k not unit: $d")
      else assert(math.abs(d) < 1e-9, s"axes $k,$l not orthogonal: $d")
    }
    for (k <- 0 until Quantizers.pcaP) {
      val v = m.eigVecs(k); val lam = m.eigVals(k)
      (0 until dim).foreach { i =>
        val cvi = (0 until dim).foldLeft(0.0)((a, j) => a + m.cov(i)(j) * v(j))
        assert(math.abs(cvi - lam * v(i)) < 1e-8, s"axis $k row $i: $cvi vs ${lam * v(i)}")
      }
    }
  }

  test("x92 PCA projection equals a naive recompute; residual nonneg and shrinks with axes") {
    val m = Quantizers.trainedPca(spark, sfDir)
    val dim = m.mean.length
    val rows = graft.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val muDotV = m.eigVecs.take(Quantizers.pcaP).map(v =>
      v.indices.foldLeft(0.0)((a, i) => a + m.mean(i) * v(i)))
    val muNorm = m.mean.foldLeft(0.0)((a, x) => a + x * x)
    val expect = rows.map { case (id, x) =>
      val ys = (0 until Quantizers.pcaP).map { k =>
        (0 until dim).foldLeft(0.0)((a, i) => a + x(i).toDouble * m.eigVecs(k)(i)) - muDotV(k)
      }
      val c2 = (0 until dim).foldLeft(0.0)((a, i) => a + x(i).toDouble * x(i).toDouble) -
        2.0 * (0 until dim).foldLeft(0.0)((a, i) => a + x(i).toDouble * m.mean(i)) + muNorm
      val resid = ys.map(y => y * y).reduce(_ + _)
      (id, ys.map(r6), r6(c2 - resid))
    }.toSeq
    val got = Quantizers.x92(spark, sfDir).collect().map { r =>
      (r.getLong(0),
        (1 to Quantizers.pcaP).map(r.getDouble),
        r.getDouble(Quantizers.pcaP + 1))
    }.toSeq
    assert(got == expect)
    // residual is unexplained variance: nonnegative (mod fix-point slack),
    // and keeping all pcaP axes explains at least as much as the top 2
    got.foreach { case (id, _, res) => assert(res >= -1e-6, s"vec $id resid $res") }
    val resid2 = rows.map { case (_, x) =>
      val ys = (0 until 2).map { k =>
        (0 until dim).foldLeft(0.0)((a, i) => a + x(i).toDouble * m.eigVecs(k)(i)) - muDotV(k)
      }
      val c2 = (0 until dim).foldLeft(0.0)((a, i) => a + x(i).toDouble * x(i).toDouble) -
        2.0 * (0 until dim).foldLeft(0.0)((a, i) => a + x(i).toDouble * m.mean(i)) + muNorm
      c2 - ys.map(y => y * y).sum
    }
    val residP = got.map(_._3)
    assert(residP.sum <= resid2.sum + 1e-6,
      s"more axes must not explain less: ${residP.sum} vs ${resid2.sum}")
  }

  test("x93 OPQ-lite: balanced rotation preserves energy and beats plain PQ distortion") {
    val opq = Quantizers.trainedOpq(spark, sfDir)
    val plain = Quantizers.trainedPq(spark, sfDir)
    // Lloyd's invariant carries over to the rotated corpus
    val eps = slack(64L)
    opq.trace.map(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + eps, s"distortion regressed: $a -> $b")
    }
    // the whole point: the orthonormal pre-rotation + balanced allocation
    // lowers final trained distortion vs the identity layout (corpus-
    // dependent by design — holds for any corpus whose spectrum is uneven)
    assert(opq.trace.last._2 < plain.trace.last._2,
      s"OPQ must beat plain PQ: ${opq.trace.last._2} vs ${plain.trace.last._2}")
    // rotation is orthonormal: per-vector energy preserved through the
    // float32 store (collect is spec-scale only)
    val raw = graft.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x => x.toDouble * x.toDouble).sum).toMap
    Quantizers.opqRotated(spark, sfDir).collect().foreach { r =>
      val e2 = r.getSeq[Float](1).map(x => x.toDouble * x.toDouble).sum
      val orig = raw(r.getLong(0))
      assert(math.abs(e2 - orig) <= 1e-3 * math.max(1.0, orig),
        s"vec ${r.getLong(0)} energy ${e2} vs $orig")
    }
  }

  test("x94 OPQ ADC search equals an independent Scala reference") {
    import graft.operators.VectorQueries.{pqM, pqDims}
    val cbs = Quantizers.trainedOpq(spark, sfDir).cbs
    val rot = Quantizers.opqRotated(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val qv = rot.find(_._1 == 0L).get._2
    // the same arithmetic in the same order: assignment via the
    // ⟨s,s⟩ − 2⟨s,c⟩ + ‖c‖² expansion (ties → lowest code), LUT via the
    // direct Σ(x−c)² accumulation — mirroring pqSubDist / pqLut exactly
    def fdot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    def fddot(a: Array[Float], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i))
    val lut = Array.tabulate(pqM) { i =>
      val sub = qv.slice(i * pqDims, (i + 1) * pqDims)
      cbs(i).map { case (c, _) =>
        sub.zip(c).foldLeft(0.0) { case (acc, (x, cc)) =>
          val t0 = x.toDouble - cc; acc + t0 * t0
        }
      }
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = rot.map { case (id, v) =>
      val raw = (0 until pqM).foldLeft(0.0) { (acc, i) =>
        val sub = v.slice(i * pqDims, (i + 1) * pqDims)
        val code = cbs(i).zipWithIndex.minBy { case ((c, cc), j) =>
          ((fdot(sub, sub) - 2.0 * fddot(sub, c)) + cc, j)
        }._2
        acc + lut(i)(code)
      }
      (id, raw)
    }.sortBy { case (id, raw) => (raw, id) }.take(10)
      .map { case (id, raw) => (id, r6(raw)) }.toSeq
    val got = Quantizers.x94(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect)
  }

  test("x161 silhouette matches a plain-Scala replay over the trained centroids") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val cents = Quantizers.trainedCents(spark, sfDir)
    val embs = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(v: Array[Float], c: Array[Double]): Double =
      v.indices.foldLeft(0.0)((a, i) => a + v(i).toDouble * c(i))
    val per = embs.map { case (_, v) =>
      val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      val scored = cents.map { case (cid, c) => (dot(v, c), cid) }
      val best = scored.max
      val second = scored.filter(_ != best).max
      val a = 1.0 - best._1 / nrm
      val b = 1.0 - second._1 / nrm
      val sil = if (nrm > 0 && math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0
      (best._2, math.floor((sil + 1.0) * 1e6 + 0.5).toLong)
    }
    val expect = per.groupBy(_._1).map { case (cid, xs) =>
      cid -> (xs.length.toLong,
        fr6(xs.map(_._2).sum.toDouble / 1e6 / xs.length.toDouble - 1.0))
    }
    val got = Quantizers.x161(spark, sfDir).collect()
    assert(got.map(_.getLong(1)).sum == embs.length.toLong, "every vector counted once")
    got.foreach { r =>
      val (n, m) = expect(r.getLong(0))
      assert(r.getLong(1) == n && r.getDouble(2) == m,
        s"cid ${r.getLong(0)}: ($n, $m) vs $r")
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0, "silhouette range")
    }
  }

  test("x83/x84 queries return the cached traces in round order") {
    val km = Quantizers.queries("x83_kmeans_ivf")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(km.toSeq == Quantizers.trainedKm(spark, sfDir).trace.toSeq)
    val pq = Quantizers.queries("x84_kmeans_pq")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.toSeq == Quantizers.trainedPq(spark, sfDir).trace.toSeq)
  }

  test("samplePm: identity below the cap, integer-ceil fraction above, floor at 1") {
    import Quantizers.samplePm
    // below/at the target: full corpus, pm = 10000 (the identity branch —
    // plans and gate hashes byte-stable)
    assert(samplePm(500, 4096) == 10000)
    assert(samplePm(4096, 4096) == 10000)
    // above: ceil(10000·target/n) — sf1 PQ (20k, 4096) and sf10 (200k)
    assert(samplePm(20000, 4096) == 2048)
    assert(samplePm(200000, 4096) == 205)
    // km at sf10: 256/centroid × nlist=2048 ≥ 200k ⇒ still full
    assert(samplePm(200000, 256L * 2048) == 10000)
    // km past the nlist cap (the true 100 TB regime): bounded sample
    assert(samplePm(1000000000L, 256L * 65536) == 168)
    // never 0 even for absurd ratios (ceil ≥ 1)
    assert(samplePm(Long.MaxValue / 20000, 1) == 1)
  }

  test("PqArgmin equals the per-subspace struct/array_min tree it replaced (bit-exact)") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorExprs
    import VectorQueries.{pqM, pqDims}
    val e = graft.Tables.t(spark, sfDir, "embeddings")
    val cbs = Quantizers.trainedPq(spark, sfDir).cbs
    // the ORIGINAL expression-tree formulation (kept here as the spec
    // reference; in main code it blew janino's 64 KB method budget and
    // fell back to interpreted execution — the r18 sf10 finding)
    def old(i: Int) = {
      val sv = slice(col("embedding"), i * pqDims + 1, pqDims)
      array_min(array(cbs(i).zipWithIndex.map { case ((c, cc), j) =>
        struct(((VectorExprs.floatDot(sv, sv) -
          lit(2.0) * VectorExprs.floatDoubleDot(sv, typedLit(c))) + lit(cc)).as("d"),
          lit(j).as("c"))
      }: _*))
    }
    val newCols = (0 until pqM).flatMap(i => Seq(
      col("enc").getItem(i).getField("code").as(s"nc$i"),
      col("enc").getItem(i).getField("d").as(s"nd$i")))
    val oldCols = (0 until pqM).flatMap(i => Seq(
      old(i).getField("c").as(s"oc$i"), old(i).getField("d").as(s"od$i")))
    val got = e.withColumn("enc", VectorExprs.pqArgmin(col("embedding"), cbs))
      .select((col("vec_id") +: (newCols ++ oldCols)): _*)
      .collect()
    got.foreach { r =>
      (0 until pqM).foreach { i =>
        assert(r.getAs[Int](s"nc$i") == r.getAs[Int](s"oc$i"),
          s"vec ${r.getLong(0)} sub $i code mismatch")
        // bit-exact doubles, not approx: the twins floor-round these
        assert(java.lang.Double.doubleToRawLongBits(r.getAs[Double](s"nd$i")) ==
          java.lang.Double.doubleToRawLongBits(r.getAs[Double](s"od$i")),
          s"vec ${r.getLong(0)} sub $i d mismatch")
      }
    }
  }

  test("MatVecFloat equals the per-axis dot array it replaced (bit-exact)") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorExprs
    val m = Quantizers.trainedPca(spark, sfDir)
    val perm = Quantizers.opqPerm
    val mat = perm.map(k => m.eigVecs(k)).toArray
    val e = graft.Tables.t(spark, sfDir, "embeddings")
    val rows = e.select(col("vec_id"),
        VectorExprs.matVecFloat(col("embedding"), mat).as("nv"),
        array(perm.map(k =>
          VectorExprs.floatDoubleDot(col("embedding"), typedLit(m.eigVecs(k)))
            .cast("float")): _*).as("ov"))
      .collect()
    rows.foreach { r =>
      val nv = r.getSeq[Float](1); val ov = r.getSeq[Float](2)
      assert(nv.length == ov.length)
      nv.indices.foreach { i =>
        assert(java.lang.Float.floatToRawIntBits(nv(i)) ==
          java.lang.Float.floatToRawIntBits(ov(i)),
          s"vec ${r.getLong(0)} axis $i: ${nv(i)} vs ${ov(i)}")
      }
    }
  }

  test("sample-bounded training holds recall at sf0.1 (VERDICT r17 #1)") {
    // The exact production sample path, forced to bind via the test hook:
    // target 1000 of n=2000 ⇒ pm=5000, the md5-bucket half of the corpus.
    // Seeds stay the full-corpus convention; only the Lloyd's fit samples.
    val dir = "/root/testdata/sf0.1"
    val e = graft.Tables.t(spark, dir, "embeddings")
    val n = e.count()
    assume(n >= 2000, "needs the sf0.1 corpus")
    val nl = 16
    val full = Quantizers.trainKmOn(e, nl, n)
    val sampled = Quantizers.trainKmOn(e, nl, n, sampleTarget = 1000L)
    def meanRecall(cents: Array[(Long, Array[Double])]): Double = {
      val r = AdvancedQueries.recallWith(spark, dir, cents)
        .select(col("recall")).collect().map(_.getDouble(0))
      r.sum / r.length
    }
    val fr = meanRecall(full.cents)
    val sr = meanRecall(sampled.cents)
    info(s"recall@k: full-trained=$fr sample-trained=$sr")
    // FAISS-grade parity: fitting on half the corpus must not cost
    // meaningful recall (the centroids are corpus-scale statistics)
    assert(sr >= fr - 0.05, s"sampled recall $sr lost >0.05 vs full $fr")
  }
}
