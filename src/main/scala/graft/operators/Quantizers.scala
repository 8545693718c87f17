package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.VectorExprs

/** K-means-trained quantizers for the ANN family (E73/E74) — the step that
  * turns the seed-convention IVF centroids / PQ codebooks into trained ones,
  * the way a production index build does (FAISS trains both with Lloyd's;
  * the reference delegates vector work entirely, so this whole family is
  * extension surface — SURVEY §2.2).
  *
  * Two trainers, both deterministic fix-point arithmetic so the DuckDB twin
  * reproduces the ENTIRE training from the same seed convention in pure SQL
  * (no interpolated constants — the twin is self-contained):
  *
  *  - IVF coarse quantizer (x83): SPHERICAL k-means. Assignment is the
  *    family's existing argmax-dot (`assign`); for that step the objective
  *    Σ⟨x, c(x)⟩ is what assignment maximizes, and the update that maximizes
  *    it for a fixed assignment over unit centroids is the NORMALIZED mean
  *    (argmax_{|c|=1} (Σx)·c = Σx/|Σx|) — so both steps are optimal and the
  *    objective trace is monotone NON-DECREASING (the spherical-k-means
  *    guarantee; Dhillon & Modha 2001, "Concept decompositions for large
  *    sparse text data using clustering").
  *  - PQ codebooks (x84): classic Lloyd's per subspace. Assignment is the
  *    family's existing argmin-L2 (`pqSubDist`), update is the fix-point
  *    mean, distortion trace is monotone NON-INCREASING.
  *
  * Determinism contract (what makes the oracle hashable): per-coordinate
  * sums quantize to scale-6 longs (exact, order-independent under any
  * shuffle/reduction order); the mean is one double division + floor-round
  * (identical IEEE both engines); centroid coordinates are therefore exact
  * fix-point rationals both engines compute bit-identically; objective /
  * distortion quantize per row to scale-6 longs before summing.
  *
  * 100 TB shape: each round is ONE pass over the corpus — assignment +
  * per-(cluster, dim) partial sums in a single hash aggregation (nlist·dim
  * and pqM·pqK·pqDims groups respectively — KBs of state), with the
  * per-round collect bounded by the model size, never the data. Training
  * is SAMPLE-BOUNDED (r18): both trainers fit on a deterministic
  * md5-bucket sample capped at [[trainPerCentroid]] vectors per
  * centroid/codeword (FAISS's max_points_per_centroid convention), with
  * the twin sampling identically — see [[samplePm]].
  */
object Quantizers {
  import CoreQueries.Q

  /** IVF coarse-quantizer geometry (shared with AdvancedQueries): nlist
    * DERIVES from corpus size so per-cluster candidate counts hold
    * roughly constant as N grows (SCALING.md's rule, code since round
    * 13) — the smallest power of two with N/nlist ≤ 128, clamped to
    * [16, 65536]. Validation scales: 500/2 k vectors → 16 (gate hashes
    * unchanged), sf1 20 k → 256, sf10 200 k → 2048. The floor keeps the
    * seed convention (vec_id < nlist) inside every corpus copy-0; the cap
    * bounds the centroid model at 65536·64 doubles ≈ 34 MB — still a
    * driver/broadcast-sized model. Twins derive the identical value in
    * SQL (integer-only power-of-two scan over COUNT(*) — see the nlq CTE
    * in [[kmTrainCtes]]), so the oracle carries at every scale. */
  private[operators] val nlistFloor = 16
  private[operators] val nlistCap = 65536
  private[operators] val nlistTarget = 128L
  private[operators] def nlistFor(n: Long): Int = {
    var p = nlistFloor
    while (p.toLong * nlistTarget < n && p < nlistCap) p <<= 1
    p
  }
  /** Embedding dimensionality (the testdata contract, like lshDim). */
  private[operators] val kmDim = 64

  /** Training-sample cap: at most ~trainPerCentroid vectors per centroid
    * (FAISS's max_points_per_centroid default, 256) are used to FIT the
    * quantizer; assignment/serving always runs the full corpus. The sample
    * is the deterministic md5-bucket slice (the x70 convention), so both
    * engines select the identical rows. For the IVF k-means the cap binds
    * only past the nlist cap (the [[nlistFor]] rule keeps n/nlist ≤ 128 <
    * 256, so every corpus below 65536·256 ≈ 16.7M vectors trains in full
    * and the gate hashes are byte-stable); at 100 TB (n ≫ 16.7M) it bounds
    * training at 16.7M rows where full-corpus Lloyd's would scan billions
    * per round. For PQ the code count is FIXED (pqK=16 per subspace), so
    * the cap binds from ~4k vectors up: sf1 trains on ~20%, sf10 on ~2% —
    * scale-free training cost (twins sample identically, oracle-verified). */
  private[operators] val trainPerCentroid = 256L

  /** The per-mille (of 10000) bucket threshold selecting ≈`target` of `n`
    * rows — integer-only ceil, mirrored by the twin's pm CTE:
    * LEAST(10000, (10000·target + n − 1) // n). */
  private[graft] def samplePm(n: Long, target: Long): Int =
    if (n <= 0 || n <= target) 10000
    else math.min(10000L, (10000L * target + n - 1) / n).toInt

  /** `e` cut to the deterministic training sample (identity when the cap
    * doesn't bind — the plan is untouched, not merely an always-true
    * filter, so small-scale plans and hashes stay byte-identical). */
  private def trainSample(e: DataFrame, n: Long, target: Long): DataFrame = {
    val pm = samplePm(n, target)
    if (pm >= 10000) e
    else e.filter(SamplingQueries.bucket(col("vec_id")) < pm)
  }
  /** Lloyd's rounds: trace rounds 0..kmRounds-1, serve cents after round
    * kmRounds-1's update. Distortion plateaus by ~4 on this corpus. */
  private[graft] val kmRounds = 4
  private[graft] val pqRounds = 3

  /** (cid → trained unit centroid), plus the per-round objective trace
    * (round, Σ floor(⟨x,c(x)⟩·1e6+0.5)). */
  private[graft] case class KmModel(cents: Array[(Long, Array[Double])],
                                    trace: Array[(Long, Long)])
  /** [subspace][code] = (trained codeword, its ‖c‖² left-to-right), plus the
    * per-round distortion trace. */
  private[graft] case class PqModel(cbs: Array[Array[(Array[Double], Double)]],
                                    trace: Array[(Long, Long)])

  // One train per (session, dataset dir) — the build-once half of
  // build-once/serve-many (same keying as Tables.t / ivfIndexCache);
  // computeIfAbsent guarantees a single trainer per key under concurrency.
  private val kmCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), KmModel]
  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), PqModel]

  private def evictStopped[V](m: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) if (it.next().getKey._1.sparkContext.isStopped) it.remove()
  }

  private def cdot(a: Column, c: Array[Double]): Column =
    VectorExprs.floatDoubleDot(a, typedLit(c)) // one array Literal, not 64 nodes

  /** Argmax-dot assignment as a (sc, cid) struct — the family's `assign`
    * with the score kept (struct-max = max score, tie → max cid). ONE
    * codegen'd sweep over a referenced centroid matrix — see
    * [[graft.functions.CentroidArgmax]] for why the old
    * array_max(array(struct × nlist)) form dies at sf10's nlist=2048. */
  private def assignStruct(cents: Array[(Long, Array[Double])], emb: Column): Column =
    VectorExprs.centroidArgmax(emb, cents)

  /** Trained IVF centroids (cached). Seeds = the family's existing
    * convention (vec_id < nlist), normalized to unit length (spherical
    * k-means optimizes over unit centroids). */
  private[graft] def trainedKm(s: SparkSession, d: String): KmModel = {
    evictStopped(kmCache)
    kmCache.computeIfAbsent((s, d), { _ =>
      val e = t(s, d, "embeddings") // canonical source — matches the twin's nlq CTE
      val n = e.count()
      trainKmOn(e, nlistFor(n), n)
    })
  }

  /** The k-means training loop over an arbitrary corpus frame (same seed
    * convention: vec_id < nlist). Uncached — the (session, dir) cache wraps
    * the source-table call; E78's rebuild trains on the GROWN index corpus
    * and keeps the result private to the rebuilt index. */
  /** @param nlist the centroid count — callers must state it explicitly
    *   (ADVICE r13): every ORACLE-backed path must pass
    *   `nlistFor(<base embeddings table>.count())`, the value the twin's
    *   `nlq` CTE computes from `COUNT(*) FROM embeddings` — deriving it
    *   silently from a filtered/derived corpus would desync the two
    *   engines across a power-of-two boundary. Twin-less paths (E78's
    *   rebuild on the grown index corpus) derive from their own corpus.
    * @param n the corpus row count (callers have it from the nlist
    *   derivation) — sizes the deterministic training sample
    *   ([[trainPerCentroid]]; identity below the cap). Seeds always come
    *   from the FULL corpus (vec_id < nlist), matching the twin's kcents0. */
  private[graft] def trainKmOn(e: DataFrame, nlist: Int, n: Long,
      sampleTarget: Long = -1L): KmModel = {
    {
      val seeds = e.filter(col("vec_id") < nlist)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      var cents: Array[(Long, Array[Double])] = seeds.map { case (cid, v) =>
        val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
        (cid, if (nrm == 0) v.map(_.toDouble) else v.map(_.toDouble / nrm))
      }
      val dim = cents.head._2.length
      require(dim == kmDim, s"embedding dim $dim != $kmDim")
      val trace = Array.newBuilder[(Long, Long)]
      // spread: the one-split embeddings scan would run nlist dots/row on a
      // single task (the x25/x26 lesson)
      val target = if (sampleTarget > 0) sampleTarget else trainPerCentroid * nlist
      val base = graft.Tables.spread(trainSample(e, n, target))
        .select(col("vec_id"), col("embedding"))
      for (r <- 0 until kmRounds) {
        val st = assignStruct(cents, col("embedding"))
        // ONE aggregation per round: (cid, dim) → cluster size, fix-point
        // coordinate sum, fix-point score sum (score repeats per dim; the
        // ord=1 slice is the per-cluster objective — no second pass).
        //
        // The assignment MUST be its own select below the posexplode: the
        // analyzer puts non-generator select items in a Project ABOVE the
        // Generate, so a one-select form evaluates the nlist×dim dot sweep
        // once per EXPLODED row — a dim× (64×) amplification that the sf1
        // sweep caught as a 160× blowup when nlistFor first crossed a
        // power-of-two boundary (16→256) at that scale (round 15). As two
        // selects the dots stay in the Generate's child (explain-verified;
        // exploded rows reference the computed cid/scf columns only).
        val rows = base
          .select(st.getField("cid").as("cid"),
            floor(st.getField("sc") * lit(1e6) + lit(0.5)).as("scf"),
            col("embedding"))
          .select(col("cid"), col("scf"), posexplode(col("embedding")))
          .groupBy(col("cid"), (col("pos") + 1).as("ord"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("col").cast("double") * lit(1e6) + lit(0.5))).as("sf"),
            sum(col("scf")).as("scsum"))
          .collect() // bounded: nlist × dim rows
        trace += ((r.toLong, rows.filter(_.getInt(1) == 1).map(_.getLong(4)).sum))
        val byCid = rows.groupBy(_.getLong(0))
        cents = cents.map { case (cid, old) =>
          byCid.get(cid) match {
            case Some(rs) =>
              val ml = new Array[Double](dim)
              rs.foreach { row =>
                ml(row.getInt(1) - 1) =
                  math.floor(row.getLong(3).toDouble / row.getLong(2) + 0.5) / 1e6
              }
              val nrm = math.sqrt(ml.foldLeft(0.0)((a, x) => a + x * x))
              (cid, if (nrm == 0) old else ml.map(_ / nrm))
            case None => (cid, old) // empty cluster keeps its centroid
          }
        }
      }
      KmModel(cents, trace.result())
    }
  }

  /** The trained centroids alone — what the serving family consumes. */
  private[graft] def trainedCents(s: SparkSession, d: String): Array[(Long, Array[Double])] =
    trainedKm(s, d).cents

  /** Trained PQ codebooks (cached). Seeds = the existing convention
    * (vec_id < pqK subvectors, raw — L2 Lloyd's has no normalization). */
  private[graft] def trainedPq(s: SparkSession, d: String): PqModel = {
    evictStopped(pqCache)
    pqCache.computeIfAbsent((s, d), { _ =>
      val e = t(s, d, "embeddings")
      trainPqOn(e, e.count())
    })
  }

  /** [[trainKmOn]]'s PQ sibling: the per-subspace Lloyd's loop over an
    * arbitrary corpus frame. @param n the corpus row count, sizing the
    * deterministic training sample (cap = trainPerCentroid·pqK — with pqK
    * FIXED at 16 this binds from ~4k vectors, making the training cost
    * scale-free; the twin samples identically). */
  private[graft] def trainPqOn(e: DataFrame, n: Long,
      sampleTarget: Long = -1L): PqModel = {
    {
      import VectorQueries.{pqM, pqDims, pqK}
      val seeds = e.filter(col("vec_id") < pqK)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toArray)
      var cbs: Array[Array[Array[Double]]] = Array.tabulate(pqM) { i =>
        seeds.map(v => v.slice(i * pqDims, (i + 1) * pqDims).map(_.toDouble))
      }
      val trace = Array.newBuilder[(Long, Long)]
      val target = if (sampleTarget > 0) sampleTarget else trainPerCentroid * pqK
      val base = graft.Tables.spread(trainSample(e, n, target))
        .select(col("embedding"))
      for (r <- 0 until pqRounds) {
        // per-subspace argmin via the whole-codebook PqArgmin expression
        // (ONE codegen'd loop nest; the old pqM·pqK struct/array_min TREE
        // blew janino's 64 KB method limit and fell back to INTERPRETED —
        // the sf10 >2,700 s index-build finding, r18), exploded to one row
        // per (vector, subspace), then ONE aggregation over (sub, code, dim)
        val entries = cbs.map(_.map(c => (c, c.foldLeft(0.0)((a, x) => a + x * x))))
        val enc = VectorExprs.pqArgmin(col("embedding"), entries)
        val rows = base.select(col("embedding"), posexplode(enc))
          .select(col("pos").as("sub"), col("col.code").as("code"),
            floor(col("col.d") * lit(1e6) + lit(0.5)).as("df"), col("embedding"))
          .select(col("sub"), col("code"), col("df"),
            posexplode(slice(col("embedding"), col("sub") * lit(pqDims) + lit(1), lit(pqDims))))
          .groupBy(col("sub"), col("code"), (col("pos") + 1).as("ord"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("col").cast("double") * lit(1e6) + lit(0.5))).as("sf"),
            sum(col("df")).as("dfsum"))
          .collect() // bounded: pqM × pqK × pqDims rows
        trace += ((r.toLong, rows.filter(_.getInt(2) == 1).map(_.getLong(5)).sum))
        val byKey = rows.groupBy(row => (row.getInt(0), row.getInt(1)))
        cbs = Array.tabulate(pqM) { i =>
          cbs(i).zipWithIndex.map { case (old, j) =>
            byKey.get((i, j)) match {
              case Some(rs) =>
                val ml = new Array[Double](pqDims)
                rs.foreach { row =>
                  ml(row.getInt(2) - 1) =
                    math.floor(row.getLong(4).toDouble / row.getLong(3) + 0.5) / 1e6
                }
                ml
              case None => old // empty cell keeps its codeword
            }
          }
        }
      }
      PqModel(cbs.map(_.map(c => (c, c.foldLeft(0.0)((a, x) => a + x * x)))),
        trace.result())
    }
  }

  /** x83 — IVF centroid training trace (E73): one row per Lloyd's round,
    * (round, objective). The objective is the family's own assignment score
    * Σ⟨x, c(x)⟩ fix-pointed; spherical k-means guarantees it monotone
    * non-decreasing (asserted in QuantizerSpec). Oracle-checked end-to-end:
    * the twin re-runs the ENTIRE training in SQL from the shared seed
    * convention — nothing interpolated. */
  val x83: Q = (s, d) => {
    import s.implicits._
    trainedKm(s, d).trace.toSeq.toDF("round", "objective").orderBy(col("round"))
  }

  /** x84 — PQ codebook training trace (E74): one row per Lloyd's round,
    * (round, distortion). Classic L2 Lloyd's per subspace; distortion
    * monotone non-increasing (asserted in QuantizerSpec). Same
    * self-contained-twin contract as x83. */
  val x84: Q = (s, d) => {
    import s.implicits._
    trainedPq(s, d).trace.toSeq.toDF("round", "distortion").orderBy(col("round"))
  }

  // ------------------------------------------------------------ PCA (E86/E87)

  /** PCA transform geometry: serve the top `pcaP` of `kmDim` components —
    * the FAISS `PCAMatrix` pre-transform (dimensionality reduction /
    * whitening ahead of quantization), here as train (x91) + serve (x92). */
  private[graft] val pcaP = 8
  /** Cyclic-Jacobi sweep cap; a 64×64 symmetric matrix converges in <15
    * sweeps, and the FIXED sweep order makes the factorization a pure
    * function of the covariance — deterministic across runs. */
  private val jacobiSweeps = 50

  /** n, mean, full covariance, eigenvalues desc + matching unit axes. */
  private[graft] case class PcaModel(n: Long, mean: Array[Double],
      cov: Array[Array[Double]], eigVals: Array[Double], eigVecs: Array[Array[Double]])

  private val pcaCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), PcaModel]

  private[graft] def trainedPca(s: SparkSession, d: String): PcaModel = {
    evictStopped(pcaCache)
    pcaCache.computeIfAbsent((s, d), { _ => trainPcaOn(t(s, d, "embeddings")) })
  }

  /** Covariance training: the quantizer-family determinism contract (every
    * cross-row sum is a fix-point long, so any reduction order and both
    * engines agree bit-for-bit), in two corpus passes — per-dim sums, then
    * upper-triangle product sums as ONE hash aggregation whose map-side
    * combine caps the exchange at dim·(dim+1)/2 rows per partition. Both
    * collects are model-bounded (dim and 2 080 rows), never data. The
    * eigenfactorization runs on the driver over the 64×64 matrix (cyclic
    * Jacobi, fixed sweep order, sign fixed per axis) — model-sized work,
    * the same division of labor as x56's driver LUT. */
  private[graft] def trainPcaOn(e: DataFrame): PcaModel = {
    val base = graft.Tables.spread(e).select(col("embedding"))
    val sums = base.select(posexplode(col("embedding")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("col").cast("double") * lit(1e6) + lit(0.5))).as("sf"))
      .collect() // bounded: dim rows
    val dim = sums.length
    require(dim == kmDim, s"embedding dim $dim != $kmDim")
    val n = sums.head.getLong(1)
    val sf = new Array[Long](dim)
    sums.foreach(r => sf(r.getInt(0)) = r.getLong(2))
    val mean = sf.map(v => v.toDouble / 1e6 / n)
    val prods = base.select(col("embedding"), posexplode(col("embedding")))
      .select(col("pos").as("i"),
        posexplode(transform(slice(col("embedding"), col("pos") + 1, lit(kmDim)),
          y => floor(col("col").cast("double") * y.cast("double") * lit(1e6) + lit(0.5)))))
      .groupBy(col("i"), (col("i") + col("pos")).as("j"))
      .agg(sum(col("col")).as("pf"))
      .collect() // bounded: dim·(dim+1)/2 rows
    val cov = Array.ofDim[Double](dim, dim)
    prods.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val c = r.getLong(2).toDouble / 1e6 / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (vals, vecs) = jacobiEigen(cov)
    PcaModel(n, mean, cov, vals, vecs)
  }

  /** Cyclic Jacobi for a symmetric matrix: eigenvalues DESC (ties → lower
    * original index) with matching unit eigenvectors, each sign-fixed so
    * its largest-|coordinate| entry is positive. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val dim = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (p <- 0 until dim; q <- p + 1 until dim) s += a(p)(q) * a(p)(q)
      s
    }
    var sweep = 0
    while (sweep < jacobiSweeps && off() > 1e-18) {
      for (p <- 0 until dim - 1; q <- p + 1 until dim if math.abs(a(p)(q)) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val tv = (if (theta >= 0) 1.0 else -1.0) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(tv * tv + 1.0)
        val sn = tv * c
        for (k <- 0 until dim) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - sn * akq
          a(k)(q) = sn * akp + c * akq
        }
        for (k <- 0 until dim) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - sn * aqk
          a(q)(k) = sn * apk + c * aqk
        }
        for (k <- 0 until dim) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - sn * vkq
          v(k)(q) = sn * vkp + c * vkq
        }
      }
      sweep += 1
    }
    val order = (0 until dim).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col0 = Array.tabulate(dim)(k => v(k)(i))
      // deterministic sign: largest-|coord| entry positive, ties → lowest idx
      val m = col0.indices.maxBy(k => (math.abs(col0(k)), -k))
      if (col0(m) < 0) col0.map(-_) else col0
    }.toArray
    (vals, vecs)
  }

  /** x91 — PCA covariance training (E86): the upper triangle of the exact
    * fix-point corpus covariance, (i, j, cov) for i ≤ j. The oracle twin
    * re-runs the whole two-pass training in SQL — identical fix-point sums,
    * identical mean/cov arithmetic — so the trained model itself is
    * hash-verified, the x83/x84 contract. */
  val x91: Q = (s, d) => {
    import s.implicits._
    val m = trainedPca(s, d)
    val rows = for (i <- 0 until kmDim; j <- i until kmDim)
      yield (i.toLong, j.toLong, math.floor(m.cov(i)(j) * 1e6 + 0.5) / 1e6)
    rows.toDF("i", "j", "cov").orderBy(col("i"), col("j"))
  }

  /** x92 — PCA projection + reconstruction audit (E87): every vector's
    * top-`pcaP` principal coordinates y_k = ⟨x, v_k⟩ − ⟨μ, v_k⟩ and the
    * residual ‖x−μ‖² − Σy_k² (exact by orthonormality — the variance the
    * kept components fail to explain). Map-only serving: the axes ride the
    * expression tree as literals (v_k and the ⟨μ,v_k⟩ corrections are
    * driver doubles, the x56-LUT pattern — the SAME doubles interpolate
    * into the twin, no cross-engine eigen arithmetic), the hot dot is the
    * codegen'd floatDoubleDot, nothing shuffles but the presentation sort. */
  val x92: Q = (s, d) => {
    verifyDirHint = Some(d) // the GENERATED twin trains on the served dir
    val m = trainedPca(s, d)
    val e = t(s, d, "embeddings")
    def dotLit(v: Array[Double]): Column =
      graft.functions.VectorExprs.floatDoubleDot(col("embedding"), typedLit(v))
    val muDotV = m.eigVecs.take(pcaP).map(v =>
      v.indices.foldLeft(0.0)((a, i) => a + m.mean(i) * v(i)))
    val muNorm = m.mean.foldLeft(0.0)((a, x) => a + x * x)
    val ys = (0 until pcaP).map(k => (dotLit(m.eigVecs(k)) - lit(muDotV(k))).as(s"y$k"))
    val c2 = graft.functions.VectorExprs.floatDot(col("embedding"), col("embedding")) -
      lit(2.0) * dotLit(m.mean) + lit(muNorm)
    val proj = e.select((col("vec_id") +: ys :+ c2.as("c2")): _*)
    val resid = (0 until pcaP).map(k => col(s"y$k") * col(s"y$k")).reduce(_ + _)
    proj.select((col("vec_id") +:
        (0 until pcaP).map(k => graft.Tables.fround(col(s"y$k"), 6).as(s"y$k"))) :+
        graft.Tables.fround(col("c2") - resid, 6).as("resid"): _*)
      .orderBy(col("vec_id"))
  }

  // ------------------------------------------------------------ OPQ-lite (E88)

  /** Eigenvalue-BALANCED subspace allocation: subspace i takes eigen dims
    * i, i+pqM, i+2·pqM, … so every subspace spans the whole spectrum (one
    * dim from each eigenvalue octave) instead of subspace 0 hoarding all
    * the variance. This is OPQ's allocation insight (Ge et al. 2013,
    * "Optimized Product Quantization" — the parametric variant allocates
    * eigen dims to balance per-subspace variance products): a raw
    * PCA-eigen-order rotation HURTS PQ here (measured: 289.4M vs plain
    * 287.0M at sf0.01) because the first subspace gets all the variance;
    * the balanced permutation of the same axes wins (270.6M = −5.7%, and
    * −1.2% at sf0.1 where duplicates flatten the spectrum). */
  private[graft] def opqPerm: Seq[Int] = {
    import VectorQueries.{pqM, pqDims}
    (0 until pqM).flatMap(i => (0 until pqDims).map(j => i + pqM * j))
  }

  /** The corpus rotated onto the balanced-permuted PCA axes, stored float32
    * (the standard transformed-corpus representation — rotation is applied
    * once at ingest, not per query). Map-only: each output dim is one
    * codegen'd floatDoubleDot against a literal axis. */
  private[graft] def opqRotated(s: SparkSession, d: String): DataFrame = {
    val m = trainedPca(s, d)
    // ONE MatVecFloat over the permuted axis matrix (r18): the 64-element
    // array constructor over 64 dot subtrees evaluated at tree-walk speed
    // (~0.3 ms/row at every scale — 62 s for the sf10 rotation alone);
    // bit-identical per axis, so the x92-contract twins are unchanged.
    t(s, d, "embeddings").select(col("vec_id"),
      VectorExprs.matVecFloat(col("embedding"),
        opqPerm.map(k => m.eigVecs(k)).toArray).as("embedding"))
  }

  private val opqCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), PqModel]

  private[graft] def trainedOpq(s: SparkSession, d: String): PqModel = {
    evictStopped(opqCache)
    opqCache.computeIfAbsent((s, d), { _ =>
      // rotation is a map — the rotated corpus count IS the base count
      trainPqOn(opqRotated(s, d), t(s, d, "embeddings").count())
    })
  }

  /** x93 — OPQ-lite training (E88): PQ codebooks trained on the rotated
    * corpus, trace in the x84 contract. The rotation is orthonormal, so
    * distortion is directly comparable to x84's — and lower (the spec
    * asserts it): the pre-transform buys reconstruction quality at ZERO
    * serving cost, since rotating a query is 64 dots. Twin: the rotation
    * interpolates as dir-trained axis literals (the x92 contract) and the
    * PROVEN pqTrainCtes chain re-runs the whole training in SQL over the
    * rotated CTE — only the rotation is interpolated, the training is not. */
  val x93: Q = (s, d) => {
    verifyDirHint = Some(d)
    import s.implicits._
    trainedOpq(s, d).trace.toSeq.toDF("round", "distortion").orderBy(col("round"))
  }

  /** x94 — OPQ ADC serving (E89): x56's ADC search under the x93 model —
    * proof that the rotation buys reconstruction quality at unchanged
    * serving cost. The query rotates once (64 dots — the same map the
    * corpus paid at ingest), the LUT is the standard driver-computed
    * pqM×pqK table against the ROTATED codebooks, and per-vector distance
    * stays 8 lookups + 7 adds over the 4-bit codes. Twin: rotation
    * interpolated (x92 contract), then the PROVEN x56 SQL chain — corpus
    * encode, in-SQL LUT, ranked ADC — over the rotated CTE. */
  val x94: Q = (s, d) => {
    verifyDirHint = Some(d)
    import VectorQueries.{withPqCodes, pqLut, pqAdist}
    val rot = opqRotated(s, d)
    val qv = rot.filter(col("vec_id") === 0).select(col("embedding"))
      .head.getSeq[Float](0).toArray
    val cbs = trainedOpq(s, d).cbs
    withPqCodes(graft.Tables.spread(rot).select(col("vec_id"), col("embedding")), cbs)
      .select(col("vec_id"), pqAdist(pqLut(qv, cbs)).as("raw"))
      .orderBy(col("raw"), col("vec_id"))
      .limit(10)
      .select(col("vec_id"), graft.Tables.fround(col("raw"), 6).as("adist"))
  }

  /** x161 — simplified silhouette of the trained IVF clustering (E166):
    * per-cluster cohesion/separation quality of x83's k-means — the
    * clustering-QA verb the family lacked (x83 traces the OBJECTIVE
    * falling; silhouette says whether the partition is GOOD: s≈0 means
    * clusters touch, s<0 means points sit in the wrong cell — exactly
    * what decides nlist/nprobe before a 100 TB IVF build). Simplified
    * (centroid-based, Hruschka et al.) in cosine space: per point
    * a = 1 − cos(x, own centroid), b = 1 − cos(x, runner-up centroid),
    * s = (b−a)/max(a,b); output = per-cluster n + mean s.
    *
    * Determinism: assignment and runner-up are the family's struct-max
    * total order ((sc, cid) lexicographic — twin replays it as
    * ROW_NUMBER ... ORDER BY sc DESC, cid DESC); per-point s is a fixed
    * IEEE div/sub/max tree over codegen'd dots (FloatDoubleDot against
    * interpolated trained-centroid literals — the x92 twin contract);
    * per-point fix-point floor(s·1e6+0.5) makes the cluster mean an
    * EXACT integer sum (order-free merge), rendered hi·1e9+lo.
    *
    * 100 TB shape: one spread scan, 17 codegen'd dots/row (16 centroids
    * + self-norm), ONE map-side-combined aggregate to the nlist-row
    * grid; the model crosses as literals, no join. */
  val x161: Q = (s, d) => {
    verifyDirHint = Some(d)
    val cents = trainedCents(s, d)
    // ONE codegen'd sweep for best + runner-up ([[CentroidTop2]], r18):
    // the old nlist-struct array + array_max/filter/array_max tree blew
    // janino's 64 KB budget at sf10's nlist=2048 and ran interpreted —
    // the PqArgmin finding's sibling. Bit-identical: same dots, same
    // (sc, cid) struct order, cids unique so filter(≠best) ≡ runner-up.
    val per = graft.Tables.spread(t(s, d, "embeddings"))
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(VectorExprs.floatDot(col("embedding"), col("embedding"))))
      .withColumn("best", VectorExprs.centroidTop2(col("embedding"), cents))
    val aCol = lit(1.0) - col("best.sc") / col("nrm")
    val bCol = lit(1.0) - col("best.sc2") / col("nrm")
    val sil = when(col("nrm") > 0 && greatest(aCol, bCol) > 0,
      (bCol - aCol) / greatest(aCol, bCol)).otherwise(lit(0.0))
    // +1 offset keeps the fix-point sum nonnegative (s ∈ [−1,1]): the
    // hi·1e9+lo render mixes div/mod conventions across engines on
    // negative longs; undone exactly at render (−1.0).
    per.select(col("best.cid").as("cid"),
        floor((sil + lit(1.0)) * lit(1e6) + lit(0.5)).cast("long").as("silf"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("silf")).as("sumf"))
      .select(col("cid"), col("n"),
        graft.Tables.fround(
          (expr("sumf div 1000000000").cast("double") * lit(1e9) +
            expr("sumf % 1000000000").cast("double")) / lit(1e6) /
            col("n").cast("double") - lit(1.0), 6).as("mean_sil"))
      .orderBy(col("cid"))
  }

  val queries: Map[String, Q] = Map(
    "x161_silhouette" -> x161,
    "x83_kmeans_ivf" -> x83,
    "x84_kmeans_pq" -> x84,
    "x91_pca_train" -> x91,
    "x92_pca_project" -> x92,
    "x93_opq_train" -> x93,
    "x94_opq_search" -> x94)

  // ---------------------------------------------------------------- twins

  private[operators] def dotSql(a: String, b: String): String =
    s"list_aggregate(list_transform(list_zip($a, $b), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')"

  /** GENERATED spherical-k-means chain: kcents0 (normalized seeds) through
    * kcents$kmRounds, with per-round assignment CTEs ka0..ka{R-1}. Every
    * arithmetic step mirrors the Scala trainer exactly: fix-point coordinate
    * sums, floor(sf/n + 0.5)/1e6 means, left-to-right ‖·‖ accumulation,
    * identical normalization expression. */
  private[operators] def kmTrainCtes: String = {
    val b = Seq.newBuilder[String]
    b += s"kdim AS (SELECT unnest(range(1, ${kmDim + 1})) AS ord)"
    // nlist derived from COUNT(*) with the identical integer-only
    // power-of-two scan as [[nlistFor]]: smallest p in [floor, cap] with
    // p·target ≥ N (the `p = cap` disjunct realizes the cap when none
    // qualifies) — no floats, no log2 boundary drift
    b += s"""nlq AS (
       |  SELECT MIN(p) AS nl FROM (
       |    SELECT (CAST(1 AS BIGINT) << i) AS p
       |    FROM range(${java.lang.Integer.numberOfTrailingZeros(nlistFloor)},
       |               ${java.lang.Integer.numberOfTrailingZeros(nlistCap) + 1}) t(i)) pp
       |  WHERE p * $nlistTarget >= (SELECT COUNT(*) FROM embeddings)
       |     OR p = $nlistCap)""".stripMargin
    // deterministic training sample (trainPerCentroid per centroid, the
    // Scala trainSample mirror): identity until n > 256·nlist, i.e. past
    // the nlist cap — integer-only ceil, same md5-bucket rows both engines
    b += s"""kpmq AS (
       |  SELECT LEAST(10000, (10000 * $trainPerCentroid * (SELECT nl FROM nlq) + cnt - 1) // cnt) AS pm
       |  FROM (SELECT COUNT(*) AS cnt FROM embeddings))""".stripMargin
    b += s"""ktrain AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE ${SamplingQueries.bucketSqlFor("vec_id")} < (SELECT pm FROM kpmq))""".stripMargin
    b += s"""kcents0 AS (
       |  SELECT vec_id AS cid,
       |    CASE WHEN sqrt(${dotSql("embedding", "embedding")}) = 0
       |      THEN list_transform(embedding, x -> CAST(x AS DOUBLE))
       |      ELSE list_transform(embedding, x -> CAST(x AS DOUBLE) / sqrt(${dotSql("embedding", "embedding")}))
       |    END AS cemb
       |  FROM embeddings WHERE vec_id < (SELECT nl FROM nlq))""".stripMargin
    for (r <- 0 until kmRounds) {
      b += s"""ksc$r AS (
         |  SELECT e.vec_id, e.embedding, c.cid, ${dotSql("e.embedding", "c.cemb")} AS sc
         |  FROM ktrain e CROSS JOIN kcents$r c)""".stripMargin
      b += s"""ka$r AS (
         |  SELECT vec_id, embedding, cid, sc FROM (
         |    SELECT vec_id, embedding, cid, sc,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sc DESC, cid DESC) AS rn
         |    FROM ksc$r) WHERE rn = 1)""".stripMargin
      b += s"""kms$r AS (
         |  SELECT a.cid, d.ord, COUNT(*) AS n,
         |    CAST(SUM(CAST(floor(CAST(a.embedding[d.ord] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sf
         |  FROM ka$r a CROSS JOIN kdim d GROUP BY a.cid, d.ord)""".stripMargin
      b += s"""kmm$r AS (
         |  SELECT cid, list(floor(CAST(sf AS DOUBLE) / n + 0.5) / 1000000.0 ORDER BY ord) AS ml
         |  FROM kms$r GROUP BY cid)""".stripMargin
      b += s"""kcents${r + 1} AS (
         |  SELECT c.cid,
         |    CASE WHEN m.ml IS NULL OR sqrt(list_aggregate(list_transform(m.ml, x -> x * x), 'sum')) = 0
         |      THEN c.cemb
         |      ELSE list_transform(m.ml, x -> x / sqrt(list_aggregate(list_transform(m.ml, x -> x * x), 'sum')))
         |    END AS cemb
         |  FROM kcents$r c LEFT JOIN kmm$r m ON m.cid = c.cid)""".stripMargin
    }
    b.result().mkString(",\n")
  }

  /** GENERATED PQ-Lloyd's chain: pcb0 (seed subvectors as DOUBLE) through
    * pcb$pqRounds, per-round chosen CTEs ppc0..ppc{R-1}. */
  private[operators] def pqTrainCtes: String = pqTrainCtesFrom("embeddings")

  /** [[pqTrainCtes]] over an arbitrary source CTE/table (x93 trains on the
    * rotated corpus CTE). */
  private[operators] def pqTrainCtesFrom(src: String): String = {
    import VectorQueries.{pqM, pqDims, pqK}
    val sv = s"list_slice(e.embedding, cb.sub*$pqDims+1, cb.sub*$pqDims+$pqDims)"
    val b = Seq.newBuilder[String]
    b += s"pdim AS (SELECT unnest(range(1, ${pqDims + 1})) AS ord)"
    // deterministic training sample (trainPerCentroid per code; pqK is
    // FIXED so this binds from ~4k vectors — the Scala trainSample mirror)
    b += s"""ppmq AS (
       |  SELECT LEAST(10000, (10000 * $trainPerCentroid * $pqK + cnt - 1) // cnt) AS pm
       |  FROM (SELECT COUNT(*) AS cnt FROM $src))""".stripMargin
    b += s"""ptrain AS (
       |  SELECT vec_id, embedding FROM $src
       |  WHERE ${SamplingQueries.bucketSqlFor("vec_id")} < (SELECT pm FROM ppmq))""".stripMargin
    b += s"""pcb0 AS (
       |  SELECT s.sub, e.vec_id AS code,
       |    list_transform(list_slice(e.embedding, s.sub*$pqDims+1, s.sub*$pqDims+$pqDims), x -> CAST(x AS DOUBLE)) AS cvec
       |  FROM $src e CROSS JOIN (SELECT unnest(range(0, $pqM)) AS sub) s
       |  WHERE e.vec_id < $pqK)""".stripMargin
    for (r <- 0 until pqRounds) {
      b += s"""ppd$r AS (
         |  SELECT e.vec_id, e.embedding, cb.sub, cb.code,
         |    (${dotSql(sv, sv)} - 2.0 * ${dotSql(sv, "cb.cvec")}) + ${dotSql("cb.cvec", "cb.cvec")} AS d
         |  FROM ptrain e CROSS JOIN pcb$r cb)""".stripMargin
      b += s"""ppc$r AS (
         |  SELECT vec_id, embedding, sub, code, d FROM (
         |    SELECT vec_id, embedding, sub, code, d,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) AS rn
         |    FROM ppd$r) WHERE rn = 1)""".stripMargin
      b += s"""pps$r AS (
         |  SELECT c.sub, c.code, p.ord, COUNT(*) AS n,
         |    CAST(SUM(CAST(floor(CAST(c.embedding[c.sub*$pqDims + p.ord] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sf
         |  FROM ppc$r c CROSS JOIN pdim p GROUP BY c.sub, c.code, p.ord)""".stripMargin
      b += s"""ppm$r AS (
         |  SELECT sub, code, list(floor(CAST(sf AS DOUBLE) / n + 0.5) / 1000000.0 ORDER BY ord) AS ml
         |  FROM pps$r GROUP BY sub, code)""".stripMargin
      b += s"""pcb${r + 1} AS (
         |  SELECT c.sub, c.code, CASE WHEN m.ml IS NULL THEN c.cvec ELSE m.ml END AS cvec
         |  FROM pcb$r c LEFT JOIN ppm$r m ON m.sub = c.sub AND m.code = c.code)""".stripMargin
    }
    b.result().mkString(",\n")
  }

  private def x83Oracle: String = {
    val trace = (0 until kmRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, CAST(SUM(CAST(floor(sc * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS objective FROM ka$r")
      .mkString(" UNION ALL ")
    s"WITH $kmTrainCtes\nSELECT * FROM ($trace) ORDER BY round"
  }

  private def x84Oracle: String = {
    val trace = (0 until pqRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, CAST(SUM(CAST(floor(d * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS distortion FROM ppc$r")
      .mkString(" UNION ALL ")
    s"WITH $pqTrainCtes\nSELECT * FROM ($trace) ORDER BY round"
  }

  /** GENERATED x91 twin: re-runs the two-pass covariance training in SQL —
    * identical fix-point coordinate/product sums (floor to micro-units,
    * summed as BIGINT), identical CAST(..)/1e6/n mean and P/1e6/n − μiμj
    * covariance arithmetic, floor-rounded to 6 digits like the Spark side. */
  private def x91Oracle: String =
    s"""WITH cdim AS (SELECT unnest(range(1, ${kmDim + 1})) AS ord),
       |cn AS (SELECT COUNT(*) AS n FROM embeddings),
       |cms AS (
       |  SELECT d.ord,
       |    CAST(SUM(CAST(floor(CAST(e.embedding[d.ord] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sf
       |  FROM embeddings e CROSS JOIN cdim d GROUP BY d.ord),
       |cmu AS (SELECT ord, CAST(sf AS DOUBLE) / 1000000.0 / cn.n AS m FROM cms, cn),
       |cps AS (
       |  SELECT di.ord AS i, dj.ord AS j,
       |    CAST(SUM(CAST(floor(CAST(e.embedding[di.ord] AS DOUBLE) * CAST(e.embedding[dj.ord] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS pf
       |  FROM embeddings e CROSS JOIN cdim di CROSS JOIN cdim dj
       |  WHERE dj.ord >= di.ord GROUP BY di.ord, dj.ord)
       |SELECT CAST(p.i - 1 AS BIGINT) AS i, CAST(p.j - 1 AS BIGINT) AS j,
       |  floor((CAST(p.pf AS DOUBLE) / 1000000.0 / cn.n - mi.m * mj.m) * 1000000.0 + 0.5) / 1000000.0 AS cov
       |FROM cps p
       |CROSS JOIN cn
       |JOIN cmu mi ON mi.ord = p.i
       |JOIN cmu mj ON mj.ord = p.j
       |ORDER BY i, j""".stripMargin

  /** GENERATED x92 twin: the trained axes, ⟨μ,v_k⟩ corrections, and ‖μ‖²
    * interpolate as DOUBLE literals (Double.toString round-trips exactly),
    * and the twin replays the identical projection arithmetic — the
    * left-to-right list_aggregate dot, y_k = dot − correction, residual
    * c2 − (((y0² + y1²) + …)), floor-rounded at 6. */
  private def x92Oracle: String = {
    val m = x92Model
    def vecLit(v: Array[Double]): String =
      "CAST([" + v.map(_.toString).mkString(",") + "] AS DOUBLE[])"
    val muDotV = m.eigVecs.take(pcaP).map(v =>
      v.indices.foldLeft(0.0)((a, i) => a + m.mean(i) * v(i)))
    val muNorm = m.mean.foldLeft(0.0)((a, x) => a + x * x)
    val ys = (0 until pcaP).map(k =>
      s"(${dotSql("embedding", vecLit(m.eigVecs(k)))} - ${muDotV(k)}) AS y$k").mkString(",\n    ")
    val resid = (0 until pcaP).map(k => s"y$k * y$k").reduce((a, b) => s"($a + $b)")
    val yOut = (0 until pcaP).map(k =>
      s"floor(y$k * 1000000.0 + 0.5) / 1000000.0 AS y$k").mkString(", ")
    s"""WITH p AS (
       |  SELECT vec_id,
       |    $ys,
       |    (${dotSql("embedding", "embedding")} - 2.0 * ${dotSql("embedding", vecLit(m.mean))} + $muNorm) AS c2
       |  FROM embeddings)
       |SELECT vec_id, $yOut,
       |  floor((c2 - $resid) * 1000000.0 + 0.5) / 1000000.0 AS resid
       |FROM p ORDER BY vec_id""".stripMargin
  }

  /** The x92 twin interpolates the TRAINED model, so it must train on the
    * dir the query served (x92 records it in [[verifyDirHint]] when it
    * runs; Verify dumps oracle SQL after running every query, so the hint
    * is always set by dump time — sf0.01, the driver's contract, is the
    * fallback). The (session, dir) cache makes this a lookup, not a
    * second training. */
  private def x92Model: PcaModel = {
    val s = org.apache.spark.sql.SparkSession.active
    trainedPca(s, verifyDirHint.getOrElse("/root/testdata/sf0.01"))
  }

  /** Last dir x92 served — the twin-generation contract above. */
  @volatile private[graft] var verifyDirHint: Option[String] = None

  /** A `def`, unlike the sibling operators' static twin strings: the x92
    * twin embeds dir-trained doubles, so it must regenerate at dump time
    * (after the queries ran), not at object init. */
  /** GENERATED x93 twin: the rotated corpus as a CTE (each output dim the
    * identical-order dot against the interpolated axis, CAST to FLOAT like
    * the Spark side's float32 store), then the x84 SQL-retraining chain
    * verbatim over it. */
  /** The rotated-corpus CTE shared by the x93/x94 twins: each output dim
    * is the identical-order dot against the interpolated axis, CAST to
    * FLOAT like the Spark side's float32 store. */
  private def rotCteSql: String = {
    val m = x92Model
    def vecLit(v: Array[Double]): String =
      "CAST([" + v.map(_.toString).mkString(",") + "] AS DOUBLE[])"
    val dims = opqPerm.map(k =>
      s"CAST(${dotSql("e.embedding", vecLit(m.eigVecs(k)))} AS FLOAT)").mkString(",\n    ")
    s"""rembeddings AS (
       |  SELECT e.vec_id, [
       |    $dims] AS embedding
       |  FROM embeddings e)""".stripMargin
  }

  private def x93Oracle: String = {
    val trace = (0 until pqRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, CAST(SUM(CAST(floor(d * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS distortion FROM ppc$r")
      .mkString(" UNION ALL ")
    s"""WITH $rotCteSql,
       |${pqTrainCtesFrom("rembeddings")}
       |SELECT * FROM ($trace) ORDER BY round""".stripMargin
  }

  private def x94Oracle: String =
    s"""WITH $rotCteSql,
       |${VectorQueries.pqCtesFrom("rembeddings")},
       |${VectorQueries.pqQLutCtesFrom("rembeddings")}
       |${VectorQueries.pqAdcTailSql("pq p")}""".stripMargin

  /** GENERATED x161 twin: trained centroids interpolate as DOUBLE literals
    * (the x92 contract — Double.toString round-trips exactly), the struct-
    * max assignment replays as ROW_NUMBER (sc DESC, cid DESC), and the
    * silhouette is the identical IEEE tree over identical dots; per-point
    * fix-point (+1-offset) makes per-cluster sums exact integers. */
  private def x161Oracle: String = {
    val s = org.apache.spark.sql.SparkSession.active
    val cents = trainedCents(s, verifyDirHint.getOrElse("/root/testdata/sf0.01"))
    def vecLit(v: Array[Double]): String =
      "CAST([" + v.map(_.toString).mkString(",") + "] AS DOUBLE[])"
    val structs = cents.map { case (cid, c) =>
      s"{'sc': ${dotSql("embedding", vecLit(c))}, 'cid': $cid}"
    }.mkString(",\n      ")
    s"""WITH per AS (
       |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm,
       |    unnest([
       |      $structs]) AS u
       |  FROM embeddings),
       |ranked AS (
       |  SELECT vec_id, nrm, u.cid AS cid, u.sc AS sc,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY u.sc DESC, u.cid DESC) AS rn
       |  FROM per),
       |pr AS (
       |  SELECT a.vec_id, a.cid, a.nrm, a.sc AS s1, b.sc AS s2
       |  FROM ranked a JOIN ranked b ON a.vec_id = b.vec_id
       |  WHERE a.rn = 1 AND b.rn = 2),
       |sil AS (
       |  SELECT cid,
       |    CAST(floor(((CASE WHEN nrm > 0 AND greatest(1.0 - s1 / nrm, 1.0 - s2 / nrm) > 0
       |      THEN ((1.0 - s2 / nrm) - (1.0 - s1 / nrm)) / greatest(1.0 - s1 / nrm, 1.0 - s2 / nrm)
       |      ELSE 0.0 END) + 1.0) * 1000000.0 + 0.5) AS BIGINT) AS silf
       |  FROM pr)
       |SELECT cid, COUNT(*) AS n,
       |  floor(((CAST(SUM(silf) // 1000000000 AS DOUBLE) * 1e9
       |      + CAST(SUM(silf) % 1000000000 AS DOUBLE)) / 1000000.0
       |      / CAST(COUNT(*) AS DOUBLE) - 1.0) * 1000000.0 + 0.5) / 1000000.0 AS mean_sil
       |FROM sil GROUP BY cid ORDER BY cid""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "x161_silhouette" -> x161Oracle,
    "x83_kmeans_ivf" -> x83Oracle,
    "x84_kmeans_pq" -> x84Oracle,
    "x91_pca_train" -> x91Oracle,
    "x92_pca_project" -> x92Oracle,
    "x93_opq_train" -> x93Oracle,
    "x94_opq_search" -> x94Oracle)
}
