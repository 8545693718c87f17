package graft.operators

import scala.util.chaining._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.VectorQueries.dot
import graft.Tables.PinOps

/** Post-inventory extensions: exact quantiles, subquery surface, IVF ANN.
  * Numbering continues the SURVEY §2.4 oracle contract. */
object AdvancedQueries {
  import CoreQueries.Q

  /** Q35 — exact per-group percentiles (p50/p90) via the order-statistic
    * element (no interpolation: the picked element is bit-identical in both
    * engines, where interpolated quantiles differ in fp op order).
    * Scale note: collect_list per group is the EXACT-quantile price and is
    * bounded by group size — a skewed group (one event_type = half the data)
    * concentrates on one executor; at 100 TB switch to x64 (approx_percentile
    * — mergeable summary, constant memory per group, skew-immune). */
  val q35: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("value"))).as("vals"), count(lit(1)).as("n"))
      .select(
        col("event_type"), col("n"),
        element_at(col("vals"), greatest(lit(1), ceil(col("n") * 0.5)).cast("int")).as("p50"),
        element_at(col("vals"), greatest(lit(1), ceil(col("n") * 0.9)).cast("int")).as("p90"))
      .orderBy(col("event_type"))

  /** x64 sample size: rank error of a k-sample quantile is
    * O(n·√(q(1−q)/k)) — ~1.6% of n at k=1024/p50, group-size-independent. */
  private val bkK = 1024

  /** x64 — the 100 TB percentile path q35's docstring points at: a
    * MERGEABLE bounded-memory quantile summary per group (fixed k slots
    * regardless of group size, so the skewed group that would OOM q35's
    * collect_list costs the same as any other; only k rows per group cross
    * the shuffle). The summary is a DETERMINISTIC bottom-k-by-hash sample
    * ([[UdfQueries.BottomK]]): membership is h60(event_id) rank — a fixed
    * SET, not an arrival-order accident like GK/KLL compaction — and the
    * estimate is the PICKED order statistic of the sample at rank
    * ⌈q·m⌉. That choice upgrades this from rows-only (round 1–12: GK
    * internals aren't hash-stable across engines) to full oracle
    * hash-match: the twin replays the identical hash ranks and picks in
    * SQL. AdvancedSpec still bounds the rank error vs exact q35.
    *
    * 100 TB shape: one map-side-combined agg (O(1) reject per non-sample
    * row); no window, no per-group sort of the data — the only sort is
    * the in-struct array_sort of k sampled elements. */
  val x64: Q = (s, d) => {
    val bk = udaf(new UdfQueries.BottomK(bkK),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Double)]())
    t(s, d, "events")
      .select(col("event_type"), graft.Tables.h60(col("event_id")).as("h"),
        col("event_id"), col("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        bk(col("h"), col("event_id"), col("value")).as("smp"))
      // sample order statistics: sort the k-struct array by (value, id),
      // pick ranks ⌈0.5·m⌉ / ⌈0.9·m⌉ — bit-identical picked elements
      .withColumn("sv", expr("array_sort(transform(smp, x -> struct(x._3 AS v, x._2 AS id)))"))
      .withColumn("m", size(col("sv")))
      .select(col("event_type"), col("n"),
        expr("element_at(sv, cast(greatest(1, ceil(0.5 * m)) AS int)).v").as("p50"),
        expr("element_at(sv, cast(greatest(1, ceil(0.9 * m)) AS int)).v").as("p90"))
      .orderBy(col("event_type"))
  }

  /** x108 — exact distributed quantiles by rank selection (E104): the
    * third leg of the quantile triptych. q35 is exact but materializes a
    * per-group array (collect_list — bounded by group size, the skewed
    * group concentrates on one executor); x64 is approx (mergeable GK
    * summary, constant memory, rank error); x108 is EXACT at scale: one
    * exchange+sort on (group, value) and a row_number/count window, then
    * each requested q picks the order-statistic element at 0-indexed rank
    * ⌊(n−1)·q⌋ (percentile_disc semantics — a PICKED element, never
    * interpolated, so the value is bit-identical cross-engine; the only
    * float op is the (n−1)·q product, the same IEEE multiply on both
    * sides). No per-group array ever materializes — memory per task is
    * the sort buffer, which spills; a skewed group costs sort time, not
    * heap. The 100 TB exact path where q35 OOMs and x64's error bound is
    * not acceptable (compliance percentiles, SLA attestation); both
    * windows share one partitioning, so the rank and the count ride a
    * single exchange. Candidate selection is an array-level `filter`
    * BEFORE the explode, so the post-window stage drops every
    * non-order-statistic row at 1× width and only the ≤|qs| surviving
    * rows per group ever expand. */
  val x108: Q = (s, d) => {
    val byV = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    val all = Window.partitionBy(col("event_type"))
    val qsArr = array(Seq(0.25, 0.5, 0.75, 0.95).map(lit): _*)
    t(s, d, "events")
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(byV))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("qs", filter(qsArr, q => col("rn") - 1 === floor((col("n") - 1) * q)))
      .filter(size(col("qs")) > 0)
      .withColumn("q", explode(col("qs")))
      .select(col("event_type"), col("q"), col("value").as("qv"), col("n"))
      .orderBy(col("event_type"), col("q"))
  }

  /** Q36 — scalar subquery + HAVING: priorities of above-average-price
    * orders. Catalyst plans the scalar subquery as an independent stage
    * reused as a literal; HAVING becomes a post-agg filter. */
  val q36: Q = (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("orders_v")
    s.sql("""
      SELECT o_orderpriority, COUNT(*) AS n FROM orders_v
      WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders_v)
      GROUP BY o_orderpriority HAVING COUNT(*) > 10
      ORDER BY o_orderpriority""")
  }

  /** Q37 — IN / NOT IN subqueries (RewritePredicateSubquery → semi/anti). */
  val q37: Q = (s, d) => {
    t(s, d, "customer").createOrReplaceTempView("customer_v")
    t(s, d, "orders").createOrReplaceTempView("orders_v2")
    s.sql("""
      SELECT
        (SELECT COUNT(*) FROM customer_v
         WHERE c_custkey IN (SELECT o_custkey FROM orders_v2 WHERE o_totalprice > 100000)) AS n_big,
        (SELECT COUNT(*) FROM customer_v
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_v2)) AS n_none""")
  }

  /** x22 — IVF-flat approximate NN (the second scale path for E20 next to
    * LSH): a coarse quantizer of nlist TRAINED centroids (spherical k-means
    * over the seed convention — [[Quantizers.trainedCents]], E73) buckets
    * the corpus (one shuffle by centroid id at build time); a query probes
    * only the nprobe nearest buckets. At 100 TB the inverted lists are
    * hash-partitioned by centroid id, so a probe touches nprobe/nlist of
    * the data. Oracle-checked despite being approximate: the training is
    * deterministic fix-point arithmetic the twin re-runs in SQL, and
    * assignment argmax + probe ranking mirror it, so DuckDB reproduces the
    * identical bucketing and the full ANN output hash-matches. Recall vs
    * q29 asserted in the spec. */
  // nprobe is the serving-side recall/cost POLICY knob (FAISS convention:
  // tuned per recall target); it stays fixed while nlist derives from
  // corpus size — so the probed fraction nprobe/nlist FALLS as the corpus
  // grows and per-query candidate counts hold constant
  private val nprobe = 6

  /** The UNTRAINED seed centroids (the pre-E73 convention: the nlist lowest
    * vec_ids, raw). Spec-only — the recall-improvement assertion in
    * QuantizerSpec compares trained vs this. */
  private[graft] def seedCentroids(e: DataFrame): Array[(Long, Array[Double])] =
    e.filter(col("vec_id") < Quantizers.nlistFor(e.count()))
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))

  // ONE array Literal, not CreateArray(64 lits): the per-element form costs
  // ~65 analyzer/optimizer nodes per centroid (measured ~0.14 s of driver
  // time per x22 compile at nlist=16×dim=64) for identical semantics
  private def centCol(c: Array[Double]): Column = typedLit(c)

  /** float-vector · double-centroid dot (codegen'd, left-to-right — the
    * trained-centroid twin's list_zip CAST form exactly). */
  private def cdot(a: Column, c: Array[Double]): Column =
    graft.functions.VectorExprs.floatDoubleDot(a, centCol(c))

  /** Nearest-centroid assignment: one codegen'd whole-sweep argmax over a
    * referenced centroid matrix (lexicographic (score, cid) max — identical
    * to the old array_max-over-structs form bit for bit, without its
    * nlist-proportional codegen blowup; see
    * [[graft.functions.CentroidArgmax]]). */
  private[graft] def assign(cents: Array[(Long, Array[Double])], emb: Column): Column =
    graft.functions.VectorExprs.centroidArgmax(emb, cents).getField("cid")

  val x22: Q = (s, d) => {
    val e = t(s, d, "embeddings")
    val cents = Quantizers.trainedCents(s, d)
    // Probe selection happens DRIVER-side, like a real IVF index: the nlist
    // centroids are planner state (the trained model is already a driver
    // array), so ranking them against the one query vector is an O(nlist·dim)
    // loop, not a Spark job — mirroring cdot's exact left-to-right
    // float·double accumulation so the probe set bit-matches the twin's
    // `ORDER BY dot DESC, cid LIMIT nprobe`. At 100 TB this is what turns
    // the probe into static partition pruning (the x28 layout) instead of a
    // runtime broadcast join. One bounded collect: the single query row.
    val qf: Array[Float] = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    def qdot(c: Array[Double]): Double = {
      var sum = 0.0; var i = 0
      val n = math.min(qf.length, c.length)
      while (i < n) { sum += qf(i).toDouble * c(i); i += 1 }
      sum
    }
    val probe: Array[Long] = cents.map { case (cid, c) => (qdot(c), cid) }
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      .take(nprobe).map(_._2)
    // single scan-shaped job: assign, bucket-prune via a static IN filter,
    // score against the literal query vector, bounded TakeOrdered(10)
    e.select(col("vec_id"), col("embedding"), assign(cents, col("embedding")).as("cid"))
      .filter(col("cid").isin(probe.map(Long.box): _*))
      .select(col("vec_id"), round(dot(col("embedding"), typedLit(qf)), 4).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(10)
  }

  /** Cosine threshold shared by x25 and its generated twin (the x20/x21
    * near-dup threshold, applied within clusters). */
  private val semTau = 0.3

  /** Corpus with norm + nearest-centroid assignment — the shared front of
    * x25/x26. `spread` BEFORE the self-join: the embeddings table is one
    * small scan split, and the within-cluster join output is quadratic in
    * cluster size — without the fan-out the (broadcast-eligible) join runs
    * every pair on that single split's ONE task (measured: 37 s for x26 at
    * sf1; ~3 s spread — SemProbe). At 100 TB the scan has real splits and
    * the join is a co-partitioned exchange, but compute-proportional
    * fan-out of a compact input is exactly what spread is for. */
  private def assignedCorpus(s: SparkSession, d: String): DataFrame =
    assignedCorpusWith(s, d, Quantizers.trainedCents(s, d))

  private[graft] def assignedCorpusWith(s: SparkSession, d: String,
      cents: Array[(Long, Array[Double])]): DataFrame = {
    val e = graft.Tables.spread(t(s, d, "embeddings"))
    e.select(col("vec_id"), col("embedding"),
      VectorQueries.norm(col("embedding")).as("nrm"),
      assign(cents, col("embedding")).as("cid"))
  }

  /** Assign + norm + PQ-encode rows under a FIXED quantizer model — shared
    * by the one-time index build and the incremental append path, so an
    * appended index is byte-identical to a rebuild under the same model. */
  private[graft] def encodeRows(rows: DataFrame, cents: Array[(Long, Array[Double])],
      cbs: Array[Array[(Array[Double], Double)]]): DataFrame =
    VectorQueries.withPqCodes(
      rows.select(col("vec_id"), col("embedding"),
        VectorQueries.norm(col("embedding")).as("nrm"),
        assign(cents, col("embedding")).as("cid")), cbs)

  /** x25 — SemDeDup-style semantic dedup (E44): embedding-cosine near-dup
    * detection bucketed by IVF cluster, with a deterministic keep policy.
    * The public SemDeDup recipe (Abbas et al. 2023): cluster the corpus with
    * a coarse quantizer, compare pairs ONLY within a cluster, and drop all
    * but one of each near-dup pair — here "drop the higher vec_id", so keep
    * is reproducible on any engine with no dependence on iteration order.
    *
    * 100 TB design: this is the scale path x20's O(N²) docstring routes to —
    * the cluster id is the shuffle key, candidate generation is a
    * co-partitioned self-join, and per-cluster work is quadratic only in
    * cluster size (nlist scales with N to hold clusters at a constant
    * target size, so total work is O(N·avg_cluster), not O(N²)). The final
    * keep flag is a co-partitioned left join on vec_id. Oracle-checked
    * end-to-end despite approximation: centroids, assignment argmax, and
    * the threshold are shared constants, so the twin reproduces the
    * identical drop set. */
  val x25: Q = (s, d) => {
    val base = assignedCorpus(s, d)
    val a = base.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
      col("nrm").as("a_nrm"), col("cid"))
    val b = base.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
      col("nrm").as("b_nrm"), col("cid"))
    val dropped = a.join(b, Seq("cid")) // co-partitioned within-cluster pairs
      .filter(col("a_id") < col("b_id"))
      .filter(round(dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")), 4) > semTau)
      .select(col("b_id")).distinct()
    base.select(col("vec_id"), col("cid"))
      .join(dropped, col("vec_id") === col("b_id"), "left")
      .select(col("vec_id"), col("cid"),
        when(col("b_id").isNull, 1L).otherwise(0L).as("keep"))
      .orderBy(col("vec_id"))
  }

  /** x26 — k-NN graph construction (E45): top-3 cosine neighbors for EVERY
    * vector, candidates restricted to the vector's IVF cluster (the
    * all-vectors generalization of x23's multi-query top-k — the building
    * block for graph-based curation: SemDeDup variants, label propagation,
    * kNN classifiers over embeddings).
    *
    * 100 TB design: cluster id is the only shuffle key for candidate
    * generation; ranking goes through the bounded TopK Aggregator, so
    * partial aggregation caps each partition's contribution at k rows per
    * vector and only k rows per vector cross the group-by exchange (a
    * window formulation would shuffle every candidate pair). */
  val x26: Q = (s, d) => {
    val base = assignedCorpus(s, d)
    val a = base.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
      col("nrm").as("a_nrm"), col("cid"))
    val b = base.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
      col("nrm").as("b_nrm"), col("cid"))
    val topk = udaf(new UdfQueries.TopK(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    a.join(b, Seq("cid"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"),
        round(dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")), 4).as("sim"),
        col("b_id"))
      .groupBy(col("a_id"))
      .agg(topk(col("sim"), col("b_id")).as("top"))
      .select(col("a_id").as("vec_id"), posexplode(col("top")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rn"),
        col("col._2").as("nbr_id"), col("col._1").as("sim"))
      .orderBy(col("vec_id"), col("rn"))
  }

  /** PageRank iteration count + fixed-point scale for x139. */
  private val prIters = 5

  /** x139 — PageRank over the kNN graph (E143): the iterative-computation
    * workload class (label propagation, influence ranking, hub detection)
    * run on x26's similarity graph — nodes = vectors, directed edges =
    * top-3 within-cluster cosine neighbors. The loop is the textbook
    * Spark iterative shape: per round, one co-partitioned edges⋈scores
    * join + one map-side-combined in-degree aggregation; nothing
    * collects, the plan unrolls `prIters` rounds of narrow joins.
    *
    * Determinism (the oracle contract): scores are scaled LONGS (1e6 =
    * mass 1), per-edge contribution is `pr div out_degree` (integer
    * floor), the damped update is `150000 + (85·Σcontrib) div 100` — all
    * integer ops, so the result is independent of partitioning and merge
    * order and the twin replays the identical arithmetic with 5 unrolled
    * CTEs over the SAME regenerated graph (the full k-means training +
    * assignment + kNN chain, nothing interpolated). Dangling mass (nodes
    * whose cluster had <2 members) is dropped, the standard simplified-PR
    * convention, identically on both sides.
    *
    * 100 TB shape: edges are E·16 bytes (E = 3N), scores N·16 — both
    * hash-partition on node id and the join is co-partitioned after the
    * first round; the final top-20 is a bounded TakeOrdered. The edge set
    * is materialized ONCE with an eager localCheckpoint before the loop:
    * each round's plan embeds `esrc` and the final unrolled plan would
    * otherwise evaluate the whole kNN-graph chain (k-means assignment +
    * within-cluster top-k) once per round — invisible at bench SF where
    * the chain costs 0.4 s, an 11× recompute at sf10 where it costs ~60 s
    * (the round-15 sf10 sweep measured 655 s hot; ~60 s after the cut). */
  val x139: Q = (s, d) => {
    val edges = x26(s, d).select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      .localCheckpoint(true)
    val nodes = t(s, d, "embeddings").select(col("vec_id").as("id"))
    val outd = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    // r19 (guide §2.4): esrc is referenced by every one of the prIters
    // unrolled rounds — lazily each round re-ran the degree agg + join
    // over the checkpointed edges; one more lineage cut materializes it
    // once (E·24-byte rows, same class as the edges checkpoint above).
    val esrc = edges.join(outd, "src").localCheckpoint(true)
    var pr = nodes.select(col("id"), lit(1000000L).as("pr"))
    for (_ <- 1 to prIters) {
      val contrib = esrc
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .select(col("dst").as("id"), expr("pr div od").as("c"))
      val inSum = contrib.groupBy(col("id")).agg(sum(col("c")).as("m"))
      pr = nodes.join(inSum, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("85 * coalesce(m, 0L) div 100")).as("pr"))
    }
    val top = pr.orderBy(desc("pr"), col("id")).limit(20)
    top.withColumn("rank", row_number().over( // 20-row local frame
        Window.orderBy(desc("pr"), col("id"))))
      .select(col("rank").cast("long").as("rank"), col("id").as("vec_id"), col("pr"))
      .orderBy(col("rank"))
  }

  /** x148 — triangle count + local clustering coefficient (E152): the
    * graph-cohesion profile of x26's kNN similarity graph — per node, how
    * many of its neighbors are themselves neighbors. The standard
    * community-structure read on a similarity graph (next to x139's
    * influence ranking): high-coefficient nodes sit in tight semantic
    * clusters (dedup-cluster candidates), zero-coefficient high-degree
    * nodes are hubs bridging unrelated content.
    *
    * Shape: the directed kNN edges collapse to DISTINCT undirected (u<v)
    * pairs; triangles enumerate once each as a<b<c via two equi-joins
    * ((a,b)⋈(b,c) then the closing (a,c) semi-check) — fan-out is
    * degree-bounded (≤ 2k by construction: k out-edges, and a node can be
    * top-k of only so many others in a capped cluster), never corpus-
    * bounded. Per-node counts are map-side-combined aggs over the
    * exploded corners; all counts integer, the coefficient
    * 2T/(deg·(deg−1)) is a final-render double, fround(6); degree<2 emits
    * NULL. Every join key is a node id — co-partitionable at any scale. */
  val x148: Q = (s, d) => {
    // The undirected edge set feeds the triangle join THREE times plus the
    // degree union — five references; checkpoint-materialize once or the
    // plan evaluates the kNN chain five times (249 s → ~60 s at sf10).
    val e = x26(s, d).select(
      least(col("vec_id"), col("nbr_id")).as("u"),
      greatest(col("vec_id"), col("nbr_id")).as("v")).distinct()
      .localCheckpoint(true)
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val tri = e.select(col("u").as("a"), col("v").as("b"))
      .join(e.select(col("u").as("b"), col("v").as("c")), Seq("b"))
      .join(e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
    val tcnt = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    val degD = col("degree").cast("double")
    t(s, d, "embeddings").select(col("vec_id").as("node"))
      .join(deg, Seq("node"), "left").join(tcnt, Seq("node"), "left")
      .select(col("node").as("vec_id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(coalesce(col("degree"), lit(0L)) < 2L, lit(null).cast("double"))
          .otherwise(graft.Tables.fround(
            lit(2.0) * coalesce(col("n_tri"), lit(0L)).cast("double") /
              (degD * (degD - lit(1.0))), 6))
          .as("clustering"))
      .orderBy(col("vec_id"))
  }

  /** k-core threshold + peel-round unroll for x155. */
  // k=4: the top-3 kNN graph guarantees undirected degree >= 3 for every
  // node, so the 3-core is the whole graph; 4 is the smallest threshold
  // that actually peels (nodes with no reciprocated/extra in-edges drop,
  // then the cascade runs).
  private val coreK = 4
  private val coreRounds = 8

  /** x155 — k-core onion decomposition of the kNN graph (E159): the
    * density-stratification read next to x139's influence ranking and
    * x148's local cohesion — synchronously peel all nodes of degree < k,
    * repeat, and report for each node the ROUND it fell (its onion
    * layer; layer 0 = survived every round, i.e. sits in the k-core).
    * Outer layers are periphery/outliers; the deepest layers are the
    * semantically dense dedup-cluster cores. Reporting the layer rather
    * than just the surviving core keeps the result discriminating
    * whatever the corpus: on the top-3 kNN graph the 3-core is the whole
    * graph and the 4-core is often empty, but the k=4 peel ORDER is a
    * full density ranking either way.
    *
    * Determinism: synchronous peeling is order-independent (each round's
    * casualty set depends only on the previous round's edge set), and
    * every round is pure integer degree counting — no floats anywhere.
    * The loop unrolls `coreRounds` rounds; AdvancedSpec replays the
    * naive synchronous peel and asserts per-node layer equality.
    *
    * 100 TB shape: per round, one map-side-combined degree agg + one
    * anti-join (this round's casualties) + two node-id semi-joins — all
    * keyed on node id, co-partitioned after the first exchange like
    * x139's loop; edges only ever shrink. Each round's edge set is
    * materialized with an eager localCheckpoint — a round references the
    * previous edge set five times (degree union + the two semi-join
    * probes), so leaving the lineage lazy would nest 5^rounds copies of
    * the kNN chain into one plan; the checkpoint is the standard Spark
    * iterative-algorithm lineage cut (x139/x148 now cut the kNN lineage
    * the same way — see their headers for the sf10 numbers). */
  val x155: Q = (s, d) => {
    var edges = x26(s, d).select(
      least(col("vec_id"), col("nbr_id")).as("u"),
      greatest(col("vec_id"), col("nbr_id")).as("v")).distinct()
      .localCheckpoint(true)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val d1 = degrees(edges).localCheckpoint(true) // initial degrees; k0 = its node set
    var keep = d1.select(col("node"))
    var layers: DataFrame = null
    // r19 (optimization, guide §2.4/§1.2): EARLY-EXIT at the fixed point.
    // Once a round peels nothing, keepNext == keep and the edge set is
    // unchanged, so every later round is a provable no-op contributing
    // zero layer rows — the unrolled-8-rounds twin still hash-matches
    // because those rounds never emit. The per-round emptiness check is
    // one action over an anti-join of two checkpoint-materialized node
    // sets (cheap); at bench data the cascade converges in ~3 rounds, so
    // the exit skips ~5 rounds × (2 eager checkpoints + 3 joins) each.
    // The r18 convergence guard is now structural: a loop that runs all
    // `coreRounds` rounds without an empty peel fails the same require.
    var converged = false
    var round = 0
    while (!converged && round < coreRounds) {
      round += 1
      val keepNext = degrees(edges).filter(col("dg") >= coreK).select(col("node"))
        .localCheckpoint(true)
      val peeled = keep.join(keepNext, Seq("node"), "left_anti")
        .select(col("node"), lit(round.toLong).as("layer"))
      converged = peeled.isEmpty
      if (!converged) {
        layers = if (layers == null) peeled else layers.unionAll(peeled)
        edges = edges
          .join(keepNext.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
          .join(keepNext.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
          .localCheckpoint(true)
        keep = keepNext
      }
    }
    // Convergence guard (r18): unpeeled survivors past the unroll bound
    // would silently read as layer 0 ("in the core") — loud error instead.
    require(converged,
      s"x155: k-core peel has not converged after $coreRounds rounds " +
        s"(round $coreRounds still peeled nodes) — raise coreRounds for this graph")
    // layers == null ⇔ round 1 already peeled nothing (whole graph is the
    // k-core): every node is layer 0, same as the old all-empty-unions path.
    val base = d1.select(col("node").as("vec_id"), col("dg").as("init_degree"))
    val out =
      if (layers == null) base.withColumn("layer", lit(0L))
      else base.join(layers.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
        .withColumn("layer", coalesce(col("layer"), lit(0L)))
    out.select(col("vec_id"), col("layer"), col("init_degree"))
      .orderBy(col("vec_id"))
  }

  /** Synchronous LPA rounds for x163. 4 suffices on the kNN graph: labels
    * stabilize inside the tight clusters by round 3 (spec asserts the
    * round-4 relabel rate; the operator reports it so drift is visible). */
  private val lpaRounds = 4

  /** x163 — label-propagation communities on the kNN graph (E168): the
    * COMMUNITY view of the similarity graph, completing the graph family's
    * four orthogonal reads — x139 ranks influence, x148 measures local
    * cohesion, x155 stratifies by density, x163 PARTITIONS into dense
    * semantic neighborhoods (near-duplicate topic groups — what a curation
    * pass samples per-community to de-bias a 100 TB corpus). Unlike x44's
    * connected components (reachability — one bridge edge merges
    * everything), LPA keeps weakly-bridged clusters apart: a node adopts
    * the MAJORITY label of its neighbors, so a single cross-cluster kNN
    * edge cannot flip a community.
    *
    * Determinism: synchronous rounds (round r+1 depends only on round r's
    * labels — partition-order-free), integer counts, ties broken by MIN
    * label via the struct-max total order (max (cnt, −lbl)); the twin
    * replays `lpaRounds` unrolled CTEs with ROW_NUMBER (cnt DESC, lbl).
    * Isolated nodes (cluster of size 1 ⇒ no kNN edges) keep their own
    * label, identically on both sides.
    *
    * 100 TB shape: x139's loop shape exactly — per round ONE
    * co-partitioned nbr⋈labels join + a map-side-combined (node, lbl)
    * count + a struct-max pick, everything keyed on node id; edges and
    * labels are 16-byte rows; output is a bounded TakeOrdered top-20
    * plus a 1-row convergence readout via a scalar agg. */
  val x163: Q = (s, d) => {
    val und = x26(s, d).select(
      least(col("vec_id"), col("nbr_id")).as("u"),
      greatest(col("vec_id"), col("nbr_id")).as("v")).distinct()
    val nbr = und.select(col("u").as("node"), col("v").as("nb"))
      .unionAll(und.select(col("v").as("node"), col("u").as("nb")))
      .localCheckpoint(true) // reused every round — cut the kNN lineage once
    val nodes = t(s, d, "embeddings").select(col("vec_id").as("id"))
    var lab = nodes.select(col("id"), col("id").as("lbl"))
    var relabeled: DataFrame = null
    for (r <- 1 to lpaRounds) {
      val pick = nbr
        .join(lab.select(col("id").as("nb"), col("lbl")), "nb")
        .groupBy(col("node"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("node").as("id"), (-col("m.neg")).as("newl"))
      // r19 (guide §2.4): lab IS the node universe (one row per node id,
      // invariant since round 0), so the old 3-way nodes⋈pick⋈lab join
      // carried a redundant co-partitioned join per round — lab left-joins
      // pick directly, one exchange fewer each round.
      val next = lab.withColumnRenamed("lbl", "oldl")
        .join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("newl"), col("id")).as("lbl"),
          col("oldl"))
        .localCheckpoint(true) // referenced twice (next round + readout)
      relabeled = next.filter(col("lbl") =!= col("oldl"))
        .agg(count(lit(1)).as("n"))
      lab = next.select(col("id"), col("lbl"))
    }
    val nMoved = relabeled.head.getLong(0) // 1-row scalar — convergence readout
    val top = lab.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
      .orderBy(desc("n_members"), col("lbl")).limit(20)
    top.withColumn("rank", row_number().over( // 20-row local frame
        Window.orderBy(desc("n_members"), col("lbl"))))
      .select(col("rank").cast("long").as("rank"), col("lbl").as("community"),
        col("n_members"), lit(nMoved).as("last_round_moves"))
      .orderBy(col("rank"))
  }

  /** x27 — ANN retrieval join (E50): top-3 IVF-probed cosine neighbors for
    * a SET of query vectors against the whole corpus — the batch retrieval
    * verb (RAG index backfill, hard-negative mining) that generalizes x22
    * (one query) and bounds x23 (probed candidates instead of the full
    * corpus per query).
    *
    * 100 TB shape: the corpus is assigned once (expression-only) and
    * shuffled once by cluster id; the probe table (q_id → nprobe cluster
    * ids, nprobe·|Q| rows) and the query vectors are broadcast — so each
    * query touches nprobe/nlist of the corpus and the corpus never moves
    * per-query. Ranking through the bounded TopK Aggregator: k rows per
    * query cross the exchange. Self-matches excluded (the benchmark-honest
    * form — a query finding itself is not retrieval). */
  private val retrievalQ = 100

  val x27: Q = (s, d) => retrievalWith(s, d, Quantizers.trainedCents(s, d))

  /** nprobe nearest centroids per query row (q_id, qe, …): ONE posexplode
    * over the centroid-matrix literal + a codegen'd dot per (query, cid).
    * Replaces an explode over an nlist-struct expression TREE whose
    * generated code failed janino's 64 KB budget at sf10's nlist=2048 and
    * whose 2048-node plan the driver re-analyzed per serve (r18 — the
    * PqArgmin finding's query-side sibling). Bit-identical ranking: the
    * same floatDoubleDot scores under the same (sc DESC, cid) order. */
  private def probesFor(q: DataFrame, cents: Array[(Long, Array[Double])]): DataFrame =
    q.select(col("q_id"), col("qe"), posexplode(typedLit(cents.map(_._2))))
      .select(col("q_id"),
        element_at(typedLit(cents.map(_._1)), col("pos") + 1).as("cid"),
        graft.functions.VectorExprs.floatDoubleDot(col("qe"), col("col")).as("sc"))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(desc("sc"), col("cid"))))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("cid"))

  private[graft] def retrievalWith(s: SparkSession, d: String,
      cents: Array[(Long, Array[Double])]): DataFrame = {
    val base = assignedCorpusWith(s, d, cents)
    val q = base.filter(col("vec_id") < retrievalQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qnrm"))
    // probe sets: nprobe centroids nearest to each query vector
    // (tie → lower cid, mirroring x22's deterministic probe ranking)
    val probes = probesFor(q, cents)
    val topk = udaf(new UdfQueries.TopK(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    base.join(broadcast(probes), Seq("cid")) // bucket-pruned candidates
      .join(broadcast(q), Seq("q_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"),
        round(dot(col("embedding"), col("qe")) / (col("nrm") * col("qnrm")), 4).as("sim"),
        col("vec_id"))
      .groupBy(col("q_id"))
      .agg(topk(col("sim"), col("vec_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rn"),
        col("col._2").as("vec_id"), col("col._1").as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Session-scoped persisted-IVF-index cache (the Tables.t / x72-cuts
    * pattern): build once per (session, table dir), serve many. The index
    * IS the assigned corpus written as parquet PARTITIONED BY cluster id —
    * at 100 TB this is the one-time index-build job whose output layout
    * makes every retrieval query touch only its probed partitions. The
    * centroids and the query-vector batch are collected ONCE at build time
    * (both bounded: nlist·dim floats, retrievalQ rows) and cached alongside
    * the dir, so serving never re-derives them from a table scan.
    *
    * Deployment notes: (1) the default index path is a driver-local temp
    * dir — correct in local mode where driver and executors share a
    * filesystem; on a real cluster set `graft.ivf.indexBase` to a
    * shared-FS/object-store path and the partitioned write/read goes there
    * instead. (2) the cache assumes the source table dir is immutable for
    * the life of the session (true for this engine's snapshot-log tables,
    * where a new snapshot is a new dir) — mutating parquet in place under
    * a cached index would serve stale results. Evicted/shutdown entries
    * delete their temp dirs. */
  private case class IvfIndex(dir: String, owned: Boolean,
                              cents: Array[(Long, Array[Double])],
                              queryRows: Array[(Long, Seq[Float], Double)],
                              cbs: Array[Array[(Array[Double], Double)]],
                              raw: DataFrame, // resolved read: ONE partition
                              // discovery per build — at sf10's nlist=2048 a
                              // fresh s.read.parquet(dir) re-lists 2,048
                              // directories (a Spark listing job) per call
                              serving: DataFrame,
                              codesServing: DataFrame,
                              maxVecId: Long)

  private val ivfIndexCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), IvfIndex]

  private def deleteDir(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    } catch { case _: java.io.IOException => () }

  private lazy val ivfCleanupHook: Unit = {
    import scala.jdk.CollectionConverters._
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      ivfIndexCache.values.asScala.foreach(ix => if (ix.owned) deleteDir(ix.dir))))
  }

  private def ivfIndex(s: SparkSession, d: String): IvfIndex = {
    ivfCleanupHook
    // evict entries whose session has stopped; only dirs THIS cache created
    // (owned temp dirs) are deleted — dirs under a user-provided
    // graft.ivf.indexBase may be serving other sessions and are left alone
    val it = ivfIndexCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) {
        // unpersist for symmetry with the appendToIndex refresh path: a
        // stopped context has already dropped its blocks (the call is a
        // no-op there), but if eviction is ever extended to live-session
        // invalidation this is the line that prevents a cache-block leak
        try e.getValue.serving.unpersist() catch { case _: Exception => () }
        try e.getValue.codesServing.unpersist() catch { case _: Exception => () }
        if (e.getValue.owned) deleteDir(e.getValue.dir)
        it.remove()
      }
    }
    // computeIfAbsent is atomic per key: concurrent serving queries for the
    // same (session, dataset) see exactly one build, never two writers
    // racing write.mode("overwrite") into one dir
    ivfIndexCache.computeIfAbsent((s, d), { _ =>
      val base = s.conf.get("graft.ivf.indexBase", "")
      val (dir, owned) =
        if (base.nonEmpty) {
          // collision-resistant digest of the dataset path (Int hashCode
          // collides across dirs and abs(MinValue) stays negative); the
          // parquet writer's Hadoop FS creates the path, so this works for
          // object-store bases too, not just driver-visible filesystems
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (s"$base/graft-ivf-$md", false)
        } else
          (java.nio.file.Files.createTempDirectory("graft-ivf-index").toString, true)
      // the index carries BOTH raw vectors (x28's exact serving) and the
      // 4-bit PQ code columns (x80's ADC serving reads only those — at
      // 100 TB a memory-tier index would keep codes alone)
      val cbs = VectorQueries.pqCodebooks(s, d)
      // repartition ON cid before the partitioned write: without it every
      // shuffle task writes a file into every cid directory — tasks x nlist
      // files (measured 131k files at sf10's nlist=2048, each creation
      // forking a chmod through RawLocalFileSystem; the r18 index-build
      // stall). One file per cluster is also the layout partition-pruned
      // serving wants: a probe reads nprobe files, not nprobe x tasks.
      encodeRows(graft.Tables.spread(t(s, d, "embeddings")),
          Quantizers.trainedCents(s, d), cbs)
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(dir)
      val cents = Quantizers.trainedCents(s, d)
      val qRows = s.read.parquet(dir)
        .filter(col("vec_id") < retrievalQ)
        .select(col("vec_id"), col("embedding"), col("nrm"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        .sortBy(_._1)
      // The query batch is a build-time constant, so its probe UNION is
      // too: persist the pruned, projected serving scan ONCE. Serving then
      // reads memory, not parquet — the build-once/serve-many economics a
      // vector store actually has (fresh x27 compute reads the
      // memory-cached source table; an index that re-reads parquet per
      // query loses to it at every scale — measured 0.75 s vs 0.53 s hot
      // at sf0.1 pre-fix). At 100 TB the memory tier holds the code
      // columns (x80's layout); raw vectors page in from the probed
      // partitions only.
      // build-time corpus bound for the append-contract guard: one
      // footer-stats agg over the just-written index (bounded cost, build
      // time only; maintained incrementally by appendToIndex thereafter)
      val maxId = s.read.parquet(dir).agg(max(col("vec_id"))).head.getLong(0)
      IvfIndex(dir, owned, cents, qRows, cbs, s.read.parquet(dir),
        servingScan(s, dir, cents, qRows), codesScan(s, dir, cents, qRows), maxId)
    })
  }

  /** The index dir alone (spec/inspection surface). */
  def ivfIndexDir(s: SparkSession, d: String): String = ivfIndex(s, d).dir

  /** Incremental index maintenance (E76): assign + PQ-encode a batch of NEW
    * vectors under the index's FROZEN quantizer model and append them to the
    * cid-partitioned layout — the streaming half of build-once/serve-many
    * (FAISS `add` after `train`; a production store retrains/rebuilds
    * offline when drift accumulates, it does not retrain per batch). Meant
    * as a Structured Streaming `foreachBatch` body (IngestJob composition —
    * E68's curate-on-ingest pattern pointed at the index): each micro-batch
    * is one append job writing only its own partition files, and the cached
    * serving scan is refreshed so serve-after-append is indistinguishable
    * from a rebuild under the same model (asserted byte-identical in
    * StreamingSpec).
    *
    * 100 TB shape: the model (nlist·dim centroids + pqM·pqK·pqDims
    * codewords) is a broadcast-sized expression literal; the append is
    * map-only into the partitioned layout; nothing existing is rewritten.
    * Caller contract: vec_ids in `batch` must be new (the index has no
    * upsert semantics, like FAISS add). */
  // One lock object per (session, dataset): appends into a single
  // cid-partitioned dir must not interleave (two racing parquet append jobs
  // plus two computeIfPresent refreshes can pin a serving scan whose file
  // listing misses the other writer's files). The streaming contract is
  // foreachBatch = one writer, but the guard makes the API safe, not just
  // the documented usage.
  private val appendLocks = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Object]

  def appendToIndex(s: SparkSession, d: String, batch: DataFrame): Unit =
    appendLocks.computeIfAbsent((s, d), _ => new Object).synchronized {
      val ix = ivfIndex(s, d)
      // Caller contract (vec_ids strictly new — FAISS add, no upsert) is
      // enforced, not assumed: a duplicate or out-of-order id would silently
      // corrupt serving (queryRows froze at build time, duplicates surface
      // in x28's top-k). One bounded agg over the micro-batch.
      val bounds = batch.agg(min(col("vec_id")), max(col("vec_id"))).head
      require(!bounds.isNullAt(0), "appendToIndex: empty batch")
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      require(lo > ix.maxVecId,
        s"appendToIndex: batch vec_ids [$lo,$hi] overlap the index (max ${ix.maxVecId}); " +
          "the index has no upsert semantics — assign new ids or rebuild")
      encodeRows(batch, ix.cents, ix.cbs)
        .repartition(col("cid")) // one append file per touched cluster
        .write.mode("append").partitionBy("cid").parquet(ix.dir)
      // refresh: drop stale file listings and re-pin the pruned serving scan
      ivfIndexCache.computeIfPresent((s, d), { (_, old) =>
        old.serving.unpersist()
        old.codesServing.unpersist()
        s.catalog.refreshByPath(old.dir)
        old.copy(raw = s.read.parquet(old.dir), // fresh listing after append
          serving = servingScan(s, old.dir, old.cents, old.queryRows),
          codesServing = codesScan(s, old.dir, old.cents, old.queryRows),
          maxVecId = hi)
      })
    }

  /** Index rebuild under a RETRAINED model (E78) — the drift half of E76's
    * append contract: retrain both quantizers on the GROWN corpus (original
    * build + every appended batch, read back from the index's own raw-vector
    * column), re-encode everything through the same [[encodeRows]], write a
    * fresh cid-partitioned layout, swap the serving cache atomically, and
    * delete the old owned dir. FAISS retrain + re-add — the offline
    * maintenance job a production store schedules when append drift
    * accumulates; E76 stays the cheap map-only path between rebuilds.
    *
    * The retrained model is PRIVATE to the rebuilt index: the
    * (session, dir) Quantizers caches keep the source-table models that
    * x83/x84 and fresh computes (x27/x57) are defined over. Serialized with
    * appends via the same per-index lock. Returns the new index dir. */
  def rebuildIndex(s: SparkSession, d: String): String =
    appendLocks.computeIfAbsent((s, d), _ => new Object).synchronized {
      val old = ivfIndex(s, d)
      val grown = s.read.parquet(old.dir).select(col("vec_id"), col("embedding"))
      // twin-less rebuild path: nlist legitimately derives from the GROWN
      // corpus (the whole point of retraining after append drift)
      val grownN = grown.count()
      val km = Quantizers.trainKmOn(grown, Quantizers.nlistFor(grownN), grownN)
      val pq = Quantizers.trainPqOn(grown, grownN)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
      encodeRows(graft.Tables.spread(grown), km.cents, pq.cbs)
        .repartition(col("cid")) // one file per cluster (see ivfIndex)
        .write.mode("overwrite").partitionBy("cid").parquet(dir)
      val qRows = s.read.parquet(dir)
        .filter(col("vec_id") < retrievalQ)
        .select(col("vec_id"), col("embedding"), col("nrm"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        .sortBy(_._1)
      val maxId = s.read.parquet(dir).agg(max(col("vec_id"))).head.getLong(0)
      val fresh = IvfIndex(dir, owned = true, km.cents, qRows, pq.cbs,
        s.read.parquet(dir),
        servingScan(s, dir, km.cents, qRows), codesScan(s, dir, km.cents, qRows), maxId)
      ivfIndexCache.put((s, d), fresh)
      old.serving.unpersist()
      old.codesServing.unpersist()
      if (old.owned) deleteDir(old.dir)
      dir
    }

  /** The union of all per-query probe sets — the static partition filter
    * both pinned serving tiers share. ddot = floatDoubleDot's exact
    * accumulation, the x80 driver pattern. */
  private def probedUnion(cents: Array[(Long, Array[Double])],
      qRows: Array[(Long, Seq[Float], Double)]): Seq[Long] =
    qRows.flatMap { case (_, qe, _) =>
      val qv = qe.toArray
      cents.map { case (cid, c) =>
        (cid, qv.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x.toDouble * y })
      }.sortBy { case (cid, sc) => (-sc, cid) }.take(nprobe).map(_._1)
    }.distinct.sorted.toSeq

  /** The pruned, projected, memory-pinned RAW serving scan: the probe UNION
    * of the (build-time-constant) query batch as a static cid partition
    * filter. */
  private def servingScan(s: SparkSession, dir: String,
      cents: Array[(Long, Array[Double])],
      qRows: Array[(Long, Seq[Float], Double)]): DataFrame =
    s.read.parquet(dir)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid").cast("long").as("cid"))
      .filter(col("cid").isin(probedUnion(cents, qRows): _*)) // prunes index partitions
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** The CODES-tier sibling: vec_id + cid + nrm + c0..c7 (~12 B/row), same
    * static partition filter, memory-pinned — the tier a 100 TB deployment
    * actually holds resident (x80's layout); x85's shortlist reads this. */
  private def codesScan(s: SparkSession, dir: String,
      cents: Array[(Long, Array[Double])],
      qRows: Array[(Long, Seq[Float], Double)]): DataFrame =
    s.read.parquet(dir)
      .select(col("vec_id") +: col("cid").cast("long").as("cid") +: col("nrm") +:
        (0 until VectorQueries.pqM).map(i => col(s"c$i")): _*)
      .filter(col("cid").isin(probedUnion(cents, qRows): _*)) // prunes index partitions
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** x28 — indexed ANN retrieval (E51): x27's EXACT contract served from
    * the persisted IVF index instead of recomputing assignment per query —
    * the build-once / serve-many split a production vector store runs. The
    * probe cluster ids are ranked at BUILD time (bounded by nlist) into a
    * STATIC partition filter on a persisted serving scan, so serving reads
    * only the probed partitions and reads them from memory (partition
    * pruning asserted in the spec); everything downstream of the scan is
    * the x27 plan. Same oracle as x27: serving from the index must be
    * indistinguishable from computing fresh. */
  val x28: Q = (s, d) => {
    val ix = ivfIndex(s, d)
    import s.implicits._
    // query batch + probe ranking run over a LocalRelation (the cached
    // collected rows) — zero table scans before the single pruned serving
    // scan below; the expressions are byte-for-byte x27's, so the ranking
    // and the served sims are bit-identical to computing fresh.
    val q = ix.queryRows.toSeq.toDF("q_id", "qe", "qnrm")
    val probes = probesFor(q, ix.cents)
    val topk = udaf(new UdfQueries.TopK(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    // ix.serving is the persisted pre-pruned scan (static cid partition
    // filter baked in at build time, asserted in the spec); the per-query
    // probe join below re-restricts each query to ITS probe set.
    ix.serving
      .join(broadcast(probes), Seq("cid"))
      .join(broadcast(q), Seq("q_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"),
        round(dot(col("embedding"), col("qe")) / (col("nrm") * col("qnrm")), 4).as("sim"),
        col("vec_id"))
      .groupBy(col("q_id"))
      .agg(topk(col("sim"), col("vec_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rn"),
        col("col._2").as("vec_id"), col("col._1").as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Shortlist size for the refine stage: k·nprobe (top-3 × 6 probes) —
    * the bound the re-rank join pays per query. */
  private val refineShort = 3 * nprobe

  /** x85 — refine serving (E77): the FAISS "refine" composition — an
    * inner-product ADC shortlist computed from the PQ CODE columns (plus
    * the 8-byte stored norm), then an exact cosine re-rank of only the
    * ≤k·nprobe shortlisted raw vectors — x27's query batch and scoring
    * expressions on a bounded candidate set.
    *
    * Contract: honest FAISS refine semantics, NOT exact-serving like x28.
    * The exact contract is unreachable from a 4-bit-code shortlist on this
    * corpus — measured (RefineProbe, sf0.001): the worst true-top-3 hit
    * sits at ADC rank 155 of ~190 probed candidates, so a recall-1.0
    * shortlist would be the whole probe set and the codes tier would prune
    * nothing. What refine DOES guarantee: sims on the shortlist are exact
    * (score error of pure ADC serving is eliminated), and recall@3 is
    * lifted over ADC-only ranking at the same candidate budget (asserted
    * in the spec). The oracle is its OWN generated twin ([[refineOracle]])
    * that re-runs the full two-stage pipeline in SQL — codebook training,
    * IP-LUT, shortlist comparator, exact re-rank — from the same constants,
    * so the gate is hash-exact on the refine semantics.
    *
    * This is the serving mode that matters at 100 TB where the raw-vector
    * tier cannot be memory-pinned: the shortlist stage reads ~12 B per
    * candidate (codes + norm) from the probed partitions only (no
    * embedding bytes — ReadSchema asserted in the spec), and raw vectors
    * are touched for just |Q|·k·nprobe rows via the vec_id join. Here the
    * re-rank side reads the memory-pinned serving scan; on a cluster it
    * would page in the probed partitions' raw tier.
    *
    * Plan shape: codes scan (partition-pruned, codes+norm only) →
    * broadcast probe join → per-query IP-ADC against a broadcast LUT
    * table (pqM·pqK doubles per query, driver-computed like x80's) →
    * bounded TopK(k·nprobe) shortlist (only k·nprobe rows per query cross
    * the exchange) → broadcast the |Q|·k·nprobe shortlist into the
    * raw-vector join → x27's exact scoring + TopK(3). */
  /** The ADC shortlist frame: (q_id, vec_id), ≤k·nprobe ids per query,
    * ranked by ADC distance from the CODE columns only. private[graft] so
    * the spec can assert true-top-k ⊆ shortlist directly (a recall break
    * must fail loudly, not surface as an oracle hash mismatch). */
  private[graft] def refineShortlist(s: SparkSession, d: String): DataFrame = {
    val ix = ivfIndex(s, d)
    import s.implicits._
    // per-query probe sets + ADC LUTs, both bounded driver constants
    // (nprobe·|Q| pairs; pqM·pqK doubles per query) — same ddot ranking as
    // servingScan/x80, so probes are bit-identical to x27's
    def ddot(qv: Array[Float], c: Array[Double]): Double =
      qv.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x.toDouble * y }
    val probePairs = ix.queryRows.toSeq.flatMap { case (qid, qe, _) =>
      val qv = qe.toArray
      ix.cents.map { case (cid, c) => (cid, ddot(qv, c)) }
        .sortBy { case (cid, sc) => (-sc, cid) }.take(nprobe)
        .map { case (cid, _) => (qid, cid) }
    }
    // inner-product LUTs (FAISS METRIC_INNER_PRODUCT): the shortlist must
    // rank by APPROXIMATE COSINE — q·x̂ / ‖x‖ — to align with the exact
    // contract's ranking; a distance-LUT (‖q−x̂‖²) shortlist mis-ranks
    // whenever corpus norms vary and tanks shortlist recall (measured: ~45%
    // of queries lost a true top-3 at sf0.001). FLATTENED to one
    // pqM·pqK-element array per query (lut[sub·pqK + code]) and pre-joined
    // with the probe pairs driver-side, so each candidate row pays ONE
    // broadcast hash probe and single-level element_at lookups.
    val lutByQ = ix.queryRows.map { case (qid, qe, _) =>
      qid -> VectorQueries.pqDotLut(qe.toArray, ix.cbs).flatten.toSeq
    }.toMap
    val probes = probePairs.map { case (qid, cid) => (qid, cid, lutByQ(qid)) }
      .toDF("q_id", "cid", "lut")
    // codes-tier shortlist scan: vec_id + cid + c0..c7 + the 8-byte nrm
    // scalar, probed partitions only, pinned at build time — no embedding
    // bytes on the shortlist path
    val codes = ix.codesServing
    // approximate dot against the per-query LUT column: 8 lookups + 7 adds
    val adot = (0 until VectorQueries.pqM)
      .map(i => element_at(col("lut"), (lit(i * VectorQueries.pqK) + col(s"c$i") + 1).cast("int")))
      .reduce(_ + _)
    val shortTopK = udaf(new UdfQueries.TopK(refineShort),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    codes
      .join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), (adot / col("nrm")).as("acos"), col("vec_id"))
      .groupBy(col("q_id"))
      .agg(shortTopK(col("acos"), col("vec_id")).as("short")) // approx-cos desc, tie → low vec_id
      .select(col("q_id"), posexplode(col("short._2")))
      .select(col("q_id"), col("col").as("vec_id"), (col("pos") + 1).cast("long").as("srn"))
  }

  /** Diagnostic surface (RefineProbe): full ADC ranking (q_id, vec_id,
    * rank) over the probed candidates, no shortlist cutoff. */
  private[graft] def refineAdcRanks(s: SparkSession, d: String): DataFrame = {
    val ix = ivfIndex(s, d)
    import s.implicits._
    def ddot(qv: Array[Float], c: Array[Double]): Double =
      qv.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x.toDouble * y }
    val probePairs = ix.queryRows.toSeq.flatMap { case (qid, qe, _) =>
      val qv = qe.toArray
      ix.cents.map { case (cid, c) => (cid, ddot(qv, c)) }
        .sortBy { case (cid, sc) => (-sc, cid) }.take(nprobe)
        .map { case (cid, _) => (qid, cid) }
    }
    val lutByQ = ix.queryRows.map { case (qid, qe, _) =>
      qid -> VectorQueries.pqDotLut(qe.toArray, ix.cbs).flatten.toSeq
    }.toMap
    val probes = probePairs.map { case (qid, cid) => (qid, cid, lutByQ(qid)) }
      .toDF("q_id", "cid", "lut")
    val codes = ix.codesServing
    val adot = (0 until VectorQueries.pqM)
      .map(i => element_at(col("lut"), (lit(i * VectorQueries.pqK) + col(s"c$i") + 1).cast("int")))
      .reduce(_ + _)
    codes.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), (adot / col("nrm")).as("acos"), col("vec_id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(desc("acos"), col("vec_id"))).cast("long"))
      .select(col("q_id"), col("vec_id"), col("rank"))
  }

  val x85: Q = (s, d) => {
    val ix = ivfIndex(s, d)
    import s.implicits._
    val q = ix.queryRows.toSeq.toDF("q_id", "qe", "qnrm")
    // exact re-rank of the bounded shortlist against the raw-vector tier
    val topk = udaf(new UdfQueries.TopK(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    ix.serving
      .join(broadcast(refineShortlist(s, d).select(col("q_id"), col("vec_id"))),
        Seq("vec_id")) // ≤ |Q|·k·nprobe rows
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"),
        round(dot(col("embedding"), col("qe")) / (col("nrm") * col("qnrm")), 4).as("sim"),
        col("vec_id"))
      .groupBy(col("q_id"))
      .agg(topk(col("sim"), col("vec_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rn"),
        col("col._2").as("vec_id"), col("col._1").as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** x57 — IVF-PQ retrieval (E60): the full FAISS serving shape in one
    * plan — the coarse quantizer prunes the corpus to nprobe clusters
    * (x22's probe), then ADC scores ONLY the probed vectors from their
    * 4-bit PQ codes against the query's LUT (x56's arithmetic). This is
    * the composition a production vector store actually runs: IVF bounds
    * the candidate set, PQ bounds the bytes per candidate.
    *
    * 100 TB shape: one map-only pass annotates the corpus with (cid,
    * c0..c7) — at scale this is the persisted index layout (x28's
    * cid-partitioned parquet with a 4 B code column instead of the raw
    * vector); serving reads nprobe/nlist of the rows × 4 B of code per
    * row, the probe set is a broadcast, and top-k is
    * TakeOrderedAndProject. Candidate traffic vs q29's brute scan:
    * (nprobe/nlist) × (4 B / 256 B) ≈ 1/170 at these constants.
    * Oracle-checked end-to-end: probe ranking, assignment argmax, code
    * argmin, and the LUT all mirror their proven x22/x55/x56 twins. */
  val x57: Q = (s, d) => {
    val e = t(s, d, "embeddings")
    val cents = Quantizers.trainedCents(s, d)
    val cbs = VectorQueries.pqCodebooks(s, d)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    // posexplode over the centroid-matrix literal (the probesFor form):
    // the nlist-struct tree variant failed codegen at sf10's nlist=2048
    val probeCids = q.select(col("qe"), posexplode(typedLit(cents.map(_._2))))
      .select(graft.functions.VectorExprs.floatDoubleDot(col("qe"), col("col")).as("sc"),
        element_at(typedLit(cents.map(_._1)), col("pos") + 1).as("cid"))
      .orderBy(desc("sc"), col("cid")).limit(nprobe)
      .select(col("cid"))
    // spread the encode pass: assignment (nlist dots) + 128 subspace
    // distances per row over a one-split scan would run single-task
    val coded = VectorQueries.withPqCodes(
      graft.Tables.spread(e).select(col("vec_id"), col("embedding"),
        assign(cents, col("embedding")).as("cid")), cbs)
    coded.join(broadcast(probeCids), "cid") // cluster-pruned candidates
      .select(col("vec_id"),
        VectorQueries.pqAdist(VectorQueries.pqLut(qv, cbs)).as("raw"))
      .orderBy(col("raw"), col("vec_id")).limit(10)
      .select(col("vec_id"), graft.Tables.fround(col("raw"), 6).as("adist"))
  }

  /** x80 — indexed IVF-PQ serving (E69): x57's EXACT contract served from
    * the persisted index — the deployed layout both the x56 and x57
    * docstrings point at, made real. The probe set is ranked driver-side
    * over the cached centroids (bounded, the same left-to-right dot as
    * floatDot, so the ranking is bit-identical to x57's), becomes a STATIC
    * cid partition filter, and the serving scan reads ONLY (vec_id,
    * c0..c7) from the probed partitions — no embedding bytes touch the
    * serving path (ReadSchema asserted in the spec): nprobe/nlist of the
    * rows × ~4 B of code per row. ADC against the query LUT and top-k are
    * x57's expressions. Same oracle as x57: serving from the index must be
    * indistinguishable from computing fresh. */
  val x80: Q = (s, d) => {
    val ix = ivfIndex(s, d)
    val qv = ix.queryRows.find(_._1 == 0L).get._2.toArray
    def ddot(c: Array[Double]): Double = // floatDoubleDot's accumulation, driver-side
      qv.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x.toDouble * y }
    val probed = ix.cents.map { case (cid, c) => (cid, ddot(c)) }
      .sortBy { case (cid, sc) => (-sc, cid) }.take(nprobe).map(_._1)
    ix.raw // build-time resolved read — no per-call partition re-discovery
      .filter(col("cid").isin(probed: _*)) // prunes index partitions
      .select(col("vec_id"),
        VectorQueries.pqAdist(VectorQueries.pqLut(qv, ix.cbs)).as("raw"))
      .orderBy(col("raw"), col("vec_id")).limit(10)
      .select(col("vec_id"), graft.Tables.fround(col("raw"), 6).as("adist"))
  }

  /** x69 — embedding outlier detection (E67): per vector, the squared L2
    * distance to its assigned IVF centroid, the cluster's mean distance,
    * and an outlier flag (distance > τ=1.25× cluster mean — the far-tail
    * cut for this corpus; production picks τ from the distance
    * distribution) — the embedding-space
    * quality gate a pipeline runs before trusting vectors for retrieval or
    * semantic dedup (a vector far from every centroid is noise, a bad
    * encode, or out-of-domain).
    *
    * d² = ⟨x,x⟩ − 2⟨x,c⟩ + ‖c‖² on the codegen'd floatDot (x55's proven
    * expansion); per-row distances round to exact scale-6 longs
    * (floor-fix-point) so the per-cluster sums are order-independent and
    * the mean is bit-identical on both engines.
    *
    * 100 TB shape: assignment + distance are one map-only pass (centroids
    * are broadcast literals); cluster stats are an nlist-row aggregate;
    * the stats join back is an nlist-row broadcast. Nothing quadratic,
    * nothing collected beyond the nlist centroid seeds. */
  val x69: Q = (s, d) => {
    val e = t(s, d, "embeddings")
    val cents = Quantizers.trainedCents(s, d).sortBy(_._1) // cids are 0..nlist-1: positional
    val cn: Map[Long, Double] = cents.map { case (cid, c) =>
      cid -> c.foldLeft(0.0)((a, x) => a + x * x)
    }.toMap
    // distance to the ASSIGNED centroid only, via the matrix literal
    // (r18): the old nlist-element expression ARRAY computed all nlist
    // distances per row to pick one — an nlist x work amplification that
    // also failed codegen at sf10's nlist=2048. Bit-identical arithmetic:
    // the same dot/2.0/norm term sequence, c fetched by element_at.
    val centMat = typedLit(cents.map(_._2))
    val cnArr = typedLit(cents.map { case (cid, _) => cn(cid) })
    val idx = col("cid").cast("int") + 1
    val d2 = (dot(col("embedding"), col("embedding")) -
      lit(2.0) * graft.functions.VectorExprs.floatDoubleDot(
        col("embedding"), element_at(centMat, idx))) + element_at(cnArr, idx)
    // Materialized ONCE (the x142 convention): `dists` feeds BOTH the
    // cluster-stats aggregate and the join probe side below — lazy lineage
    // would run the nlist·dim assignment sweep twice (measured 2× the
    // whole-key wall at sf10). The checkpointed frame is 3 slim columns.
    val dists = graft.Tables.spread(e) // nlist+1 dots/row on a one-split scan: fan out
      .select(col("vec_id"), col("embedding"), assign(cents, col("embedding")).as("cid"))
      .select(col("vec_id"), col("cid"),
        floor(d2 * lit(1e6) + lit(0.5))
          .cast("long").as("d2f"))
      .pinCorpus
    val stats = dists.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("d2f")).as("sf"))
    dists.join(broadcast(stats), Seq("cid")) // nlist rows — always broadcast
      .select(col("vec_id"), col("cid"),
        (col("d2f").cast("double") / lit(1e6)).as("d2"),
        graft.Tables.fround(col("sf").cast("double") / lit(1e6) / col("n"), 6).as("cl_mean"),
        ((col("d2f").cast("double") / lit(1e6)) >
          lit(1.25) * (col("sf").cast("double") / lit(1e6) / col("n"))).as("is_outlier"))
      .orderBy(col("vec_id"))
  }

  /** x29 — ANN recall@k evaluation (E52): per-query recall of the IVF-probed
    * retrieval (x27's contract) against exact brute-force top-k over the full
    * corpus — the index-quality eval a vector pipeline runs before trusting
    * an approximate index, and re-runs as the corpus drifts. One row per
    * query: hit count and recall@3.
    *
    * 100 TB shape: the approx side IS x27 (corpus shuffled once by cluster
    * id, probes broadcast); the exact side is the x23 brute-force shape over
    * the query batch — the corpus never moves, the query set is broadcast,
    * and the bounded TopK Aggregator caps the exchange at k rows per query.
    * Brute force over the full corpus is the eval price, which is why the
    * queries are a bounded SAMPLE (retrievalQ) — the corpus-side scan is one
    * pass however many queries ride it. The hit join and recall arithmetic
    * touch two k·|Q|-row frames — driver-scale, not data-scale.
    *
    * Oracle-checked end-to-end: both sides' comparators (rounded sim DESC,
    * vec_id) are the shared x23/x27 constants, so the DuckDB twin reproduces
    * the identical approx and exact sets and the recall arithmetic. */
  val x29: Q = (s, d) => recallWith(s, d, Quantizers.trainedCents(s, d))

  /** x181 — Matryoshka truncation recall audit (E181): retrieval quality
    * of DIMENSION-TRUNCATED embeddings against full-dimension truth —
    * per tier m ∈ {8, 16, 32}, the exact top-3 under cosine over the
    * FIRST m coordinates is compared to the 64-dim exact top-3, one
    * (m, q_id, n_hit, recall) row each. This is the evaluation a
    * Matryoshka-representation deployment runs before serving truncated
    * vectors (Kusupati et al. 2022, "Matryoshka Representation
    * Learning": nested prefixes of one embedding trade dimension for
    * recall): the audit says which prefix tier clears the recall bar,
    * i.e. how many bytes/vector the 100 TB serving tier actually needs.
    *
    * Determinism: the x29/x23 comparator constants everywhere — sims
    * rounded HALF-UP to 4 before ranking, ties → lower vec_id, the
    * bounded TopK Aggregator = the twin's ROW_NUMBER (sim DESC, vec_id).
    * Truncated dots ride the codegen'd FloatDot over array slices (the
    * pq-subvector pattern), accumulated left-to-right like the twin's
    * list_slice + list_aggregate.
    *
    * 100 TB shape: ONE corpus scan crossed with the broadcast bounded
    * query sample (the x23/x29 brute-eval shape — brute force is the
    * eval price, which is why queries are a sample); all four tiers'
    * sims ride the same pass via ONE posexplode; the per-(tier, query)
    * top-k is a map-side-combined TopK aggregate, so the exchange is
    * 4·|Q|·k rows, never corpus-sized. */
  val x181: Q = (s, d) => {
    val tiers = Seq(8L, 16L, 32L)
    val all = tiers :+ 64L
    val bounds = all.map(_.toInt)
    import graft.functions.VectorExprs.floatPrefixDots
    // r20 (guide §2.3 / step-2 per-task work): the per-pair work used to be
    // 4 tiers × 3 sliced dots = 360 multiply-adds + 8 slice() copies per
    // (corpus, query) pair. Two hoists make it ONE 64-element prefix pass:
    //  - self-norms ss/qq depend on ONE side only — computed per corpus row
    //    (|N| times, was |N|·|Q|) and per query row (|Q| times) BEFORE the
    //    cross join;
    //  - the 4 tier cross-dots are prefixes of the SAME left-to-right
    //    accumulation, so FloatPrefixDots emits all 4 in one pass —
    //    bit-identical per tier to dot(slice(1..m)) (the m-prefix dot IS
    //    the accumulator after m terms; no reassociation).
    // The zero-norm guard (r19, ADVICE: an all-zero m-dim prefix would
    // yield 0/0 = NaN and rank meaninglessly; sim 0 is the right
    // degeneration) still applies post-explode on scalars. The twin is
    // value-identical: same left-to-right double dots, same ROUND-4,
    // division order unchanged.
    val e = graft.Tables.spread(t(s, d, "embeddings"))
      .select(col("vec_id"), col("embedding"),
        floatPrefixDots(col("embedding"), col("embedding"), bounds).as("ssArr"))
    val q = t(s, d, "embeddings").filter(col("vec_id") < retrievalQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        floatPrefixDots(col("embedding"), col("embedding"), bounds).as("qqArr"))
    val melted = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("ssArr"), col("qqArr"),
        posexplode(floatPrefixDots(col("embedding"), col("qe"), bounds)))
      .select(col("q_id"), col("vec_id"),
        element_at(typedLit(all.toArray), col("pos") + 1).as("m"),
        when(element_at(col("ssArr"), col("pos") + 1) > 0d &&
            element_at(col("qqArr"), col("pos") + 1) > 0d,
          round(col("col") / (sqrt(element_at(col("ssArr"), col("pos") + 1)) *
            sqrt(element_at(col("qqArr"), col("pos") + 1))), 4))
          .otherwise(lit(0.0)).as("sim"))
    val topk = udaf(new UdfQueries.TopK(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    // 4·|Q|·k rows; pinned because BOTH the truth side and the hits side
    // consume it — lazily each re-ran the whole cross-join + TopK subtree
    // (the r20 before-plan shows the duplicated ObjectHashAggregate trees).
    val tops = melted.groupBy(col("m"), col("q_id"))
      .agg(topk(col("sim"), col("vec_id")).as("top"))
      .select(col("m"), col("q_id"), explode(col("top._2")).as("vec_id"))
      .localCheckpoint(true)
    val truth = tops.filter(col("m") === 64L).select(col("q_id"), col("vec_id"))
    val hits = tops.filter(col("m") =!= 64L)
      .join(truth, Seq("q_id", "vec_id"))
      .groupBy(col("m"), col("q_id")).agg(count(lit(1)).as("n_hit"))
    q.select(col("q_id"), explode(typedLit(tiers.toArray)).as("m"))
      .join(hits, Seq("m", "q_id"), "left")
      .select(col("m"), col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / 3.0, 4).as("recall"))
      .orderBy(col("m"), col("q_id"))
  }

  private[graft] def recallWith(s: SparkSession, d: String,
      cents: Array[(Long, Array[Double])]): DataFrame = {
    val base = assignedCorpusWith(s, d, cents)
    val q = base.filter(col("vec_id") < retrievalQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qnrm"))
    val topk = udaf(new UdfQueries.TopK(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    val exact = base.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"),
        round(dot(col("embedding"), col("qe")) / (col("nrm") * col("qnrm")), 4).as("sim"),
        col("vec_id"))
      .groupBy(col("q_id"))
      .agg(topk(col("sim"), col("vec_id")).as("top"))
      .select(col("q_id"), explode(col("top._2")).as("vec_id"))
    val approx = retrievalWith(s, d, cents).select(col("q_id"), col("vec_id"))
    val hits = approx.join(exact, Seq("q_id", "vec_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    q.select(col("q_id"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / 3.0, 4).as("recall"))
      .orderBy(col("q_id"))
  }

  val queries: Map[String, Q] = Map(
    "q35_percentiles" -> q35,
    "q36_scalar_subquery" -> q36,
    "q37_in_subquery" -> q37,
    "x22_ann_ivf" -> x22,
    "x57_ivfpq_search" -> x57,
    "x80_indexed_ivfpq" -> x80,
    "x69_embed_outliers" -> x69,
    "x25_semantic_dedup" -> x25,
    "x26_knn_graph" -> x26,
    "x139_pagerank" -> x139,
    "x163_lpa_communities" -> x163,
    "x148_triangles" -> x148,
    "x155_kcore" -> x155,
    "x27_retrieval_join" -> x27,
    "x28_indexed_retrieval" -> x28,
    "x85_refine_search" -> x85,
    "x29_ann_recall" -> x29,
    "x181_matryoshka_recall" -> x181,
    "x64_approx_percentiles" -> x64,
    "x108_rank_quantiles" -> x108,
    "x120_mmr_rerank" -> ((s, d) => x120(s, d)),
    "x127_topk_refine" -> ((s, d) => x127(s, d)))

  /** x120 MMR constants: query batch, shortlist width, picks, trade-off. */
  private val mmrQ = 20
  private[graft] val mmrC = 12
  private[graft] val mmrK = 5

  /** x120 — MMR diversity re-rank (E119): maximal marginal relevance
    * (Carbonell & Goldstein 1998) over a retrieval shortlist — greedy
    * selection of k results maximizing λ·rel(c) − (1−λ)·max_{s∈selected}
    * sim(c, s), λ=½, the de-dup-at-serving-time step that keeps a
    * training-data retriever from returning k near-copies of the same
    * document. Two-phase by construction: the SHORTLIST is the x27
    * IVF-probed top-C (C=12, the proven bounded-TopK chain), and the
    * O(k·C) greedy with its C² pairwise sims runs per query group over
    * ≤C rows — `flatMapGroups` is exactly right here (bounded
    * per-group state, the mapPartitions-at-the-seam rule), never a
    * corpus-scale loop. Selection comparator: mmr DESC, vec_id ASC —
    * deterministic; rel and pair sims round to 4 dp first (the family's
    * cosine convention) so the greedy's comparisons are on
    * bit-identical values cross-engine.
    *
    * 100 TB shape: shortlist traffic is the x27 story (probe-pruned,
    * TopK-bounded exchanges of k rows/query); the MMR stage adds zero
    * shuffles beyond the C-row groupByKey and touches C·dim floats per
    * query. The twin re-runs the ENTIRE pipeline in SQL — training,
    * probes, shortlist, pairwise sims, and the greedy as K generated
    * selection stages (the bpeOracle K-stage pattern). */
  val x120: Q = (s, d) => {
    import s.implicits._
    val cents = Quantizers.trainedCents(s, d)
    val base = assignedCorpusWith(s, d, cents)
    val q = base.filter(col("vec_id") < mmrQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qnrm"))
    val probes = probesFor(q, cents)
    val topc = udaf(new UdfQueries.TopK(mmrC),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    val shortlist = base.join(broadcast(probes), Seq("cid"))
      .join(broadcast(q), Seq("q_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"),
        round(dot(col("embedding"), col("qe")) / (col("nrm") * col("qnrm")), 4).as("rel"),
        col("vec_id"))
      .groupBy(col("q_id")).agg(topc(col("rel"), col("vec_id")).as("top"))
      .select(col("q_id"), explode(col("top")).as("c"))
      .select(col("q_id"), col("c._2").as("vec_id"), col("c._1").as("rel"))
    val cand = shortlist
      .join(base.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("q_id"), col("vec_id"), col("rel"), col("embedding"))
      .as[(Long, Long, Double, Array[Float])]
    def rdot(a: Array[Float], b: Array[Float]): Double = {
      var s0 = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s0 += a(i).toDouble * b(i).toDouble; i += 1 }
      s0
    }
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    cand.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val cs = it.toArray.sortBy(c => (-c._3, c._2)) // rel desc, vec_id asc
      val nrm = cs.map(c => math.sqrt(rdot(c._4, c._4)))
      def pairSim(i: Int, j: Int): Double =
        round4(rdot(cs(i)._4, cs(j)._4) / (nrm(i) * nrm(j)))
      val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
      while (selected.length < math.min(mmrK, cs.length)) {
        var bestI = -1; var bestScore = Double.NegativeInfinity
        cs.indices.foreach { i =>
          if (!selected.contains(i)) {
            val score =
              if (selected.isEmpty) cs(i)._3
              else 0.5 * cs(i)._3 - 0.5 * selected.map(j => pairSim(i, j)).max
            // mmr DESC, vec_id ASC — cs is vec_id-ascending within equal
            // rel, so strict > keeps the first (smallest id) on ties only
            // when candidates are pre-sorted by the FULL comparator; order
            // explicitly instead:
            if (score > bestScore ||
                (score == bestScore && bestI >= 0 && cs(i)._2 < cs(bestI)._2)) {
              bestI = i; bestScore = score
            }
          }
        }
        selected += bestI
        out += ((qid, selected.length.toLong, cs(bestI)._2, bestScore))
      }
      out.iterator
    }.toDF("q_id", "rn", "vec_id", "mmr")
      .orderBy(col("q_id"), col("rn"))
  }

  /** x127 session cache geometry: serve k from a cached top-m ranking. */
  private val refineM = 24
  private val refineK = 8

  /** x127 — interactive top-k refinement with result reuse (E127): the
    * incremental-session pattern (PAPERS.md's EDBT 2020 setting) — an
    * analyst runs a top-k, then REFINES the predicate; the engine serves
    * the refined top-k from the cached unfiltered top-m WHEN PROVABLY
    * EXACT instead of re-scanning. The soundness guard is the classic
    * ranked-list argument: if ≥k of the cached top-m survive the filter
    * AND the k-th survivor outscores the m-th cached row STRICTLY, every
    * non-cached row (score ≤ m-th) is beaten under the full
    * (sim DESC, vec_id) comparator — the strict inequality closes the
    * tie loophole where an uncached equal-score row with a smaller id
    * would legitimately displace. Guard fails → full filtered recompute;
    * either path is bit-identical to the declarative answer, which is
    * exactly what the oracle checks (the twin is the direct filtered
    * top-k; [[refinedTopK]] exposes the decision for the spec).
    *
    * 100 TB shape: the cache is k·3 rows collected once per session
    * query (bounded, the seeds/probes convention); the reuse path costs
    * ZERO cluster work — the point of the paper — and the fallback is
    * the ordinary bounded top-k. The base ranking is a map-only literal-
    * embedded query sweep (no join in the plan, the x123 convention). */
  val x127: Q = (s, d) => refinedTopK(s, d)._1

  private[graft] def refinedTopK(s: SparkSession, d: String): (DataFrame, String) = {
    import s.implicits._
    val emb = t(s, d, "embeddings")
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0)
    val qnrm = math.sqrt(qv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    val qLit = array(qv.map(x => lit(x.toDouble)): _*)
    val scores = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"),
        round(graft.functions.VectorExprs.floatDoubleDot(col("embedding"), qLit) /
          (sqrt(dot(col("embedding"), col("embedding"))) * qnrm), 4).as("sim"))
    val cache = scores.orderBy(desc("sim"), col("vec_id")).limit(refineM).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val survivors = cache.filter(_._2 % 2 == 0)
    val reusable = survivors.length >= refineK &&
      survivors(refineK - 1)._3 > cache.last._3
    val result =
      if (reusable)
        survivors.take(refineK).zipWithIndex
          .map { case ((v, l, sim), i) => (i + 1L, v, l, sim) }.toSeq
          .toDF("rank", "vec_id", "label", "sim")
      else
        scores.filter(col("label") % 2 === 0)
          .orderBy(desc("sim"), col("vec_id")).limit(refineK)
          .withColumn("rank", row_number().over(
            Window.orderBy(desc("sim"), col("vec_id"))).cast("long"))
          .select(col("rank"), col("vec_id"), col("label"), col("sim"))
    (result.orderBy(col("rank")), if (reusable) "cache" else "full")
  }

  private def dotSql(a: String, b: String): String =
    s"list_aggregate(list_transform(list_zip($a, $b), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')"

  private def cosPairSql: String =
    s"${dotSql("a.embedding", "b.embedding")} / (sqrt(${dotSql("a.embedding", "a.embedding")}) * sqrt(${dotSql("b.embedding", "b.embedding")}))"

  /** GENERATED assignment CTE shared by the family twins: the ENTIRE
    * spherical-k-means training chain ([[Quantizers.kmTrainCtes]] — the twin
    * re-trains the centroids in SQL, nothing interpolated), then assignment
    * argmax (struct-max = max score, tie → max cid) as
    * ROW_NUMBER ... ORDER BY sc DESC, cid DESC against the trained cents. */
  private def assignedCte: String =
    s"""WITH ${Quantizers.kmTrainCtes},
       |cents AS (SELECT cid, cemb FROM kcents${Quantizers.kmRounds}),
       |scored AS (
       |  SELECT e.vec_id, e.embedding, c.cid, ${dotSql("e.embedding", "c.cemb")} AS sc
       |  FROM embeddings e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT vec_id, embedding, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sc DESC, cid DESC) AS rn
       |    FROM scored) WHERE rn = 1)""".stripMargin

  /** GENERATED x22 oracle: probe ranking mirrors the Spark orderBy exactly. */
  private def ivfOracle: String =
    s"""$assignedCte,
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cid FROM cents c, q
       |  ORDER BY ${dotSql("q.qe", "c.cemb")} DESC, c.cid LIMIT $nprobe)
       |SELECT a.vec_id, ROUND(${dotSql("a.embedding", "q.qe")}, 4) AS sim
       |FROM assigned a JOIN probe p ON a.cid = p.cid CROSS JOIN q
       |ORDER BY sim DESC, a.vec_id LIMIT 10""".stripMargin

  /** GENERATED x25 oracle: identical centroids/assignment/threshold, drop
    * policy "higher vec_id of a within-cluster near-dup pair". */
  private def semDedupOracle: String =
    s"""$assignedCte,
       |nd AS (
       |  SELECT DISTINCT b.vec_id AS b_id
       |  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE ROUND($cosPairSql, 4) > $semTau)
       |SELECT a.vec_id, a.cid,
       |  CASE WHEN nd.b_id IS NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS keep
       |FROM assigned a LEFT JOIN nd ON a.vec_id = nd.b_id
       |ORDER BY a.vec_id""".stripMargin

  /** GENERATED x26 oracle: ROW_NUMBER over (rounded sim DESC, nbr_id) — the
    * TopK Aggregator's exact comparator. */
  /** The kNN-graph CTE chain (training + assignment + within-cluster
    * top-3), shared by the x26 twin and x139's PageRank twin. */
  private def knnCtes: String =
    s"""$assignedCte,
       |sims AS (
       |  SELECT a.vec_id, b.vec_id AS nbr_id, ROUND($cosPairSql, 4) AS sim
       |  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT vec_id, nbr_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id) AS rn
       |  FROM sims)""".stripMargin

  private def knnGraphOracle: String =
    s"""$knnCtes
       |SELECT vec_id, CAST(rn AS BIGINT) AS rn, nbr_id, sim FROM ranked
       |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin

  /** GENERATED x139 twin: the full kNN chain + `prIters` UNROLLED
    * iteration CTEs replaying the identical integer arithmetic.
    * MATERIALIZED on edges/outd and every round (the x163/x155 twin
    * convention): each pr round references edges + its predecessor, so
    * inlining would nest ~2^rounds copies of the kNN training chain —
    * the sf1 run of the un-hinted form spilled >77 GB of DuckDB temp
    * (the twin-side mirror of the recompute x139's Spark plan cuts with
    * localCheckpoint). */
  private def pageRankOracle: String = {
    val its = (1 to prIters).map { i =>
      s"""pr$i AS MATERIALIZED (
         |  SELECT n.id, CAST(150000 + (85 * COALESCE(SUM(x.c), 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, p.pr // o.od AS c
         |    FROM edges e JOIN outd o ON o.src = e.src
         |    JOIN pr${i - 1} p ON p.id = e.src) x ON x.dst = n.id
         |  GROUP BY n.id)""".stripMargin
    }.mkString(",\n")
    s"""$knnCtes,
       |edges AS MATERIALIZED (SELECT vec_id AS src, nbr_id AS dst FROM ranked WHERE rn <= 3),
       |outd AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY 1),
       |nodes AS (SELECT vec_id AS id FROM embeddings),
       |pr0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |$its,
       |top AS (SELECT id, pr, ROW_NUMBER() OVER (ORDER BY pr DESC, id) AS rank
       |        FROM pr$prIters)
       |SELECT CAST(rank AS BIGINT) AS rank, id AS vec_id, pr
       |FROM top WHERE rank <= 20 ORDER BY rank""".stripMargin
  }

  /** GENERATED x163 twin: the kNN chain + `lpaRounds` UNROLLED synchronous
    * label-propagation CTEs — majority label via ROW_NUMBER (cnt DESC,
    * lbl), the mirror of the Spark struct-max; isolated nodes keep their
    * own label through the same LEFT JOIN + COALESCE. */
  private def lpaOracle: String = {
    val rounds = (1 to lpaRounds).map { r =>
      s"""lc$r AS (
         |  SELECT n.node, p.lbl, COUNT(*) AS cnt
         |  FROM lnbr n JOIN l${r - 1} p ON p.id = n.nb GROUP BY 1, 2),
         |lp$r AS (
         |  SELECT node, lbl,
         |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
         |  FROM lc$r),
         |l$r AS MATERIALIZED (
         |  SELECT nd.id, COALESCE(p.lbl, nd.id) AS lbl
         |  FROM lnodes nd LEFT JOIN (SELECT node, lbl FROM lp$r WHERE rn = 1) p
         |    ON p.node = nd.id)""".stripMargin
    }.mkString(",\n")
    s"""$knnCtes,
       |lund AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(vec_id, nbr_id) AS u, GREATEST(vec_id, nbr_id) AS v
       |  FROM ranked WHERE rn <= 3),
       |lnbr AS MATERIALIZED (
       |  SELECT u AS node, v AS nb FROM lund
       |  UNION ALL SELECT v AS node, u AS nb FROM lund),
       |lnodes AS (SELECT vec_id AS id FROM embeddings),
       |l0 AS (SELECT id, id AS lbl FROM lnodes),
       |$rounds,
       |mv AS (
       |  SELECT COUNT(*) AS n FROM l$lpaRounds cur
       |  JOIN l${lpaRounds - 1} prev ON prev.id = cur.id
       |  WHERE cur.lbl <> prev.lbl),
       |ltop AS (
       |  SELECT lbl AS community, COUNT(*) AS n_members,
       |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, lbl) AS rank
       |  FROM l$lpaRounds GROUP BY lbl)
       |SELECT CAST(rank AS BIGINT) AS rank, community, n_members,
       |  CAST(mv.n AS BIGINT) AS last_round_moves
       |FROM ltop, mv WHERE rank <= 20 ORDER BY rank""".stripMargin
  }

  /** GENERATED x148 twin: the kNN chain + identical undirected-pair /
    * two-join triangle enumeration and corner counting. MATERIALIZED on
    * und (referenced three times by the triangle join + twice by deg —
    * inlining replays the kNN training chain five times; the un-hinted
    * form spilled >77 GB at sf1, same class as the x139 twin). */
  private def trianglesOracle: String =
    s"""$knnCtes,
       |und AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(vec_id, nbr_id) AS u, GREATEST(vec_id, nbr_id) AS v
       |  FROM ranked WHERE rn <= 3),
       |deg AS (
       |  SELECT node, COUNT(*) AS degree FROM (
       |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
       |  GROUP BY 1),
       |tri AS (
       |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM und e1 JOIN und e2 ON e2.u = e1.v
       |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
       |tc AS (
       |  SELECT node, COUNT(*) AS n_tri FROM (
       |    SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
       |    UNION ALL SELECT c AS node FROM tri)
       |  GROUP BY 1)
       |SELECT em.vec_id,
       |  CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree,
       |  CAST(COALESCE(tc.n_tri, 0) AS BIGINT) AS n_tri,
       |  CASE WHEN COALESCE(deg.degree, 0) < 2 THEN NULL
       |    ELSE floor(2.0 * CAST(COALESCE(tc.n_tri, 0) AS DOUBLE) /
       |      (CAST(deg.degree AS DOUBLE) * (CAST(deg.degree AS DOUBLE) - 1.0))
       |      * 1000000.0 + 0.5) / 1000000.0 END AS clustering
       |FROM embeddings em
       |LEFT JOIN deg ON deg.node = em.vec_id
       |LEFT JOIN tc ON tc.node = em.vec_id
       |ORDER BY em.vec_id""".stripMargin

  /** GENERATED x155 twin: the kNN chain + `coreRounds` UNROLLED peel
    * CTEs — per round a degree count, a keep set, this round's
    * casualties (k_{i-1} \ k_i), and the filtered edge set: the
    * identical integer recursion. */
  private def kCoreOracle: String = {
    // MATERIALIZED: each round references its predecessor five times —
    // inlining would nest 5^rounds copies of the kNN chain (the same
    // blowup the Spark side cuts with localCheckpoint).
    val rounds = (1 to coreRounds).map { i =>
      val dCte = if (i == 1) "" else
        s"""d$i AS MATERIALIZED (
           |  SELECT node, COUNT(*) AS dg FROM (
           |    SELECT u AS node FROM e${i - 1} UNION ALL SELECT v AS node FROM e${i - 1})
           |  GROUP BY 1),
           |""".stripMargin
      s"""${dCte}k$i AS MATERIALIZED (SELECT node FROM d$i WHERE dg >= $coreK),
         |p$i AS MATERIALIZED (
         |  SELECT node, CAST($i AS BIGINT) AS layer FROM k${i - 1}
         |  WHERE node NOT IN (SELECT node FROM k$i)),
         |e$i AS MATERIALIZED (
         |  SELECT e.u, e.v FROM e${i - 1} e
         |  JOIN k$i a ON a.node = e.u JOIN k$i b ON b.node = e.v)""".stripMargin
    }.mkString(",\n")
    val layerUnion = (1 to coreRounds).map(i => s"SELECT * FROM p$i").mkString(" UNION ALL ")
    s"""$knnCtes,
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(vec_id, nbr_id) AS u, GREATEST(vec_id, nbr_id) AS v
       |  FROM ranked WHERE rn <= 3),
       |d1 AS MATERIALIZED (
       |  SELECT node, COUNT(*) AS dg FROM (
       |    SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0)
       |  GROUP BY 1),
       |k0 AS MATERIALIZED (SELECT node FROM d1),
       |$rounds,
       |layers AS ($layerUnion)
       |SELECT d1.node AS vec_id, COALESCE(l.layer, 0) AS layer,
       |  d1.dg AS init_degree
       |FROM d1 LEFT JOIN layers l ON l.node = d1.node
       |ORDER BY vec_id""".stripMargin
  }

  /** GENERATED x27 oracle: per-query probe ranking (sc DESC, cid — the
    * Spark window's exact comparator) + probed-candidate join +
    * ROW_NUMBER over the TopK comparator. */
  private def retrievalOracle: String = {
    val cosQ =
      s"${dotSql("a.embedding", "q.qe")} / (sqrt(${dotSql("a.embedding", "a.embedding")}) * sqrt(${dotSql("q.qe", "q.qe")}))"
    s"""$assignedCte,
       |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < $retrievalQ),
       |probes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT q.q_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |        ORDER BY ${dotSql("q.qe", "c.cemb")} DESC, c.cid) AS pr
       |    FROM q CROSS JOIN cents c) WHERE pr <= $nprobe),
       |sims AS (
       |  SELECT p.q_id, a.vec_id, ROUND($cosQ, 4) AS sim
       |  FROM assigned a JOIN probes p ON a.cid = p.cid JOIN q ON q.q_id = p.q_id
       |  WHERE a.vec_id <> p.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
       |  FROM sims)
       |SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, sim FROM ranked
       |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin
  }

  /** GENERATED x120 oracle: the retrievalOracle shortlist chain widened to
    * C, candidate-pair cosines, then the greedy as K generated selection
    * stages (the bpeOracle K-stage pattern) — each stage ranks the
    * remaining candidates by 0.5·rel − 0.5·max-sim-to-selected with the
    * identical (mmr DESC, vec_id) comparator and appends its pick to the
    * accumulated selection. */
  private def mmrOracle: String = {
    val cosQ =
      s"${dotSql("a.embedding", "q.qe")} / (sqrt(${dotSql("a.embedding", "a.embedding")}) * sqrt(${dotSql("q.qe", "q.qe")}))"
    val stages = (2 to mmrK).map { k =>
      s"""sel$k AS (SELECT q_id, vec_id, mmr FROM (
         |    SELECT c.q_id, c.vec_id, 0.5 * c.rel - 0.5 * m.ms AS mmr,
         |      ROW_NUMBER() OVER (PARTITION BY c.q_id
         |        ORDER BY 0.5 * c.rel - 0.5 * m.ms DESC, c.vec_id) AS rn
         |    FROM cand c
         |    JOIN (SELECT p.q_id, p.ai AS vec_id, MAX(p.sim) AS ms
         |          FROM pp p JOIN selacc${k - 1} s
         |            ON s.q_id = p.q_id AND s.vec_id = p.bi
         |          GROUP BY 1, 2) m
         |      ON m.q_id = c.q_id AND m.vec_id = c.vec_id
         |    WHERE NOT EXISTS (SELECT 1 FROM selacc${k - 1} s2
         |                      WHERE s2.q_id = c.q_id AND s2.vec_id = c.vec_id)
         |  ) WHERE rn = 1),
         |selacc$k AS (SELECT q_id, vec_id FROM selacc${k - 1}
         |             UNION ALL SELECT q_id, vec_id FROM sel$k)""".stripMargin
    }.mkString(",\n")
    val fin = (1 to mmrK)
      .map(k => s"SELECT q_id, $k AS rn, vec_id, mmr FROM sel$k")
      .mkString("\n UNION ALL ")
    s"""$assignedCte,
       |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < $mmrQ),
       |probes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT q.q_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |        ORDER BY ${dotSql("q.qe", "c.cemb")} DESC, c.cid) AS pr
       |    FROM q CROSS JOIN cents c) WHERE pr <= $nprobe),
       |sims AS (
       |  SELECT p.q_id, a.vec_id, ROUND($cosQ, 4) AS rel
       |  FROM assigned a JOIN probes p ON a.cid = p.cid JOIN q ON q.q_id = p.q_id
       |  WHERE a.vec_id <> p.q_id),
       |cand AS (SELECT q_id, vec_id, rel FROM (
       |  SELECT q_id, vec_id, rel,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rn
       |  FROM sims) WHERE rn <= $mmrC),
       |ce AS (SELECT c.q_id, c.vec_id, e.embedding
       |       FROM cand c JOIN embeddings e USING (vec_id)),
       |pp AS (SELECT a.q_id, a.vec_id AS ai, b.vec_id AS bi, ROUND($cosPairSql, 4) AS sim
       |       FROM ce a JOIN ce b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
       |sel1 AS (SELECT q_id, vec_id, rel AS mmr FROM (
       |  SELECT q_id, vec_id, rel,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rn
       |  FROM cand) WHERE rn = 1),
       |selacc1 AS (SELECT q_id, vec_id FROM sel1),
       |$stages
       |SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, mmr FROM (
       | $fin
       |) ORDER BY q_id, rn""".stripMargin
      // MATERIALIZED (the x67/bpeOracle lesson): each greedy stage
      // references cand and pp, and DuckDB inlines CTEs by default — five
      // stages of re-inlining the whole retrain+shortlist chain is
      // exponential. Pinning the two shared frames cuts the graph.
      .pipe(raw => Seq("cand", "pp")
        .foldLeft(raw)((sql, cte) => sql.replace(s"$cte AS (", s"$cte AS MATERIALIZED (")))
  }

  /** GENERATED x29 oracle: the retrievalOracle CTE chain (approx set) plus
    * a brute-force CTE ranked by the SAME comparator, intersected per query.
    * COALESCE covers a query whose approx top-3 misses the exact set
    * entirely (n_hit=0 must still emit a row). */
  /** GENERATED x181 twin: identical truncated-cosine grid (list_slice is
    * the twin of Spark's slice; the dot accumulates left-to-right like
    * FloatDot), identical ROUND-4-then-rank comparator, identical
    * tier × query grid with zero-hit LEFT JOIN. */
  private def matryoshkaOracle: String = {
    def sliceDot(a: String, b: String) =
      dotSql(s"list_slice($a, 1, t.m)", s"list_slice($b, 1, t.m)")
    val cos = s"CASE WHEN ${sliceDot("e.embedding", "e.embedding")} > 0 " +
      s"AND ${sliceDot("q.qe", "q.qe")} > 0 THEN ROUND(${sliceDot("e.embedding", "q.qe")} / " +
      s"(sqrt(${sliceDot("e.embedding", "e.embedding")}) * sqrt(${sliceDot("q.qe", "q.qe")})), 4) " +
      s"ELSE 0.0 END"
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < $retrievalQ),
       |tiers AS (SELECT unnest([8, 16, 32, 64]) AS m),
       |sims AS (
       |  SELECT t.m, q.q_id, e.vec_id, $cos AS sim
       |  FROM embeddings e CROSS JOIN q CROSS JOIN tiers t
       |  WHERE e.vec_id <> q.q_id),
       |tops AS (
       |  SELECT m, q_id, vec_id FROM (
       |    SELECT m, q_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY m, q_id ORDER BY sim DESC, vec_id) AS rn
       |    FROM sims) WHERE rn <= 3),
       |truth AS (SELECT q_id, vec_id FROM tops WHERE m = 64),
       |hits AS (
       |  SELECT t.m, t.q_id, COUNT(*) AS n_hit
       |  FROM tops t JOIN truth u ON t.q_id = u.q_id AND t.vec_id = u.vec_id
       |  WHERE t.m <> 64 GROUP BY t.m, t.q_id)
       |SELECT CAST(g.m AS BIGINT) AS m, q.q_id AS q_id,
       |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       |  ROUND(COALESCE(h.n_hit, 0) / 3.0, 4) AS recall
       |FROM q CROSS JOIN (SELECT unnest([8, 16, 32]) AS m) g
       |LEFT JOIN hits h ON h.m = g.m AND h.q_id = q.q_id
       |ORDER BY m, q.q_id""".stripMargin
  }

  private def recallOracle: String = {
    val cosQ =
      s"${dotSql("a.embedding", "q.qe")} / (sqrt(${dotSql("a.embedding", "a.embedding")}) * sqrt(${dotSql("q.qe", "q.qe")}))"
    val cosE =
      s"${dotSql("e.embedding", "q.qe")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * sqrt(${dotSql("q.qe", "q.qe")}))"
    s"""$assignedCte,
       |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < $retrievalQ),
       |probes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT q.q_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |        ORDER BY ${dotSql("q.qe", "c.cemb")} DESC, c.cid) AS pr
       |    FROM q CROSS JOIN cents c) WHERE pr <= $nprobe),
       |asims AS (
       |  SELECT p.q_id, a.vec_id, ROUND($cosQ, 4) AS sim
       |  FROM assigned a JOIN probes p ON a.cid = p.cid JOIN q ON q.q_id = p.q_id
       |  WHERE a.vec_id <> p.q_id),
       |approx AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
       |    FROM asims) WHERE rn <= 3),
       |bsims AS (
       |  SELECT q.q_id, e.vec_id, ROUND($cosE, 4) AS sim
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
       |    FROM bsims) WHERE rn <= 3),
       |hits AS (
       |  SELECT a.q_id, COUNT(*) AS n_hit
       |  FROM approx a JOIN exact e ON a.q_id = e.q_id AND a.vec_id = e.vec_id
       |  GROUP BY a.q_id)
       |SELECT q.q_id, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       |  ROUND(COALESCE(h.n_hit, 0) / 3.0, 4) AS recall
       |FROM q LEFT JOIN hits h ON q.q_id = h.q_id ORDER BY q.q_id""".stripMargin
  }

  /** GENERATED x85 oracle: the ENTIRE two-stage refine pipeline re-run in
    * SQL from the same constants — PQ codebook training chain + code
    * assignment (pqCte), k-means assignment/probe chain (assignedCte,
    * retrievalOracle's probe comparator), the per-query INNER-PRODUCT LUT
    * (pqDotSql — the proven list_aggregate accumulation, matching the
    * driver-side pqDotLut foldLeft), the shortlist comparator
    * (approx-cos DESC, vec_id — TopK's ordering) with the same
    * fixed-left-assoc 8-term LUT sum as Spark's reduce(_+_), and the exact
    * cosine re-rank (x27's expressions). Nothing interpolated except the
    * shared integer constants, so the hash gate checks every stage. */
  private def refineOracle: String = {
    val pqDims = VectorQueries.pqDims
    val qsv = s"list_slice(q.qe, cb.sub*$pqDims+1, cb.sub*$pqDims+$pqDims)"
    val lutJoins = (0 until VectorQueries.pqM).map(i =>
      s"JOIN lutd l$i ON l$i.q_id = pr.q_id AND l$i.sub = $i AND l$i.code = p.c$i")
      .mkString("\n      ")
    val asum = (0 until VectorQueries.pqM).map(i => s"l$i.v").mkString(" + ")
    val cosQ =
      s"${dotSql("e.embedding", "q.qe")} / (sqrt(${dotSql("e.embedding", "e.embedding")}) * sqrt(${dotSql("q.qe", "q.qe")}))"
    val raw = s"""${VectorQueries.pqCte},
       |${assignedCte.stripPrefix("WITH ")},
       |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < $retrievalQ),
       |probes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT q.q_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |        ORDER BY ${dotSql("q.qe", "c.cemb")} DESC, c.cid) AS pr
       |    FROM q CROSS JOIN cents c) WHERE pr <= $nprobe),
       |lutd AS (
       |  SELECT q.q_id, cb.sub, cb.code, ${VectorQueries.pqDotSql(qsv, "cb.cvec")} AS v
       |  FROM cb CROSS JOIN q),
       |cnrm AS (SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
       |short AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT pr.q_id, p.vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY pr.q_id
       |        ORDER BY ($asum) / n.nrm DESC, p.vec_id) AS srn
       |    FROM pq p
       |      JOIN assigned a ON a.vec_id = p.vec_id
       |      JOIN probes pr ON a.cid = pr.cid
       |      JOIN cnrm n ON n.vec_id = p.vec_id
       |      $lutJoins
       |    WHERE p.vec_id <> pr.q_id) WHERE srn <= $refineShort),
       |rerank AS (
       |  SELECT s.q_id, s.vec_id, ROUND($cosQ, 4) AS sim
       |  FROM short s JOIN embeddings e ON e.vec_id = s.vec_id JOIN q ON q.q_id = s.q_id)
       |SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, sim FROM (
       |  SELECT q_id, vec_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
       |  FROM rerank) WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin
    // MATERIALIZED: DuckDB inlines CTEs by default, so each of the 8 lutd
    // joins would re-evaluate lutd — and through it the ENTIRE PQ training
    // chain — multiplying the twin's cost ~100× (measured: >60 s → 1.1 s at
    // sf0.001). Values are unchanged; this is a DuckDB-only evaluation hint.
    Seq("cb", "pq", "assigned", "q", "probes", "lutd", "cnrm")
      .foldLeft(raw)((sql, cte) => sql.replace(s"$cte AS (", s"$cte AS MATERIALIZED ("))
  }

  /** GENERATED x57 oracle: the proven x55 code chain + x22 assignment/probe
    * chain + x56 LUT, with the ADC ranking restricted to assigned∩probed. */
  private def ivfPqOracle: String =
    s"""${VectorQueries.pqCte},
       |${assignedCte.stripPrefix("WITH ")},
       |${VectorQueries.pqQLutCtes},
       |probe AS (
       |  SELECT c.cid FROM cents c, q
       |  ORDER BY ${dotSql("q.qe", "c.cemb")} DESC, c.cid LIMIT $nprobe)
       |${VectorQueries.pqAdcTailSql(
            "pq p JOIN assigned a ON a.vec_id = p.vec_id JOIN probe pr ON a.cid = pr.cid")}""".stripMargin

  /** GENERATED x69 twin: assignment via the shared CTE, the identical
    * ⟨x,x⟩−2⟨x,c⟩+‖c‖² expansion (dotSql is the proven accumulation), and
    * the same fix-point cluster stats. */
  private def outlierOracle: String = {
    val d2 = s"${dotSql("a.embedding", "a.embedding")} - 2.0 * ${dotSql("a.embedding", "c.cemb")} + ${dotSql("c.cemb", "c.cemb")}"
    s"""$assignedCte,
       |dd AS (
       |  SELECT a.vec_id, a.cid,
       |    CAST(floor(($d2) * 1000000.0 + 0.5) AS BIGINT) AS d2f
       |  FROM assigned a JOIN cents c ON a.cid = c.cid),
       |st AS (SELECT cid, COUNT(*) AS n, CAST(SUM(d2f) AS BIGINT) AS sf FROM dd GROUP BY cid)
       |SELECT dd.vec_id, dd.cid,
       |  CAST(dd.d2f AS DOUBLE) / 1000000.0 AS d2,
       |  floor(CAST(st.sf AS DOUBLE) / 1000000.0 / st.n * 1000000 + 0.5) / 1000000 AS cl_mean,
       |  (CAST(dd.d2f AS DOUBLE) / 1000000.0) > (1.25 * (CAST(st.sf AS DOUBLE) / 1000000.0 / st.n)) AS is_outlier
       |FROM dd JOIN st ON dd.cid = st.cid ORDER BY dd.vec_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // GENERATED x64 twin: identical bottom-k-by-h60(event_id) sample
    // membership (window rank replays the Aggregator's sorted-set
    // semantics), identical ⌈q·m⌉ order-statistic picks — full hash-match
    // for a quantile SKETCH because the sample is a deterministic set.
    "x64_approx_percentiles" ->
      s"""WITH e AS (
         |  SELECT event_type, event_id, value,
         |    ${graft.Tables.h60Sql("CAST(event_id AS VARCHAR)")} AS h
         |  FROM events),
         |s AS (
         |  SELECT event_type, event_id, value,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rh
         |  FROM e),
         |kk AS (SELECT event_type, event_id, value FROM s WHERE rh <= $bkK),
         |r AS (
         |  SELECT event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rv,
         |    COUNT(*) OVER (PARTITION BY event_type) AS m
         |  FROM kk),
         |n AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1)
         |SELECT n.event_type, n.n,
         |  MAX(CASE WHEN r.rv = GREATEST(1, CAST(CEIL(0.5 * r.m) AS BIGINT))
         |      THEN r.value END) AS p50,
         |  MAX(CASE WHEN r.rv = GREATEST(1, CAST(CEIL(0.9 * r.m) AS BIGINT))
         |      THEN r.value END) AS p90
         |FROM r JOIN n USING (event_type)
         |GROUP BY n.event_type, n.n
         |ORDER BY n.event_type""".stripMargin,
    "x22_ann_ivf" -> ivfOracle,
    "x57_ivfpq_search" -> ivfPqOracle,
    "x80_indexed_ivfpq" -> ivfPqOracle, // identical contract: index == fresh
    "x69_embed_outliers" -> outlierOracle,
    "x25_semantic_dedup" -> semDedupOracle,
    "x26_knn_graph" -> knnGraphOracle,
    "x139_pagerank" -> pageRankOracle,
    "x163_lpa_communities" -> lpaOracle,
    "x148_triangles" -> trianglesOracle,
    "x155_kcore" -> kCoreOracle,
    "x120_mmr_rerank" -> mmrOracle,
    "x127_topk_refine" -> {
      val cosE = "list_aggregate(list_transform(list_zip(e.embedding, q.qe), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum') / (sqrt(list_aggregate(list_transform(list_zip(e.embedding, e.embedding), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')) * sqrt(list_aggregate(list_transform(list_zip(q.qe, q.qe), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')))"
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |sc AS (
         |  SELECT e.vec_id, e.label, ROUND($cosE, 4) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
         |ranked AS (
         |  SELECT vec_id, label, sim,
         |    ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rank
         |  FROM sc WHERE label % 2 = 0)
         |SELECT CAST(rank AS BIGINT) AS rank, vec_id, label, sim
         |FROM ranked WHERE rank <= 8 ORDER BY rank""".stripMargin
    },
    "x27_retrieval_join" -> retrievalOracle,
    // x28 serves the SAME contract from the persisted index — one oracle
    "x28_indexed_retrieval" -> retrievalOracle,
    "x85_refine_search" -> refineOracle,
    "x29_ann_recall" -> recallOracle,
    "x181_matryoshka_recall" -> matryoshkaOracle,
    "x108_rank_quantiles" ->
      """WITH w AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                      CAST(0.75 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS q)
        |SELECT event_type, q, value AS qv, n
        |FROM w, qs WHERE rn - 1 = floor((n - 1) * q)
        |ORDER BY event_type, q""".stripMargin,
    "q35_percentiles" ->
      """WITH g AS (
        |  SELECT event_type, list_sort(list(value)) AS vals, COUNT(*) AS n
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  vals[CAST(greatest(1, ceil(n * 0.5)) AS INT)] AS p50,
        |  vals[CAST(greatest(1, ceil(n * 0.9)) AS INT)] AS p90
        |FROM g ORDER BY event_type""".stripMargin,
    "q36_scalar_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority HAVING COUNT(*) > 10
        |ORDER BY o_orderpriority""".stripMargin,
    "q37_in_subquery" ->
      """SELECT
        |  (SELECT COUNT(*) FROM customer
        |   WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)) AS n_big,
        |  (SELECT COUNT(*) FROM customer
        |   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS n_none""".stripMargin)
}
