package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.VectorQueries.dot

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

  /** x64 — the 100 TB percentile path q35's docstring points at:
    * approx_percentile (Greenwald-Khanna quantile summary — mergeable, fixed
    * memory per group regardless of group size, so the skewed group that
    * would OOM q35's collect_list costs the same as any other). Rows-only
    * (summary estimates aren't hash-stable across engines); AdvancedSpec
    * bounds the rank error vs the exact q35 answer at the sketch's declared
    * accuracy. */
  val x64: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.9)), lit(10000)).as("ps"))
      .select(col("event_type"), col("n"),
        element_at(col("ps"), 1).as("p50"),
        element_at(col("ps"), 2).as("p90"))
      .orderBy(col("event_type"))

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
    * LSH): a coarse quantizer of nlist deterministic seed centroids buckets
    * the corpus (one shuffle by centroid id at build time); a query probes
    * only the nprobe nearest buckets. At 100 TB the inverted lists are
    * hash-partitioned by centroid id, so a probe touches nprobe/nlist of
    * the data. Oracle-checked despite being approximate: centroid choice
    * (vec_id < nlist), assignment argmax, and probe ranking are all
    * deterministic, so the DuckDB twin reproduces the identical bucketing
    * and the full ANN output hash-matches. Recall vs q29 asserted in the
    * spec. */
  private val nlist = 16
  private val nprobe = 6

  val x22: Q = (s, d) => {
    val e = t(s, d, "embeddings")
    // deterministic coarse quantizer: the nlist lowest vec_ids (collecting
    // nlist*dim floats to the driver is the standard IVF build step)
    val cents = e.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def centCol(c: Seq[Float]) = array(c.map(lit): _*)
    // nearest-centroid assignment: array_max over (score, cid) structs —
    // lexicographic struct ordering IS the argmax, with a linear expression
    // tree (a when().otherwise() reduce duplicates the accumulated subtree
    // each step: 2^16 copies for 16 centroids)
    def assign(emb: org.apache.spark.sql.Column) =
      array_max(array(cents.map { case (cid, c) =>
        struct(dot(emb, centCol(c)).as("sc"), lit(cid).as("cid"))
      }: _*)).getField("cid")
    val corpus = e.select(col("vec_id"), col("embedding"), assign(col("embedding")).as("cid"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    // probe set: nprobe centroids nearest to the query vector
    val probeCids = q.select(
      array(cents.map { case (cid, c) =>
        struct(dot(col("qe"), centCol(c)).as("sc"), lit(cid).as("cid"))
      }: _*).as("all"))
      .select(explode(col("all")).as("s"))
      .orderBy(desc("s.sc"), col("s.cid")).limit(nprobe) // cid tie-break: deterministic probe set
      .select(col("s.cid").as("cid"))
    corpus.join(broadcast(probeCids), "cid") // bucket-pruned candidates
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(dot(col("embedding"), col("qe")), 4).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(10)
  }

  val queries: Map[String, Q] = Map(
    "q35_percentiles" -> q35,
    "q36_scalar_subquery" -> q36,
    "q37_in_subquery" -> q37,
    "x22_ann_ivf" -> x22,
    "x64_approx_percentiles" -> x64)

  /** GENERATED x22 oracle: same nlist/nprobe constants; assignment argmax
    * (struct-max = max score, tie → max cid) becomes ROW_NUMBER ... ORDER BY
    * sc DESC, cid DESC; probe ranking mirrors the Spark orderBy exactly. */
  private def ivfOracle: String = {
    def dotSql(a: String, b: String): String =
      s"list_aggregate(list_transform(list_zip($a, $b), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')"
    s"""WITH cents AS (
       |  SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < $nlist),
       |scored AS (
       |  SELECT e.vec_id, e.embedding, c.cid, ${dotSql("e.embedding", "c.cemb")} AS sc
       |  FROM embeddings e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT vec_id, embedding, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sc DESC, cid DESC) AS rn
       |    FROM scored) WHERE rn = 1),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cid FROM cents c, q
       |  ORDER BY ${dotSql("q.qe", "c.cemb")} DESC, c.cid LIMIT $nprobe)
       |SELECT a.vec_id, ROUND(${dotSql("a.embedding", "q.qe")}, 4) AS sim
       |FROM assigned a JOIN probe p ON a.cid = p.cid CROSS JOIN q
       |ORDER BY sim DESC, a.vec_id LIMIT 10""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "x22_ann_ivf" -> ivfOracle,
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
