package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables.t

/** SURVEY §2.2 E29 (UDF / UDAF / UDTF surface) + E30 (approx distinct).
  *
  * Demonstrates each extension mechanism in preference order (guide:
  * functions > native Expression > UDF):
  *  - x60: a scalar Scala UDF (vowel counting) — a real UDF on purpose, to
  *    exercise registration + null handling; the DuckDB twin re-expresses it
  *    with regexp_replace, so even the UDF path is oracle-checked.
  *  - x61: a typed Aggregator UDAF (bounded top-k per group) — the 100 TB
  *    pattern for "top-k per key" when k is small: per-partition bounded
  *    buffers merge associatively, so only k rows per group cross the
  *    shuffle (vs a full window sort). Oracle: the equivalent ROW_NUMBER
  *    window query.
  *  - x62: a UDTF via typed flatMap (bigram expansion) — the Dataset-native
  *    generator form.
  *  - x63: approx_count_distinct (HLL++) vs exact — not oracle-hashable
  *    (sketch values are engine-specific); the spec asserts the relative
  *    error bound instead.
  */
object UdfQueries {
  import CoreQueries.Q

  /** x60 — scalar Scala UDF, oracle-checked via a SQL re-expression. */
  val x60: Q = (s, d) => {
    val vowels = udf((text: String) =>
      if (text == null) 0L else text.count("aeiou".contains(_)).toLong)
    t(s, d, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"), sum(vowels(col("text"))).as("n_vowels"))
      .orderBy(col("lang"))
  }

  /** Bounded top-k aggregator: keeps at most k (price, orderkey) pairs,
    * ordered by (price desc, orderkey asc) for determinism. */
  class TopK(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
    private val ord: Ordering[(Double, Long)] = Ordering.by(p => (-p._1, p._2))
    override def zero: List[(Double, Long)] = Nil
    override def reduce(buf: List[(Double, Long)], row: (Double, Long)): List[(Double, Long)] =
      (row :: buf).sorted(ord).take(k)
    override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
      (a ++ b).sorted(ord).take(k)
    override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      Encoders.kryo[List[(Double, Long)]] // opaque buffer; only k elements
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** x61 — UDAF top-3 orders per market segment via the bounded Aggregator;
    * result shape matches the ROW_NUMBER oracle. */
  val x61: Q = (s, d) => {
    val o = t(s, d, "orders")
    val c = t(s, d, "customer")
    val topk = udaf(new TopK(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"),
        struct(col("o_totalprice").as("_1"), col("o_orderkey").as("_2")).as("po"))
      .groupBy(col("c_mktsegment"))
      .agg(topk(col("po._1"), col("po._2")).as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")))
      .select(col("c_mktsegment"), (col("pos") + 1).cast("long").as("rn"),
        col("col._2").as("o_orderkey"), round(col("col._1"), 2).as("price"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** x62 — UDTF via typed flatMap: bigram expansion + per-lang distinct
    * count. */
  val x62: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    t(s, d, "documents")
      .select(col("lang"), col("text")).as[(String, String)]
      .flatMap { case (lang, text) =>
        val toks = text.split(" ")
        toks.iterator.zip(toks.iterator.drop(1)).map { case (a, b) => (lang, s"$a $b") }
      }
      .toDF("lang", "bigram")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), countDistinct(col("bigram")).as("n_distinct"))
      .orderBy(col("lang"))
  }

  /** x63 — E30 approx distinct (HLL++); rows-only (sketch estimates are
    * engine-specific), error bound asserted in the spec. */
  val x63: Q = (s, d) =>
    t(s, d, "orders").agg(
      approx_count_distinct(col("o_custkey")).as("approx_custs"),
      countDistinct(col("o_custkey")).as("exact_custs"))

  val queries: Map[String, Q] = Map(
    "x60_udf_vowels" -> x60,
    "x61_udaf_topk" -> x61,
    "x62_udtf_bigrams" -> x62,
    "x63_approx_distinct" -> x63)

  val oracles: Map[String, String] = Map(
    "x60_udf_vowels" ->
      """SELECT lang, COUNT(*) AS docs,
        |CAST(SUM(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))) AS BIGINT) AS n_vowels
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "x61_udaf_topk" ->
      """SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_orderkey, ROUND(o_totalprice,2) AS price FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "x62_udtf_bigrams" ->
      """WITH bg AS (
        |  SELECT lang, UNNEST(list_transform(range(1, len(string_split(text,' '))),
        |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS bigram
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_bigrams, COUNT(DISTINCT bigram) AS n_distinct
        |FROM bg GROUP BY lang ORDER BY lang""".stripMargin)
}
