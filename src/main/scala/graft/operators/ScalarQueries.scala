package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** SURVEY.md §2.4 Q24–Q28 — scalar function surface: strings, dates, math,
  * JSON extraction, array ops (E15–E19).
  *
  * All expressions are Spark built-ins (whole-stage-codegen'd); no UDFs. The
  * projections narrow to the referenced columns so the parquet scan prunes
  * everything else (ReadSchema contains only what's selected).
  */
object ScalarQueries {
  import CoreQueries.Q

  /** Q24 — string functions (E15). */
  val q24: Q = (s, d) =>
    t(s, d, "part")
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("u"),
        lower(col("p_brand")).as("lb"),
        length(col("p_name")).cast("long").as("l"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("c"),
        expr("replace(p_type, ' ', '_')").as("tp"),
        col("p_name").like("%a%").cast("string").as("has_a"),
        trim(col("p_name")).as("tr"))
      .orderBy(col("p_partkey"))
      .limit(50)

  /** Q25 — date/time functions: per-month order counts (E16). */
  val q25: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("y"), col("m"))

  /** Q26 — math functions (E17). floor/ceil are LongType in Spark vs DOUBLE
    * in DuckDB — both sides cast to BIGINT for hash parity. */
  val q26: Q = (s, d) =>
    t(s, d, "events")
      .select(
        col("event_id"),
        round(sqrt(abs(col("value"))), 2).as("sq"),
        floor(col("value")).cast("long").as("fl"),
        ceil(col("value")).cast("long").as("ce"),
        round(log(col("value") + 1), 4).as("lg"),
        round(pow(col("value"), 2), 2).as("p2"))
      .orderBy(col("event_id"))
      .limit(100)

  /** Q27 — JSON extraction + group on extracted key (E18). `from_json`
    * with the known one-field schema — the idiomatic schema'd extraction
    * (typed field, no string→long cast). A/B-probed vs `get_json_object`
    * at sf0.1 in one JVM: parity (~0.37 s hot both — the time is the
    * cached-scan + Jackson-parse floor, not JsonPath overhead; accepted
    * as floor, 20× DuckDB's vectorized `->>`). Malformed rows yield a
    * null struct → null key, the same groups as the JsonPath form. */
  val q27: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
        .getField("k").as("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"))

  /** Q28 — array ops over the embedding column (E19): size, element access,
    * and a transform/aggregate fold (sum of squares, double-precision). */
  val q28: Q = (s, d) =>
    t(s, d, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        // same left-to-right double accumulation as the HOF form / the oracle
        round(graft.functions.VectorExprs.floatDot(col("embedding"), col("embedding")), 4).as("sumsq"))
      .orderBy(col("vec_id"))
      .limit(100)

  val queries: Map[String, Q] = Map(
    "q24_strings" -> q24,
    "q25_dates" -> q25,
    "q26_math" -> q26,
    "q27_json" -> q27,
    "q28_arrays" -> q28)

  val oracles: Map[String, String] = Map(
    "q24_strings" ->
      """SELECT p_partkey, upper(substr(p_name,1,5)) AS u, lower(p_brand) AS lb,
        |CAST(length(p_name) AS BIGINT) AS l, concat(p_brand,'#',p_type) AS c,
        |replace(p_type,' ','_') AS tp, CAST(p_name LIKE '%a%' AS VARCHAR) AS has_a,
        |trim(p_name) AS tr
        |FROM part ORDER BY p_partkey LIMIT 50""".stripMargin,
    "q25_dates" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
        |COUNT(*) AS n FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,
    "q26_math" ->
      """SELECT event_id, ROUND(sqrt(abs(value)),2) AS sq,
        |CAST(floor(value) AS BIGINT) AS fl, CAST(ceil(value) AS BIGINT) AS ce,
        |ROUND(ln(value + 1),4) AS lg, ROUND(pow(value,2),2) AS p2
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin,
    "q27_json" ->
      """SELECT CAST(props->>'$.k' AS BIGINT) AS k, COUNT(*) AS n
        |FROM events GROUP BY k ORDER BY k""".stripMargin,
    "q28_arrays" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |ROUND(CAST(embedding[1] AS DOUBLE),4) AS e1,
        |ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'),4) AS sumsq
        |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin)
}
