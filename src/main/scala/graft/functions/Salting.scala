package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-join salting (SURVEY charter: "salting for skew"). AQE's
  * OptimizeSkewedJoin handles sort-merge skew at runtime; explicit salting is
  * the plan-level tool when one join key dominates so hard that even split
  * partitions hot-spot, or when the skewed side feeds an aggregation.
  *
  * big ⋈ small on `key` becomes:
  *   big  + salt = pmod(xxhash64(whole row id-ish cols), n)
  *   small × n   (explode each row to every salt value)
  *   join on (key, salt)
  * Each hot key's rows spread over n partitions; the small side grows n×
  * (broadcast-sized inputs only). Result set is identical to the unsalted
  * join — asserted in the spec.
  */
object Salting {
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int,
      joinType: String = "inner"): DataFrame = {
    require(n > 0)
    // right/full would duplicate unmatched small-side rows n× (the explode)
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    // per-row spread: hash a unique per-row id, NOT the row's columns —
    // identical rows (deduped facts, key-only projections) would otherwise
    // share one salt and re-hot-spot the very key being salted. Any salt
    // distribution is correctness-neutral (the small side carries all of
    // them), so the partition-dependent id is fine.
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(n)).cast("int"))
    val smallS = small
      .withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    bigS.join(smallS, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Per-key group-by on a skewed key: two-phase — partial agg on the salted
    * key, then final agg on the key. Use for algebraic aggregates (sum/count/
    * min/max). */
  def saltedCount(df: DataFrame, key: String, n: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(n)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(key))
      .agg(sum(col("_c")).as("n"))
}
