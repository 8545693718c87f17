package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loading + canonical-rendering helpers shared by every operator.
  *
  * The testdata layout (one parquet file per table under the sf dir) mirrors the
  * reference's Iceberg tables (`/root/reference/duckdb/init.sql:22-32` attaches a
  * catalog; our stand-in resolves `name` -> `dir/name.parquet`, SURVEY.md §1.3).
  */
object Tables {
  /** Scan a testdata table. Filters/projections placed on the result are pushed
    * into the parquet scan by Catalyst (verified via explain: PushedFilters).
    *
    * `events.ts` is TIMESTAMP(NANOS) in the parquet footer, which Spark's
    * vectorized reader rejects; we read it as raw nanos (legacy conf) and
    * truncate to a microsecond TimestampType — the same ns→µs truncation
    * DuckDB applies, so oracle renderings agree. Integer `div` (not `/`):
    * epoch-nanos exceed 2^53, double arithmetic would corrupt them. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
      .getOrElse(df)
  }

  /** Exact, order-independent sum of a double column (double addition is not
    * associative — at 100 TB the shuffle's reduction order is
    * nondeterministic, and the DuckDB oracle adds in yet another order).
    *
    * Implementation: fixed-point integer sum — round each value to `scale`
    * decimals as a scaled long, sum longs (codegen'd primitive agg; a
    * DECIMAL-cast sum is equivalent but runs the BigDecimal accumulator:
    * measured ~0.5 s per sum over 600k rows vs ~0 for longs), divide once.
    * Value-identical to the oracle's CAST(x AS DECIMAL(28,s)) sum: each
    * input rounds to the same scaled integer (our doubles are exact scale-2
    * rationals, products of them exact scale-4 — never at a rounding tie),
    * the integer sum is exact, and the final single division is correctly
    * rounded on both sides. Long capacity: |sum * 10^scale| must stay below
    * 2^53 for the toDouble to be exact — holds through bench scale; a 100 TB
    * deployment sizes scale or partial-aggregates per group far below that. */
  def dsum(c: Column, scale: Int = 2): Column = {
    val p = math.pow(10, scale)
    sum(round(c * p).cast("long")) / lit(p)
  }

  /** Canonical timestamp rendering (UTC, microseconds, trailing zeros trimmed)
    * — matches DuckDB's VARCHAR cast so oracle hashes line up. */
  def tsStr(c: Column): Column = c.cast("string")

  /** Half-up rounding via floor(x*10^s + 0.5)/10^s instead of round():
    * round()'s tie-breaking differs between Spark (BigDecimal HALF_UP on the
    * shortest decimal repr) and DuckDB (std::round on the raw double), and
    * RATIONAL quantities (averages, ratios) genuinely land on exact ties.
    * The floor form is the same IEEE double ops in both engines, so identical
    * inputs give identical outputs. Use for any rational-valued rounding;
    * plain round() is fine for continuous values (sqrt/ln/cosine). */
  def fround(c: Column, scale: Int): Column = {
    val p = lit(math.pow(10, scale))
    floor(c * p + lit(0.5)) / p
  }

  /** Order-independent exact average: fixed-point sum (exact, any reduction
    * order) divided by count. A native AVG's double sum depends on partition
    * order — nondeterministic across cluster layouts. */
  def davg(c: Column, scale: Int = 6): Column =
    dsum(c, scale) / count(lit(1))
}
