package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SURVEY charter: "repartition/bucketing for
  * co-located joins"). Writing both fact tables bucketed+sorted on the join
  * key pins their physical layout to the same hash partitioning, so every
  * subsequent join on that key plans with NO exchange on either side — at
  * 100 TB that deletes the dominant cost (shuffling both facts) from every
  * query in the join family, paid once at write time.
  */
object Bucketing {
  /** Persist `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys. With matching bucket
    * counts Catalyst plans a SortMergeJoin with zero Exchange nodes
    * (asserted in BucketingSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
