package graft

import org.apache.spark.sql.functions._
import graft.functions.Bucketing

/** Bucketed join: no exchange on either side, results identical to the
  * shuffled join. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero Exchange nodes and matches the shuffled join") {
    val li = graft.Tables.t(spark, sfDir, "lineitem")
    val o = graft.Tables.t(spark, sfDir, "orders")
    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bkt", "o_orderkey", 8)

    val joined = Bucketing.bucketedJoin(spark, "li_bkt", "o_bkt", "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the only exchange allowed is the one for the final groupBy
    val joinSection = plan.split("HashAggregate").last // below the aggs sits the join
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan)

    val viaShuffle = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    val viaBuckets = joined.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    assert(viaBuckets == viaShuffle)

    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
  }
}
