package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Scale-mechanism evidence: AQE's automatic skew-join splitting — the
  * engine-default path for skewed keys (Salting covers the manual path,
  * SaltingSpec). Thresholds are lowered so a local-scale skew triggers the
  * same rewrite a 100 TB hot key would. */
class ScaleSpec extends SparkSpec {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._

    // 200k rows, 99% on one hot key -> one shuffle partition dwarfs the rest
    val left = s.range(0, 200000)
      .select(when($"id" % 100 === 0, $"id" % 50).otherwise(lit(7L)).as("k"),
        concat(lit("payload-"), $"id").as("pad"))
    val right = s.range(0, 50).select($"id".as("k"), lit("dim").as("v"))

    val joined = left.join(right, "k")
    // collect() executes THIS QueryExecution (count() would plan a separate
    // one, leaving joined's adaptive plan un-finalized)
    assert(joined.collect().length === 200000)

    val plan = joined.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(finalPlan.contains("skew=true"),
      s"expected AQE skew-split in final plan:\n$finalPlan")
  }
}
