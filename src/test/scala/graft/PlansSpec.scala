package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Repartition, Sort}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning

/** PresentationSortRule + Tables cache/spread behavior. The rule is exercised
  * per-session via experimental.extraOptimizations (same batch the extension
  * injection lands in) so the shared test session stays untouched. */
class PlansSpec extends SparkSpec {

  private def ruleSession() = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(graft.plans.PresentationSortRule(s))
    s
  }

  test("NLJ audit: exemption requires the single-row aggregate at the TOP of the build side") {
    import spark.implicits._
    val facts = (1 to 100).toDF("x")
    val dims = (1 to 50).toDF("y")
    // benign: build side IS a global aggregate (provably one row); a
    // row-preserving Project above it must not break the exemption
    val benign = facts.crossJoin(
      broadcast(dims.agg(avg(col("y")).as("m")).select((col("m") * 2).as("m2"))))
    assert(ExplainAudit.allNljSingleRowBuild(benign.queryExecution.executedPlan),
      benign.queryExecution.executedPlan.toString)
    // the advisory case: build side aggregates to one row and then
    // RE-EXPANDS above the aggregate — a real O(N×M) NLJ, must flag
    val reExpanded = facts.crossJoin(
      broadcast(dims.agg(avg(col("y")).as("m")).crossJoin(dims)))
    assert(!ExplainAudit.allNljSingleRowBuild(reExpanded.queryExecution.executedPlan),
      reExpanded.queryExecution.executedPlan.toString)
    // plain multi-row build: flags
    val plain = facts.crossJoin(broadcast(dims))
    assert(!ExplainAudit.allNljSingleRowBuild(plain.queryExecution.executedPlan))
  }

  test("small root sort becomes a single-partition local sort") {
    val s = ruleSession()
    val df = Tables.t(s, sfDir, "lineitem")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("c"))
      .orderBy(col("l_returnflag"))
    val opt = df.queryExecution.optimizedPlan
    val sorts = opt.collect { case so: Sort => so }
    assert(sorts.nonEmpty && sorts.forall(!_.global), s"expected local sort, got:\n$opt")
    assert(opt.collect { case r: Repartition => r }.exists(_.numPartitions == 1))
    // the single partition must come from an EXCHANGE, not a no-shuffle
    // coalesce: coalesce(1) would pull the producing stage into one task
    // (the x55 regression the round-7 rule fix removed)
    assert(opt.collect { case r: Repartition if r.numPartitions == 1 => r }
      .forall(_.shuffle), "presentation sort must repartition WITH shuffle")
    // physical plan: no range-partitioned exchange for the presentation sort
    val rangeEx = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
    assert(rangeEx.isEmpty)
  }

  test("rewritten sort returns identical rows in identical order") {
    val s = ruleSession()
    def q(sess: org.apache.spark.sql.SparkSession) =
      Tables.t(sess, sfDir, "orders")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("o_orderpriority"))
    assert(q(s).collect().toSeq == q(spark).collect().toSeq)
  }

  test("stats gate: oversized input keeps the distributed range sort") {
    val s = ruleSession()
    s.conf.set("spark.graft.presentationSort.maxBytes", "1") // force the gate shut
    try {
      val df = Tables.t(s, sfDir, "lineitem").orderBy(col("l_orderkey"))
      val sorts = df.queryExecution.optimizedPlan.collect { case so: Sort => so }
      assert(sorts.nonEmpty && sorts.forall(_.global))
    } finally s.conf.unset("spark.graft.presentationSort.maxBytes")
  }

  test("table cache: meta mode reuses the resolved DataFrame") {
    val s = spark.newSession() // fresh cache key
    s.conf.set("spark.graft.tableCache", "meta")
    assert(Tables.t(s, sfDir, "nation") eq Tables.t(s, sfDir, "nation"))
  }

  test("table cache: memory mode pins a persisted relation, same results") {
    val s = spark.newSession()
    s.conf.set("spark.graft.tableCache", "memory")
    val cached = Tables.t(s, sfDir, "lineitem")
    assert(cached.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    val n = cached.count()
    s.conf.set("spark.graft.tableCache", "off")
    assert(n == Tables.t(s, sfDir, "lineitem").count())
    cached.unpersist()
  }

  test("spread raises partition count without changing rows") {
    val base = Tables.t(spark, sfDir, "documents")
    val sp = Tables.spread(base)
    assert(sp.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(sp.count() == base.count())
  }
}
