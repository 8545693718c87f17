package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end vector-store lifecycle — the embedding-side counterpart of
  * CurationDemo, composing the shipped operators as a user would run a
  * production vector pipeline (each stage IS the shipped query logic):
  *
  *   1. hygiene: embedding outlier scan (x69) — the quality gate before
  *      any vector is trusted for retrieval or semantic dedup
  *   2. build ONCE: the persisted cid-partitioned index (x28's build),
  *      which carries raw vectors AND 4-bit PQ codes
  *   3. serve MANY: exact cosine retrieval from the pinned raw tier
  *      (x28), ADC retrieval from the code columns alone (x80), and the
  *      refine mode — codes-tier shortlist + exact re-rank (x85), the
  *      serving path for when the raw tier cannot stay pinned
  *   4. evaluate: recall@k of the probed retrieval vs exact brute force
  *      (x29) — the eval a pipeline runs before trusting the index
  *   5. dedup: SemDeDup near-dup pairs within clusters (x25) — the
  *      curation use of the same coarse quantizer
  *
  * Prints one summary line per stage; every number is deterministic
  * (asserted reproducible in VectorDemoSpec).
  *
  * runMain graft.VectorDemo [sfDir]
  */
object VectorDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session()
    val r = run(spark, sfDir)
    println(s"[vector] vectors=${r.vectors} outliers=${r.outliers} " +
      s"servedExact=${r.servedExact} servedAdc=${r.servedAdc} " +
      s"servedRefine=${r.servedRefine} " +
      s"meanRecall=${r.meanRecall} semdupPairs=${r.semdupPairs}")
    spark.stop()
  }

  case class Result(vectors: Long, outliers: Long, servedExact: Long,
                    servedAdc: Long, servedRefine: Long,
                    meanRecall: Double, semdupPairs: Long)

  def run(spark: SparkSession, sfDir: String): Result = {
    import graft.operators.AdvancedQueries

    // 1. hygiene scan
    val out = AdvancedQueries.queries("x69_embed_outliers")(spark, sfDir)
    val vectors = out.count()
    val outliers = out.filter(col("is_outlier")).count()

    // 2.+3. build-once / serve-many: the first serving call builds the
    // index; both paths then read the same persisted layout
    val exact = AdvancedQueries.queries("x28_indexed_retrieval")(spark, sfDir)
    val servedExact = exact.count()
    val adc = AdvancedQueries.queries("x80_indexed_ivfpq")(spark, sfDir)
    val servedAdc = adc.count()
    val refine = AdvancedQueries.queries("x85_refine_search")(spark, sfDir)
    val servedRefine = refine.count()

    // 4. index-quality eval: mean recall@k over the query sample
    val rec = AdvancedQueries.queries("x29_ann_recall")(spark, sfDir)
    val meanRecall = rec.agg(avg(col("recall"))).head.getDouble(0)

    // 5. semantic dedup over the same clustering
    val semdupPairs = AdvancedQueries.queries("x25_semantic_dedup")(spark, sfDir).count()

    Result(vectors, outliers, servedExact, servedAdc, servedRefine,
      meanRecall, semdupPairs)
  }
}
