package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Quantizers

/** Diagnostic behind x93's design (like TopKProbe/RefineProbe): does a PCA
  * rotation lower trained-PQ distortion on this corpus (the OPQ premise),
  * and does eigenvalue-balanced subspace allocation beat the raw eigen
  * order? Measured (sf0.01 / sf0.1 final distortion): plain 287.0M/1210.5M,
  * eigen-order 289.4M/1210.6M (worse/wash — subspace 0 hoards variance),
  * balanced 270.6M/1196.2M — the allocation, not the rotation alone, wins;
  * x93 ships the balanced layout. */
object PcaPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.t(spark, dir, "embeddings")
    val m = Quantizers.trainedPca(spark, dir)
    def vlit(v: Array[Double]) = array(v.map(lit): _*)
    def rotated(perm: Seq[Int]) = e.select(col("vec_id"),
      array(perm.map(k =>
        functions.VectorExprs.floatDoubleDot(col("embedding"), vlit(m.eigVecs(k)))
          .cast("float")): _*).as("embedding"))
    val nAll = e.count()
    val plain = Quantizers.trainPqOn(e, nAll)
    val eigOrder = Quantizers.trainPqOn(rotated(0 until 64), nAll)
    // balanced allocation: round-robin eigen dims across the 8 subspaces so
    // each subspace gets one of every eigenvalue octave (OPQ-parametric's
    // allocation heuristic); subspace i takes dims i, i+8, i+16, ...
    val balanced = (0 until 8).flatMap(i => (0 until 8).map(j => i + 8 * j))
    val bal = Quantizers.trainPqOn(rotated(balanced), nAll)
    println(s"PROBE plain=${plain.trace.last._2} eig=${eigOrder.trace.last._2} bal=${bal.trace.last._2}")
    spark.stop()
  }
}
