package graft

import org.apache.spark.sql.SparkSession

/** One-off wall-clock attribution for the sf10 index-build stage
  * (BASELINE.md §composed-pipeline): times IVF k-means training, PQ
  * codebook training, and (optionally) the OPQ trainer separately, so the
  * >2,700 s finding decomposes into its stages before the sampled-training
  * fix lands. Usage: runMain graft.TrainProbe <sfDir> [km|pq|opq]... */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val stages = if (args.length > 1) args.drop(1).toSet else Set("km", "pq")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.t(spark, dir, "embeddings")
    val n = e.count()
    println(s"PROBE corpus n=$n")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-8s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    if (stages("km")) {
      // nlistFor is private[operators]; same scan: smallest p with p*128 >= n
      var nl = 16
      while (nl.toLong * 128 < n && nl < 65536) nl <<= 1
      println(s"PROBE nlist=$nl")
      time("km")(operators.Quantizers.trainKmOn(e, nl, n))
    }
    if (stages("pq")) time("pq")(operators.Quantizers.trainPqOn(e, n))
    spark.stop()
  }
}
