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
    // nlistFor is private[operators]; same scan: smallest p with p*128 >= n
    var nl = 16
    while (nl.toLong * 128 < n && nl < 65536) nl <<= 1
    def recallOf(cents: Array[(Long, Array[Double])]): Double = {
      val r = operators.AdvancedQueries.recallWith(spark, dir, cents)
        .select(org.apache.spark.sql.functions.col("recall"))
        .collect().map(_.getDouble(0))
      r.sum / r.length
    }
    if (stages("km")) {
      println(s"PROBE nlist=$nl")
      val m = time("km")(operators.Quantizers.trainKmOn(e, nl, n))
      println(f"PROBE km-recall ${recallOf(m.cents)}%.4f")
    }
    // the sampled-vs-full pairing rows for BASELINE.md: force the cap to
    // bind (64/centroid) vs force full-corpus training (target = n)
    if (stages("kmsamp")) {
      val m = time("kmsamp")(operators.Quantizers.trainKmOn(e, nl, n, sampleTarget = 64L * nl))
      println(f"PROBE kmsamp-recall ${recallOf(m.cents)}%.4f")
    }
    if (stages("pq")) {
      val m = time("pq")(operators.Quantizers.trainPqOn(e, n))
      println(s"PROBE pq-distortion ${m.trace.last._2}")
    }
    if (stages("pqfull")) {
      val m = time("pqfull")(operators.Quantizers.trainPqOn(e, n, sampleTarget = n))
      println(s"PROBE pqfull-distortion ${m.trace.last._2}")
    }
    // apples-to-apples codebook quality: mean FULL-corpus encode distortion
    // under the sampled-trained vs full-trained codebooks (the per-round
    // traces sum over different training sets, so they can't be compared)
    if (stages("pqeval")) {
      import org.apache.spark.sql.functions.{avg, col, explode}
      def meanDist(m: operators.Quantizers.PqModel): Double = {
        val enc = graft.functions.VectorExprs.pqArgmin(col("embedding"), m.cbs)
        Tables.spread(e)
          .select(explode(enc).as("s")).agg(avg(col("s.d"))).head.getDouble(0)
      }
      val sampled = operators.Quantizers.trainPqOn(e, n)
      val full = operators.Quantizers.trainPqOn(e, n, sampleTarget = n)
      println(f"PROBE pqeval sampled=${meanDist(sampled)}%.4f full=${meanDist(full)}%.4f")
    }
    spark.stop()
  }
}
