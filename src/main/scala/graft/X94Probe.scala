package graft
import org.apache.spark.sql.SparkSession
object X94Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"X94 $l ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    // warm the models
    time("train")(operators.Quantizers.trainedOpq(spark, dir))
    time("x94-cold")(SparkEntry.queries("x94_opq_search")(spark, dir).write.mode("overwrite").format("noop").save())
    time("x94-hot")(SparkEntry.queries("x94_opq_search")(spark, dir).write.mode("overwrite").format("noop").save())
    val rot = operators.Quantizers.opqRotated(spark, dir)
    time("rotation-only")(rot.write.mode("overwrite").format("noop").save())
    import org.apache.spark.sql.functions.col
    val enc = graft.Tables.spread(rot)
      .withColumn("_pqenc", graft.functions.VectorExprs.pqArgmin(col("embedding"),
        operators.Quantizers.trainedOpq(spark, dir).cbs))
      .select(col("vec_id"), col("_pqenc"))
    time("rot+encode")(enc.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
