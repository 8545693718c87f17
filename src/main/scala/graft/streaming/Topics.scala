package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Topic abstraction — the seam the reference's Kafka/Redpanda boundary maps
  * onto (SURVEY §1.3, §7 risk 5). The message shape is Kafka's:
  * (key: String, value: String-JSON), as produced by the reference's
  * producers (`redpanda/producer.py:99-100`, `query_and_publish.py:171-172`).
  *
  * `spark-sql-kafka` is absent from this build (zero-egress), so the default
  * impl is a JSON-lines directory. Operator code never imports Kafka classes;
  * a real Kafka impl of these two traits drops in with
  * `.format("kafka").option("kafka.compression.type","snappy")...` unchanged
  * elsewhere.
  */
trait TopicSource {
  /** Streaming read of the topic (schema: key, value strings). */
  def readStream(spark: SparkSession): DataFrame
  /** Batch read of everything currently in the topic (A6 verification read). */
  def readBatch(spark: SparkSession): DataFrame
}

trait TopicSink {
  /** Batch publish (the producer path, A2). df must have key/value columns. */
  def publish(df: DataFrame): Unit
}

/** JSON-lines-directory topic. One JSON object per line: {"key":…,"value":…},
  * matching the Kafka message envelope.
  *
  * `numPartitions > 1` mimics the Kafka key-partitioner's placement (D5,
  * `producer.py:98-99`): publish hash-partitions rows by key, so a key's
  * records land co-located in one file per publish call. (Placement only —
  * no cross-publish or intra-file ordering guarantee; a real Kafka sink
  * additionally orders within a partition.) Default 1 keeps the writer's
  * natural parallelism with no shuffle. */
final case class FileTopic(dir: String, numPartitions: Int = 1)
    extends TopicSource with TopicSink {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))

  override def readStream(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema).json(dir)

  override def readBatch(spark: SparkSession): DataFrame =
    spark.read.schema(schema).json(dir)

  override def publish(df: DataFrame): Unit = {
    val out = df.select(col("key").cast("string"), col("value").cast("string"))
    val placed = if (numPartitions > 1) out.repartition(numPartitions, col("key")) else out
    placed.write.mode("append").json(dir)
  }
}

object Topics {
  /** Serialize rows to the topic envelope: key = keyCol, value = JSON of all
    * other columns — the reference's dict→JSON produce path
    * (`producer.py:99-100`). */
  def envelope(df: DataFrame, keyCol: String): DataFrame = {
    val payloadCols = df.columns.filter(_ != keyCol).map(col)
    df.select(col(keyCol).cast("string").as("key"),
      to_json(struct(col(keyCol) +: payloadCols.toIndexedSeq: _*)).as("value"))
  }
}
