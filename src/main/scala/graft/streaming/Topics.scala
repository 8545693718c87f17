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
  * `numPartitions = Some(n)` mimics the Kafka key-partitioner's placement
  * (D5, `producer.py:98-99`): publish hash-partitions rows by key into n
  * partitions, so a key's records land co-located in one file per publish
  * call (Some(1) = the e2e's single-partition topic, `e2e.sh:52-53`).
  * Placement only — no cross-publish or intra-file ordering guarantee; a
  * real Kafka sink additionally orders within a partition. None (default)
  * keeps the writer's natural parallelism with no shuffle. */
final case class FileTopic(dir: String, numPartitions: Option[Int] = None)
    extends TopicSource with TopicSink {
  numPartitions.foreach(n => require(n >= 1, s"numPartitions must be >= 1, got $n"))
  val schema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))

  override def readStream(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema).json(dir)

  override def readBatch(spark: SparkSession): DataFrame =
    spark.read.schema(schema).json(dir)

  override def publish(df: DataFrame): Unit = {
    val out = df.select(col("key").cast("string"), col("value").cast("string"))
    val placed = numPartitions.map(n => out.repartition(n, col("key"))).getOrElse(out)
    placed.write.mode("append").json(dir)
  }
}

/** The real-Kafka impl of the topic seam, written ENTIRELY against Spark's
  * public string-format reader/writer surface — no Kafka import exists, so
  * this compiles in the jar-less zero-egress build; at runtime it fails
  * fast with the swap instruction unless `spark-sql-kafka-0-10` is on the
  * classpath ([[graft.sources.ConnectorSeam.kafkaAvailable]]). Output
  * shape matches [[FileTopic]] exactly: (key, value) strings — Kafka's
  * binary columns cast, the reference's produce envelope
  * (`redpanda/producer.py:99-100`). Partition placement (D5) is the
  * key-partitioner's job on the broker side; `publish` ships key bytes and
  * lets the default partitioner hash them — same key→co-location contract
  * FileTopic mimics with its repartition. */
final case class KafkaTopic(bootstrap: String, topic: String)
    extends TopicSource with TopicSink {
  private def requireJar(): Unit =
    require(graft.sources.ConnectorSeam.kafkaAvailable,
      "spark-sql-kafka-0-10 is not on the classpath; use FileTopic (the " +
        "declared stand-in) or add the connector jar — no code changes needed")

  override def readStream(spark: SparkSession): DataFrame = {
    requireJar()
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"))
  }

  override def readBatch(spark: SparkSession): DataFrame = {
    requireJar()
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()
      .select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"))
  }

  override def publish(df: DataFrame): Unit = {
    requireJar()
    df.select(col("key").cast("string"), col("value").cast("string"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()
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
