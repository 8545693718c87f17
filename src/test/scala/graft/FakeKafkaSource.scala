package graft

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Test-scope kafka stand-in (VERDICT r15 #4): registered ONLY through a
  * child-classloader service file synthesized at runtime by SourcesSpec —
  * deliberately NOT listed in this test classpath's META-INF/services, so
  * the zero-egress build's absent-branch assertions stay authentic while
  * the present branch becomes executable in the same JVM.
  *
  * Schema mirrors the real `spark-sql-kafka-0-10` relation (key/value
  * binary + topic/partition/offset/timestamp[Type]) so KafkaTopic's
  * (key, value)-string projection typechecks against it exactly as it
  * would against the real connector. Scans throw — the seam test binds
  * relations, it never reads a broker. */
class FakeKafkaSource extends TableProvider with RelationProvider with DataSourceRegister {
  override def shortName(): String = "kafka"

  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = kafkaSchema

  // V1 face: Spark's default spark.sql.sources.useV1SourceList includes
  // "kafka", so batch format("kafka") resolves through RelationProvider —
  // exactly the dual V1/V2 surface the real KafkaSourceProvider ships.
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = kafkaSchema
    }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new Table with SupportsRead {
      override def name(): String = "fake-kafka"
      override def schema(): StructType = kafkaSchema
      override def capabilities(): java.util.Set[TableCapability] =
        java.util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        throw new UnsupportedOperationException(
          "fake kafka source binds relations only; no broker behind it")
    }
}
