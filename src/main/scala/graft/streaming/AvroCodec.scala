package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro envelope codec for the `value_schema_id_prefix` ingest mode (the
  * reference's Avro topic flavor, `CLAUDE.md:165-171`: message value =
  * magic byte 0x00 + 4-byte big-endian schema id + Avro binary body — the
  * Confluent wire format).
  *
  * There is NO spark-avro DataSource in this build (`/opt/spark/jars` has
  * only the avro-1.12.1 core libs), so `from_avro` is unavailable; this
  * codec is the avro-Java-API seam the ingest job decodes through — the
  * same per-partition-kernel placement as the multimodal codecs (a codec
  * is not a Catalyst Expression; the Spark-side plumbing around it is).
  *
  * Schema ids: we use the registry VERSION of the subject as the id (a
  * Confluent registry hands out global ids; version-as-id is the
  * single-subject specialization — the envelope layout is identical).
  *
  * Scope: flat record schemas over Spark's primitive types — exactly the
  * shape the reference's topics carry (flat JSON objects). Nested structs
  * would extend `toAvro`/`fromAvro` recursively; nothing else changes.
  */
object AvroCodec {
  val Magic: Byte = 0x00

  /** StructType → Avro record schema. Nullable fields become
    * union(null, T) with a null default (so later versions can add fields
    * BACKWARD-compatibly, mirroring SchemaRegistry.checkBackward). */
  def avroSchema(name: String, st: StructType): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case LongType | TimestampType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroCodec: unsupported field type ${other.simpleString} for '${f.name}'")
      }
      if (f.nullable) {
        val union = Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        fields.add(new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE))
      } else fields.add(new Schema.Field(f.name, base, null, null.asInstanceOf[Object]))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  /** Row (matching `st` field order) → enveloped Avro bytes. */
  def encode(row: Row, st: StructType, schema: Schema, schemaId: Int): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (row.isNullAt(i)) null else f.dataType match {
        case TimestampType =>
          // full microsecond precision: getTime is millis-truncated, the
          // sub-millisecond part lives only in getNanos
          val ts = row.getAs[java.sql.Timestamp](i)
          Long.box(ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L)
        case BinaryType => ByteBuffer.wrap(row.getAs[Array[Byte]](i))
        case _ => row.get(i).asInstanceOf[AnyRef]
      }
      rec.put(f.name, v)
    }
    val body = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(body, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val payload = body.toByteArray
    ByteBuffer.allocate(5 + payload.length)
      .put(Magic).putInt(schemaId).put(payload).array()
  }

  /** Envelope header → (schemaId, body offset). Throws on a non-Avro value
    * (wrong magic) — the caller routes that to the reject count, the same
    * contract as JSON parse failure. */
  def schemaIdOf(bytes: Array[Byte]): Int = {
    require(bytes.length >= 5 && bytes(0) == Magic,
      s"not a schema-id-prefixed Avro value (len=${bytes.length}, " +
        s"magic=${if (bytes.isEmpty) "none" else bytes(0).toString})")
    ByteBuffer.wrap(bytes, 1, 4).getInt
  }

  /** Enveloped bytes → Row under `readerSt` (the registry schema for the
    * embedded id). Avro Utf8 → String; avro long → Timestamp where the
    * Spark type says so. */
  def decode(bytes: Array[Byte], readerSt: StructType, schema: Schema): Row = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
    val rec = new GenericDatumReader[GenericRecord](schema).read(null, dec)
    Row.fromSeq(readerSt.fields.toIndexedSeq.map { f =>
      val v = rec.get(f.name)
      if (v == null) null
      else f.dataType match {
        case StringType => v.toString
        case TimestampType =>
          val micros = v.asInstanceOf[Long]
          val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
          t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          t
        case BinaryType =>
          val bb = v.asInstanceOf[ByteBuffer]
          val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
        case _ => v
      }
    })
  }
}
