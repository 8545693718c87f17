package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.t

/** North-star multimodal-column operators (SURVEY §2.2): opaque binary
  * payloads + typed metadata, with decode/feature-extract as per-partition
  * batch functions.
  *
  * The container has no image/audio codecs, so `decode` is a clearly-marked
  * deterministic STUB (derives "pixel" stats from the raw bytes). Everything
  * around it — the binary column, the metadata struct schema, the
  * mapPartitions batch shape, the partitioning — is the real plumbing a
  * decode-UDF would run in at 100 TB (one task per input split, codec state
  * initialized once per partition, not per row).
  */
object MultimodalQueries {
  import CoreQueries.Q

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("mean_cp", DoubleType)))

  /** STUB decoder: stands in for an image codec. Deterministic function of
    * the payload so results are stable and oracle-checkable. The "pixel
    * mean" averages the decoded string's code points over the CHARACTER
    * count (not bytes) so the DuckDB twin (ascii(text[i]) over length(text))
    * computes the identical value for non-ASCII payloads too; dims derive
    * from the byte length. Empty payloads decode to 0.0. */
  private def fakeDecode(bytes: Array[Byte]): (Long, Long, Double) = {
    val n = bytes.length.toLong
    val width = 64L + (n % 577L)       // fake dims derived from payload size
    val height = 64L + (n % 331L)
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    var sum = 0L
    var count = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sum += cp
      count += 1
      i += Character.charCount(cp)
    }
    val mean = if (count == 0) 0.0 else sum.toDouble / count.toDouble
    (width, height, mean)
  }

  /** x50 — binary payload + metadata extraction through a per-partition
    * batch decode (the mapInPandas analog in Scala: mapPartitions, one codec
    * init per task). Payload = utf-8 bytes of `text` standing in for image
    * bytes. */
  val x50: Q = (s, d) => {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    implicit val enc = RowEncoder.encoderFor(mediaSchema)
    docs.mapPartitions { rows =>
      // per-partition "codec" init happens here (once per task)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, m) = fakeDecode(payload)
        // round half-away-from-zero on positive mean — matches DuckDB ROUND
        Row(id, payload.length.toLong, w, h, math.round(m * 100).toDouble / 100)
      }
    }.orderBy(col("doc_id")).limit(200)
  }

  /** x51 — metadata-only pushdown path: operating on typed metadata columns
    * must NOT deserialize the payload (column pruning keeps the binary out of
    * the scan — asserted in the spec via ReadSchema). */
  val x51: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"), sum(col("n_chars")).cast("long").as("total_bytes"))
      .orderBy(col("source"))

  val queries: Map[String, Q] = Map(
    "x50_media_decode" -> x50,
    "x51_media_metadata" -> x51)

  val oracles: Map[String, String] = Map(
    // the stub decode is pure arithmetic over octet_length => SQL-expressible
    // floor(x*100+0.5)/100 instead of ROUND: the mean is rational, and exact
    // .005 ties round differently in DuckDB (std::round on the raw double)
    // vs Spark/Scala — floor-based half-up is bit-identical in both.
    "x50_media_decode" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |CAST(64 + strlen(text) % 577 AS BIGINT) AS width,
        |CAST(64 + strlen(text) % 331 AS BIGINT) AS height,
        |CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |floor(CAST(list_aggregate(list_transform(range(1, length(text)+1),
        |  i -> ascii(text[i])), 'sum') AS DOUBLE) / length(text) * 100 + 0.5) / 100 END AS mean_cp
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,
    "x51_media_metadata" ->
      """SELECT source, COUNT(*) AS n_media, CAST(SUM(n_chars) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
}
