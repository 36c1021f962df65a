package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-document decoded-media features (decode itself is stubbed — see
  * [[Multimodal.decodeStub]]).
  */
case class MediaFeatures(doc_id: Long, media_kind: String, n_bytes: Long,
                         byte_mean: Double, byte_max: Int)

/** Opaque-binary ("multimodal") column plumbing: typed metadata over
  * image/audio/video payload columns.
  *
  * The harness tables carry no real media, so the scenario materializes a
  * deterministic payload per document (a 4-byte magic header + the document
  * body as bytes). Everything Spark-side is real — binary columns, magic-byte
  * sniffing, sizes, digests, batched decode plumbing; only the codec call
  * itself is a clearly-marked stub (image/audio libraries are not in this
  * container).
  *
  * Scale: payloads never leave the executor (no collect); metadata extraction
  * is a narrow projection; the batched decode is `mapPartitions` with
  * fixed-size batches, the same shape a vectorized decoder (or
  * `mapInPandas` in PySpark) would use.
  */
object Multimodal {

  /** Documents extended with a binary `payload` column. */
  def withPayload(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("magic", expr(
        "element_at(array('PNG!', 'JPG!', 'WAV!'), cast(doc_id % 3 as int) + 1)"))
      .withColumn("payload", concat(col("magic"), col("text")).cast("binary"))

  /** Metadata extraction: sniff the container from the magic bytes, record
    * byte size and content digest. Pure column expressions over the binary
    * payload — codegen'd, no UDF.
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    withPayload(s, dir)
      .withColumn("sniff", expr("decode(substring(payload, 1, 4), 'UTF-8')"))
      .select(
        col("doc_id"),
        when(col("sniff") === "PNG!", "image/png")
          .when(col("sniff") === "JPG!", "image/jpeg")
          .when(col("sniff") === "WAV!", "audio/wav")
          .otherwise("unknown").as("media_kind"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"))
      .orderBy("doc_id")

  /** DuckDB cannot slice blobs, so the oracle mirrors the byte semantics on
    * the varchar form: the payload is ASCII magic + UTF-8 text, and
    * md5(varchar) hashes the same UTF-8 bytes Spark's md5(binary) sees.
    */
  val multimodalMetaSql: String = """
    WITH p AS (
      SELECT doc_id,
        ['PNG!', 'JPG!', 'WAV!'][CAST(doc_id % 3 AS INT) + 1] || text AS s
      FROM documents)
    SELECT doc_id,
      CASE substring(s, 1, 4)
        WHEN 'PNG!' THEN 'image/png'
        WHEN 'JPG!' THEN 'image/jpeg'
        WHEN 'WAV!' THEN 'audio/wav'
        ELSE 'unknown' END AS media_kind,
      octet_length(encode(s)) AS n_bytes,
      md5(s) AS digest
    FROM p ORDER BY doc_id"""

  /** Batched decode plumbing: partitions stream through fixed-size batches
    * exactly as a vectorized image/audio decoder would consume them.
    *
    * ==== DECODE STUB ====
    * A real deployment calls the codec here (e.g. JPEG decode → pixel
    * tensor). Those libraries are absent in this container, so the "decoded
    * features" are deterministic byte statistics of the payload. The
    * surrounding plumbing — binary column in, typed Dataset out, batch
    * shape, partition boundaries — is the real, tested article.
    */
  def decodeStub(s: SparkSession, dir: String,
                 batchSize: Int = 64): Dataset[MediaFeatures] = {
    import s.implicits._
    multimodalMeta(s, dir)
      .join(withPayload(s, dir).select("doc_id", "payload"), "doc_id")
      .select("doc_id", "media_kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // <- a vectorized decoder would process `batch` in one call
          batch.iterator.map { case (id, kind, bytes) =>
            MediaFeatures(id, kind, bytes.length,
              bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / bytes.length,
              bytes.foldLeft(0)((m, b) => math.max(m, b & 0xff)))
          }
        }
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    // decoded-feature extraction: byte statistics are not expressible over
    // DuckDB varchars (per-byte iteration on UTF-8), so no oracle entry —
    // the driver records the weaker rows-only check; the decode plumbing
    // itself is spec-tested (SimilaritySpec)
    "multimodal_decode" -> ((s, dir) => decodeStub(s, dir).toDF()
      .orderBy("doc_id")))

  val oracles: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaSql)
}
