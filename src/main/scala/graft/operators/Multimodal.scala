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

  /** Resize plumbing with a stubbed codec: each payload is downsampled to
    * 1/`stride` of its bytes (the nearest-neighbour-downsample shape —
    * a real deployment decodes, resizes and re-encodes here). Runs through
    * the same batched `mapPartitions` the decoder uses; emits the size and
    * digest of the resized payload so the gate pins the exact output
    * bytes. ==== RESIZE STUB ==== (codec libraries absent; the stride
    * sample is the deterministic stand-in.)
    */
  def resizeStub(s: SparkSession, dir: String, stride: Int = 8,
                 batchSize: Int = 64): DataFrame = {
    import s.implicits._
    withPayload(s, dir).select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // <- a vectorized resize kernel would process `batch` in one call
          batch.iterator.map { case (id, bytes) =>
            val out = bytes.indices.collect {
              case i if i % stride == 0 => bytes(i) }.toArray
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(out).map("%02x".format(_)).mkString
            (id, out.length.toLong, md)
          }
        }
      }
      .toDF("doc_id", "n_out", "out_md5")
      .orderBy("doc_id")
  }

  val resizeStubSql: String = """
    WITH p AS (
      SELECT doc_id,
        ['PNG!', 'JPG!', 'WAV!'][CAST(doc_id % 3 AS INT) + 1] || text AS s
      FROM documents),
    r AS (
      SELECT doc_id,
        array_to_string(list_transform(
          generate_series(1, length(s), 8), i -> s[i:i]), '') AS rs
      FROM p)
    SELECT doc_id, CAST(length(rs) AS BIGINT) AS n_out, md5(rs) AS out_md5
    FROM r ORDER BY doc_id"""

  private val FrameBytes = 16
  private val FrameEvery = 4

  /** Frame sampling for framed media ("video"): split the payload into
    * fixed-size frames, keep every `FrameEvery`-th — entirely as column
    * expressions (sequence → transform → posexplode), no UDF, so the frame
    * slicing runs codegen'd and a real decoder only ever sees the sampled
    * frames. The sampled fraction is the standard cost knob of video
    * pipelines: the scan reads every byte, but decode cost (the expensive
    * stage at 100 TB) drops by the sampling factor.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    withPayload(s, dir)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
                sequence(0, cast((length(payload) + ${FrameBytes - 1}) div $FrameBytes as int) - 1),
                i -> substring(payload, i * $FrameBytes + 1, $FrameBytes))"""))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % FrameEvery === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  val frameSampleSql: String = s"""
    WITH p AS (
      SELECT doc_id,
        ['PNG!', 'JPG!', 'WAV!'][CAST(doc_id % 3 AS INT) + 1] || text AS s
      FROM documents),
    f AS (
      SELECT doc_id, i AS frame_idx,
        s[i * $FrameBytes + 1 : i * $FrameBytes + $FrameBytes] AS frame
      FROM p, UNNEST(generate_series(0,
        (length(s) + ${FrameBytes - 1}) // $FrameBytes - 1)) AS u(i))
    SELECT doc_id, frame_idx, CAST(length(frame) AS BIGINT) AS frame_len,
      md5(frame) AS frame_md5
    FROM f WHERE frame_idx % $FrameEvery = 0
    ORDER BY doc_id, frame_idx"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_resize" -> (resizeStub(_, _)),
    "multimodal_frames" -> (frameSample _),
    // decoded-feature extraction: byte statistics are not expressible over
    // DuckDB varchars (per-byte iteration on UTF-8), so no oracle entry —
    // the driver records the weaker rows-only check; the decode plumbing
    // itself is spec-tested (SimilaritySpec)
    "multimodal_decode" -> ((s, dir) => decodeStub(s, dir).toDF()
      .orderBy("doc_id")))

  val oracles: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaSql,
    "multimodal_resize" -> resizeStubSql,
    "multimodal_frames" -> frameSampleSql)
}
