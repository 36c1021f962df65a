package graft.sources

import java.io.{BufferedReader, FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed BDE (.crs / .crs.gz) reader.
  *
  * Parallelism unit = file, matching the reference pipeline where each BDE
  * file is one load stream (gzip is unsplittable anyway). The schema comes
  * from one header read on the driver (a few KB — headers precede the data
  * marker); executors then stream-parse their files without ever
  * materializing a whole file in memory, so a 10 GB .crs.gz costs one task
  * and O(line) memory. At 100 TB the dataset is many files, so the stage
  * scales wide; `spark.createDataFrame` keeps the result a normal DataFrame
  * for Catalyst (column pruning happens in the subsequent projection).
  *
  * Reference behavior: `lib/LINZ/BdeUpload.pm:1150` pipes files through
  * `bde_copy` into a PG COPY; here the same parse lands directly in a
  * DataFrame.
  */
object BdeReader {

  private def open(path: String): BufferedReader = {
    val raw = new FileInputStream(path)
    val in = if (path.endsWith(".gz")) new GZIPInputStream(raw) else raw
    new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
  }

  /** Read just the header of one file (driver-side, stops at the marker). */
  def header(path: String): Bde.BdeHeader = {
    val r = open(path)
    try {
      val lines = Iterator.continually(r.readLine()).takeWhile(_ != null)
      Bde.parseHeader(lines)
    } finally r.close()
  }

  private val LdtFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSSSSS]")

  private def convert(v: String, dt: DataType): Any = {
    // \N = NULL (PG COPY text convention; what BdeWriter emits). An empty
    // field is NULL for non-text types (nothing parses to a number) but a
    // real empty string for text — matching COPY text semantics, and making
    // the writer→reader pair lossless for both NULL and "".
    if (v == "\\N") return null
    if (v.isEmpty && dt != StringType) return null
    val u = Bde.unescape(v)
    dt match {
      case IntegerType => u.trim.toInt
      case LongType => u.trim.toLong
      case DoubleType => u.trim.toDouble
      case d: DecimalType => new java.math.BigDecimal(u.trim)
      case TimestampNTZType => java.time.LocalDateTime.parse(u.trim, LdtFmt)
      case TimestampType => java.sql.Timestamp.valueOf(u.trim)
      case DateType => java.sql.Date.valueOf(u.trim)
      case BooleanType => u.trim == "t" || u.trim == "true" || u.trim == "Y"
      case _ => u
    }
  }

  /** Read a set of BDE files that share a table schema into a DataFrame. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no BDE files given")
    val schema = header(paths.head).schema
    val types = schema.fields.map(_.dataType)
    val rows = spark.sparkContext
      .parallelize(paths, paths.length)
      .flatMap { p =>
        val reader = open(p)
        val lines = Iterator.continually(reader.readLine())
          .takeWhile(l => l != null || { reader.close(); false })
        val data = lines.dropWhile(_.trim != Bde.DataMarker).drop(1)
        data.filter(_.nonEmpty).map { line =>
          val parts = Bde.splitRow(line)
          require(parts.length == types.length,
            s"row has ${parts.length} fields, schema has ${types.length}: $line")
          Row.fromSeq(parts.toIndexedSeq.zip(types).map {
            case (v, t) => convert(v, t)
          })
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** All .crs/.crs.gz files under a directory, name-ordered. */
  def listFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".crs") || f.getName.endsWith(".crs.gz"))
      .map(_.getPath).sorted.toSeq
  }
}
