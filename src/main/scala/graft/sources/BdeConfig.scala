package graft.sources

/** Per-table upload configuration — the reference's `tables.conf` format
  * (`lib/LINZ/BdeUpload.pm:125` `_read_config`, documented in
  * `conf/tables.conf`):
  *
  * {{{
  * TABLE name [l0_only|l5_only|l5_is_full|key=col|row_tol=e,w]... files f1 f2...
  * COLUMN name type            # optional continuation, overrides file header
  * }}}
  *
  * Lines starting with `#` and blank lines are skipped. The special name
  * `l5_change_table` marks the change-table record (level `C`). Tables
  * default to levels {0, 5}; `l0_only`/`l5_only` restrict them;
  * `l5_is_full` marks tables whose level-5 files are full snapshots.
  * Duplicate definitions for the same (table, level) are an error, as are
  * tables with no files or tolerances outside [0, 1].
  */
case class BdeTableDef(
    name: String,
    id: Int,
    keyColumn: Option[String],
    rowTolError: Option[Double],
    rowTolWarning: Option[Double],
    levels: Set[String],
    level5IsFull: Boolean,
    files: Seq[String],
    columns: Seq[String])

/** How `BdeReader` reacts to one class of data error — the reference's
  * `error_type <class> ignore|warning|error|fatal`
  * (`conf/linz_bde_uploader.conf:360-377`).
  */
sealed trait BdeErrorAction
object BdeErrorAction {
  case object Ignore extends BdeErrorAction
  case object Warning extends BdeErrorAction
  case object Error extends BdeErrorAction
  case object Fatal extends BdeErrorAction

  def parse(s: String): BdeErrorAction = s.toLowerCase match {
    case "ignore" => Ignore
    case "warning" | "warn" => Warning
    case "error" => Error
    case "fatal" => Fatal
    case other => throw new IllegalArgumentException(
      s"unknown error action '$other'")
  }
}

/** bde_copy-style data-cleansing policy
  * (`conf/linz_bde_uploader.conf:360-390`): per-error-class actions, the
  * error budget, and the minimum-year date substitution. Defaults mirror
  * the reference configuration (`date_range warning`, `column_count error`,
  * `max_errors 0`, `minimum_year 0`).
  */
case class BdeErrorPolicy(
    columnCount: BdeErrorAction = BdeErrorAction.Error,
    dateRange: BdeErrorAction = BdeErrorAction.Warning,
    maxErrors: Int = 0,
    minimumYear: Int = 0,
    invalidDatetimeString: String = "1800-01-01 00:00:00",
    invalidDateString: String = "1800-01-01")

object BdeConfig {

  /** Parse a `tables.conf`-format text into table definitions, accumulating
    * every error before failing (as the reference does).
    */
  def parseTables(text: String): Seq[BdeTableDef] =
    parseTablesWithWarnings(text)._1

  /** As [[parseTables]], also returning non-fatal warnings (unrecognized
    * TABLE options — the reference's `_read_config` silently ignores
    * these, so a legacy config with unknown options must still parse).
    */
  def parseTablesWithWarnings(text: String): (Seq[BdeTableDef], Seq[String]) = {
    val defs = Seq.newBuilder[BdeTableDef]
    val warnings = Seq.newBuilder[String]
    val errors = Seq.newBuilder[String]
    val seenLevels = scala.collection.mutable.Set[(String, String)]()
    var current: BdeTableDef = null
    var id = 0

    def flush(): Unit = if (current != null) { defs += current; current = null }

    text.linesIterator.zipWithIndex.foreach { case (line, idx) =>
      val ln = idx + 1
      val trimmed = line.trim
      if (trimmed.nonEmpty && !trimmed.startsWith("#")) {
        val tokens = trimmed.split("\\s+").toList
        tokens.head.toLowerCase match {
          case "table" =>
            flush()
            tokens.tail match {
              case rawName :: rest =>
                val name = rawName.toLowerCase
                id += 1
                var key: Option[String] = None
                var tolE: Option[Double] = None
                var tolW: Option[Double] = None
                var levels: Set[String] =
                  if (name == "l5_change_table") Set("C") else Set("0", "5")
                var l5Full = false
                val TolRe = """row_tol=([0-9.]+),([0-9.]+)""".r
                val KeyRe = """key=(\S+)""".r
                val (opts, filesTok) = rest.span(t => !t.toLowerCase.matches("files?"))
                opts.map(_.toLowerCase).foreach {
                  case "l0_only" => levels = Set("0")
                  case "l5_only" => levels = Set("5")
                  case "l5_is_full" => l5Full = true
                  case KeyRe(k) => key = Some(k)
                  case TolRe(e, w) =>
                    val (ed, wd) = (e.toDouble, w.toDouble)
                    if (ed > 1) errors += s"Line $ln: error tolerance invalid for table $name"
                    if (wd > 1) errors += s"Line $ln: warning tolerance invalid for table $name"
                    tolE = Some(ed); tolW = Some(wd)
                  case other => warnings += s"Line $ln: unknown option '$other' for table $name"
                }
                // the change-table record is ALWAYS level C, even if an
                // l0_only/l5_only option appeared (the reference forces C
                // after option processing)
                if (name == "l5_change_table") levels = Set("C")
                val files = filesTok.drop(1) // drop the "files" marker
                if (files.isEmpty) errors += s"Line $ln: no files defined for table $name"
                levels.foreach { l =>
                  if (!seenLevels.add((name, l)))
                    errors += s"Line $ln: definition for $name level $l repeated"
                }
                current = BdeTableDef(name, id, key, tolE, tolW, levels,
                  l5Full, files, Nil)
              case Nil => errors += s"Line $ln: TABLE without a name"
            }
          case "column" if current != null =>
            current = current.copy(
              columns = current.columns :+ tokens.tail.mkString(" "))
          case other =>
            errors += s"Line $ln: invalid command '$other'"
        }
      }
    }
    flush()
    val errs = errors.result()
    if (errs.nonEmpty) throw new IllegalArgumentException(
      "Error reading BDE upload configuration:\n" + errs.mkString("\n"))
    (defs.result(), warnings.result())
  }

  /** Parse the error-policy subset of the main configuration file
    * (`error_type`, `max_errors`, `minimum_year`,
    * `invalid_datetime_string`, `invalid_date_string`); unrelated keys are
    * ignored so the reference's full `linz_bde_uploader.conf` parses as-is.
    */
  def parseErrorPolicy(text: String): BdeErrorPolicy = {
    var p = BdeErrorPolicy()
    text.linesIterator.foreach { line =>
      val trimmed = line.trim
      if (trimmed.nonEmpty && !trimmed.startsWith("#")) {
        trimmed.split("\\s+").toList match {
          case "error_type" :: cls :: action :: Nil =>
            cls.toLowerCase match {
              case "column_count" => p = p.copy(columnCount = BdeErrorAction.parse(action))
              case "date_range" => p = p.copy(dateRange = BdeErrorAction.parse(action))
              case _ => // file_size etc — not applicable to the DataFrame path
            }
          case "max_errors" :: n :: Nil => p = p.copy(maxErrors = n.toInt)
          case "minimum_year" :: y :: Nil => p = p.copy(minimumYear = y.toInt)
          case "invalid_datetime_string" :: rest if rest.nonEmpty =>
            p = p.copy(invalidDatetimeString = rest.mkString(" "))
          case "invalid_date_string" :: rest if rest.nonEmpty =>
            p = p.copy(invalidDateString = rest.mkString(" "))
          case _ => // unrelated configuration keys
        }
      }
    }
    p
  }
}

/** Job-scoped engine option store — `bde_SetOption` / `bde_GetOption`
  * (`sql/02-bde_control_functions.sql.in:767,803`): a tiny key→value table
  * the controlling script and engine steps use to pass state. Reference
  * semantics kept exactly: setting a null value deletes the option; `get`
  * of an absent option returns None. Persistence is a properties file on
  * the Hadoop FileSystem (local/HDFS/object stores), so options survive
  * across the separate JVMs of a multi-step run, like the reference's
  * per-upload `_options` table survives across function calls.
  */
final class GraftOptions private (
    private var opts: Map[String, String]) {

  def get(option: String): Option[String] = opts.get(option)

  def getOrElse(option: String, default: String): String =
    opts.getOrElse(option, default)

  /** Set (upsert) an option; `None` deletes it. Returns affected count,
    * as the reference function does.
    */
  def set(option: String, value: Option[String]): Int = value match {
    case Some(v) => opts = opts.updated(option, v); 1
    case None =>
      val n = if (opts.contains(option)) 1 else 0
      opts = opts - option
      n
  }
  def set(option: String, value: String): Int = set(option, Option(value))

  def toMap: Map[String, String] = opts

  /** Persist to `path` via the same staged-create-then-rename commit the
    * manifest store uses — a reader never sees a torn file.
    */
  def save(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.${java.util.UUID.randomUUID()}")
    val out = fs.create(staged, false)
    try {
      val props = new java.util.Properties()
      opts.foreach { case (k, v) => props.setProperty(k, v) }
      props.store(out, "graft options")
    } finally out.close()
    if (fs.exists(p) && !fs.delete(p, false))
      sys.error(s"GraftOptions: cannot replace $p")
    if (!fs.rename(staged, p))
      sys.error(s"GraftOptions: cannot publish $p")
  }
}

object GraftOptions {
  def empty: GraftOptions = new GraftOptions(Map.empty)

  def apply(defaults: Map[String, String]): GraftOptions =
    new GraftOptions(defaults)

  /** Load from a properties file written by [[GraftOptions.save]]; an
    * absent file is an empty store (a fresh job).
    */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): GraftOptions = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) empty
    else {
      val in = fs.open(p)
      try {
        val props = new java.util.Properties()
        props.load(in)
        val m = scala.jdk.CollectionConverters
          .PropertiesHasAsScala(props).asScala.toMap
        new GraftOptions(m)
      } finally in.close()
    }
  }
}
