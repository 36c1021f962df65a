package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Connection coordinates for a PostgreSQL server reachable through the
  * `psql` client (unix socket or host). Serializable so executors can open
  * their own COPY streams.
  */
case class PgConn(host: String, port: Int, user: String, db: String) {
  def psqlCmd: Seq[String] = Seq(
    "psql", "-h", host, "-p", port.toString, "-U", user, "-d", db,
    "-X", "-q", "-v", "ON_ERROR_STOP=1")
}

/** PostgreSQL bulk-load path over `COPY FROM STDIN` text streams.
  *
  * The reference's actual load pipeline is a text stream piped into PG
  * (`bde_copy` emits COPY text that `lib/LINZ/Bde.pm` / the uploader feed
  * to the server), not row-at-a-time inserts. This sink mirrors that:
  * every partition opens its own `psql` COPY stream, so a 1000-executor
  * load is 1000 parallel server-side COPY commands — the fastest
  * supported way into PG, with no driver round-trip and no per-row
  * statement overhead. The post-load merge is the same set-based
  * statement list as [[JdbcUpsert.statements]], executed once on the
  * server.
  *
  * Reference: `bde_copy` output format and the uploader's COPY usage
  * (`lib/LINZ/BdeUpload.pm`), PG COPY text format rules (tab delimiter,
  * `\N` null, backslash escapes).
  */
object PgCopy {

  private def q(ident: String): String = "\"" + ident + "\""

  /** PG column type for a Spark field (the subset graft's tables use). */
  def pgType(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType => "integer"
    case ShortType => "smallint"
    case ByteType => "smallint"
    case DoubleType => "double precision"
    case FloatType => "real"
    case d: DecimalType => s"numeric(${d.precision},${d.scale})"
    case StringType => "text"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case BinaryType => "bytea"
    case ArrayType(e, _) => s"${pgType(e)}[]"
    case other => throw new IllegalArgumentException(s"no PG type for $other")
  }

  def createTableSql(table: String, schema: StructType,
                     keys: Seq[String] = Nil): String = {
    val cols = schema.fields.map(f => s"${q(f.name)} ${pgType(f.dataType)}")
    val pk = if (keys.isEmpty) Nil
             else Seq(s"PRIMARY KEY (${keys.map(q).mkString(", ")})")
    s"CREATE TABLE ${q(table)} (${(cols ++ pk).mkString(", ")})"
  }

  /** One cell in COPY text format (pre-escape; [[escape]] runs after). */
  private def cellText(v: Any): String = v match {
    case s: String => s
    case b: Boolean => if (b) "t" else "f"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case t: java.sql.Timestamp => t.toString
    case t: java.time.LocalDateTime => t.toString // ISO-8601 'T' accepted
    case t: java.time.Instant => t.toString
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case b: Array[Byte] => "\\x" + b.map("%02x".format(_)).mkString
    case a: scala.collection.Seq[_] =>
      // numeric arrays only (embeddings); strings would need array quoting
      a.map(cellText).mkString("{", ",", "}")
    case other => other.toString
  }

  /** COPY text-format escapes: backslash, tab (delimiter), LF, CR. */
  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** A full COPY line for a row (visible for the escaping spec). */
  def copyLine(row: Row): String = {
    val cells = new Array[String](row.length)
    var i = 0
    while (i < row.length) {
      cells(i) = if (row.isNullAt(i)) "\\N" else escape(cellText(row.get(i)))
      i += 1
    }
    cells.mkString("\t")
  }

  /** Distributed load: every partition streams its rows into its own
    * server-side `COPY table FROM STDIN` command. Task failure → non-zero
    * psql exit → task retry, and COPY is transactional per stream, so a
    * retried task never half-loads (load into a fresh stage table for
    * exactly-once into the target).
    */
  def copyInto(df: DataFrame, pg: PgConn, table: String): Unit = {
    val cmd = pg.psqlCmd :+ "-c" :+ s"COPY ${q(table)} FROM STDIN"
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pb = new ProcessBuilder(cmd: _*)
        pb.redirectErrorStream(true)
        val p = pb.start()
        val out = new BufferedWriter(new OutputStreamWriter(
          p.getOutputStream, StandardCharsets.UTF_8))
        try {
          rows.foreach { r => out.write(copyLine(r)); out.write('\n') }
        } finally out.close()
        val output = new String(p.getInputStream.readAllBytes(),
          StandardCharsets.UTF_8)
        val rc = p.waitFor()
        require(rc == 0, s"COPY into $table failed (rc=$rc): $output")
      }
    }
  }

  /** Driver-side SQL batch through one psql invocation (ON_ERROR_STOP). */
  def runSql(pg: PgConn, sql: String): String = {
    val pb = new ProcessBuilder((pg.psqlCmd :+ "-At"): _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new BufferedWriter(new OutputStreamWriter(
      p.getOutputStream, StandardCharsets.UTF_8))
    try { out.write(sql); out.write('\n') } finally out.close()
    val output = new String(p.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    require(p.waitFor() == 0, s"psql failed: $output")
    output
  }

  /** End-to-end upsert into a live server: distributed COPY into fresh
    * stage tables, then the exact [[JdbcUpsert.statements]] merge in one
    * transaction. The target table (with its key constraint) must exist —
    * [[createTableSql]] builds it from the frame's schema.
    */
  def upsertViaCopy(df: DataFrame, pg: PgConn, target: String,
                    keys: Seq[String],
                    deletes: Option[DataFrame] = None): Unit = {
    val stage = s"${target}_stage"
    runSql(pg,
      s"""DROP TABLE IF EXISTS ${q(stage)};
         |CREATE TABLE ${q(stage)} (LIKE ${q(target)} INCLUDING DEFAULTS);
         |DROP TABLE IF EXISTS ${q(s"${stage}_deletes")};""".stripMargin)
    deletes.foreach { d =>
      runSql(pg, createTableSql(s"${stage}_deletes", d.schema))
    }
    copyInto(df, pg, stage)
    deletes.foreach(copyInto(_, pg, s"${stage}_deletes"))
    val merge = JdbcUpsert
      .statements(target, df.columns.toSeq, keys, deleteKeys = deletes.nonEmpty)
      .map(_._2).mkString(";\n")
    runSql(pg, s"BEGIN;\n$merge;\nCOMMIT;")
  }
}
