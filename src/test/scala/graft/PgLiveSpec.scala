package graft

import scala.sys.process._
import scala.util.Try

import graft.sources.{JdbcUpsert, PgConn, PgCopy}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Live-PostgreSQL integration for the COPY sink + generated merge SQL.
  *
  * Starts a throwaway server (initdb under an unprivileged user, unix
  * socket only) and proves, end-to-end on real PG:
  *   - the distributed `COPY FROM STDIN` load path,
  *   - COPY text-format escaping round-trips hostile strings,
  *   - [[JdbcUpsert.statements]] executes verbatim and its result equals
  *     [[JdbcUpsert.simulateMerge]] (the gate query's semantics).
  *
  * Cancels (not fails) when no server can start in the environment.
  */
class PgLiveSpec extends SparkSpec {

  private lazy val pg: Option[PgConn] = PgTestServer.conn

  private def withPg(body: PgConn => Unit): Unit = pg match {
    case Some(c) => body(c)
    case None => cancel("no local PostgreSQL available")
  }

  test("upsertViaCopy: distributed COPY + generated merge equals simulateMerge") {
    withPg { c =>
      import spark.implicits._
      val cur = spark.range(1, 101)
        .select(col("id"), concat(lit("v"), col("id")).as("v"),
          (col("id") * 1.5).as("x"))
      val stage = spark.range(1, 201).filter(col("id") % 10 === 0)
        .select(col("id"), lit("upd").as("v"), (col("id") * 2.5).as("x"))
      val dels = spark.range(1, 101).filter(col("id") % 13 === 0)
        .select(col("id"))

      PgCopy.runSql(c, "DROP TABLE IF EXISTS \"up_t\"")
      PgCopy.runSql(c, PgCopy.createTableSql("up_t", cur.schema, Seq("id")))
      PgCopy.copyInto(cur.repartition(4), c, "up_t")
      PgCopy.upsertViaCopy(stage, c, "up_t", Seq("id"), Some(dels))

      val got = PgCopy.runSql(c,
        "SELECT id, v, x FROM \"up_t\" ORDER BY id").trim
        .split("\n").filter(_.nonEmpty)
        .map { l => val a = l.split("\\|"); (a(0).toLong, a(1), a(2).toDouble) }
      val want = JdbcUpsert.simulateMerge(cur, stage, dels, "id")
        .orderBy("id").as[(Long, String, Double)].collect()
      assert(got.toSeq == want.toSeq)
    }
  }

  test("COPY escaping: tabs, newlines, backslashes, unicode, nulls round-trip") {
    withPg { c =>
      import spark.implicits._
      val hostile = Seq(
        (1L, "plain"),
        (2L, "tab\there"),
        (3L, "new\nline"),
        (4L, "back\\slash"),
        (5L, "cr\rreturn"),
        (6L, "uni é中😀"),
        (7L, null.asInstanceOf[String]))
      val df = hostile.toDF("id", "s")
      PgCopy.runSql(c, "DROP TABLE IF EXISTS \"esc_t\"")
      PgCopy.runSql(c, PgCopy.createTableSql("esc_t", df.schema, Seq("id")))
      PgCopy.copyInto(df, c, "esc_t")
      // read back via COPY TO (same escapes) and unescape in the spec
      val back = PgCopy.runSql(c, "COPY \"esc_t\" TO STDOUT").trim
        .split("\n").map { l =>
          val Array(id, s) = l.split("\t", 2)
          val v = if (s == "\\N") null else s
            .replace("\\t", "\t").replace("\\n", "\n")
            .replace("\\r", "\r").replace("\\\\", "\\")
          id.toLong -> v
        }.toMap
      assert(back == hostile.toMap)
    }
  }

  test("typed columns: timestamps, dates, decimals, doubles survive COPY") {
    withPg { c =>
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("ts", TimestampNTZType),
        StructField("d", DateType),
        StructField("m", DecimalType(12, 2)),
        StructField("x", DoubleType),
        StructField("b", BooleanType)))
      val rows = Seq(
        Row(1L, java.time.LocalDateTime.parse("2021-03-04T05:06:07.123456"),
          java.time.LocalDate.parse("2021-03-04"),
          new java.math.BigDecimal("12345.67"), 1.25e-3, true),
        Row(2L, null, null, null, null, null))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      PgCopy.runSql(c, "DROP TABLE IF EXISTS \"typ_t\"")
      PgCopy.runSql(c, PgCopy.createTableSql("typ_t", schema, Seq("id")))
      PgCopy.copyInto(df, c, "typ_t")
      val out = PgCopy.runSql(c,
        "SELECT id, ts, d, m, x, b FROM \"typ_t\" ORDER BY id").trim
      assert(out ==
        "1|2021-03-04 05:06:07.123456|2021-03-04|12345.67|0.00125|t\n" +
        "2|||||")
    }
  }
}

/** Lazily initdb+start a PG server for the test JVM; socket-only, data in
  * /tmp, stopped by a shutdown hook. Returns None when the environment
  * can't run one (no binaries, no unprivileged user to run as).
  */
object PgTestServer {
  private val dataDir = "/tmp/graft_pg_test"
  private val sockDir = "/tmp/graft_pg_test_sock"
  private val port = 54391

  lazy val conn: Option[PgConn] = Try(start()).toOption.flatten

  /** postgres refuses to run as root; wrap through `su nobody` if needed. */
  private def asPgUser(cmd: String): ProcessBuilder =
    if (System.getProperty("user.name") == "root")
      Process(Seq("su", "-s", "/bin/bash", "nobody", "-c", cmd), new java.io.File("/tmp"))
    else Process(Seq("/bin/bash", "-c", cmd), new java.io.File("/tmp"))

  private def start(): Option[PgConn] = {
    if (Seq("/bin/bash", "-c", "command -v initdb && command -v pg_ctl && command -v psql").!(ProcessLogger(_ => ())) != 0)
      return None
    val c = PgConn(sockDir, port, "graft", "postgres")
    val ready = Seq("pg_isready", "-h", sockDir, "-p", port.toString)
      .!(ProcessLogger(_ => ())) == 0
    if (!ready) {
      Seq("rm", "-rf", dataDir, sockDir).!
      Seq("mkdir", "-p", dataDir, sockDir).!
      if (System.getProperty("user.name") == "root")
        Seq("chown", "nobody", dataDir, sockDir).!
      val log = ProcessLogger(_ => ())
      if (asPgUser(s"initdb -D $dataDir -A trust -U graft").!(log) != 0)
        return None
      val startCmd = s"pg_ctl -D $dataDir -l $dataDir/server.log " +
        s"-o '-k $sockDir -p $port -c listen_addresses=' start"
      if (asPgUser(startCmd).!(log) != 0) return None
      sys.addShutdownHook {
        asPgUser(s"pg_ctl -D $dataDir -m immediate stop").!(log)
      }
    }
    Some(c)
  }
}
