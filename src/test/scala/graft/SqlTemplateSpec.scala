package graft

import graft.operators.Clustering
import graft.sources.{BdeConfig, SqlTemplate, Upload}
import org.apache.spark.sql.functions._

/** A two-dataset BDE repository (level-0 snapshot + one level-5 change
  * set) for hook-integration tests — the same shape UploadSpec builds.
  */
object UploadSpecHarness {
  import java.nio.charset.StandardCharsets
  import java.nio.file.{Files, Paths}

  val Config: String = """
    TABLE l5_change_table                       files xaud
    TABLE orders  key=id  row_tol=0.5,0.4      files ord
  """

  private def put(path: String, text: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, text.stripMargin.getBytes(StandardCharsets.UTF_8))
  }

  def mkRepo(s: org.apache.spark.sql.SparkSession): String = {
    val root = Files.createTempDirectory("graft-tpl-upload").toString
    put(s"$root/level_0/20240101000000/ord.crs",
      """TABLE orders
        |START  2024-01-01 00:00:00
        |END    2024-01-01 01:00:00
        |COLUMN id bigint NOT NULL
        |COLUMN v varchar NULL
        |COLUMN price double NULL
        |{CRS-DATA}
        |1|a|10.0|
        |2|b|20.0|
        |3|c|30.0|
        |4|d|40.0|
        |""")
    put(s"$root/level_5/20240102000000/xaud.crs",
      """TABLE cbe_data
        |COLUMN id integer NOT NULL
        |COLUMN tablename varchar NOT NULL
        |COLUMN tablekeyvalue integer NOT NULL
        |COLUMN action char NOT NULL
        |COLUMN timestamp datetime NOT NULL
        |{CRS-DATA}
        |1|orders|5|I|2024-01-02 00:00:01|
        |2|orders|2|U|2024-01-02 00:00:01|
        |""")
    put(s"$root/level_5/20240102000000/ord.crs",
      """TABLE orders
        |COLUMN id bigint NOT NULL
        |COLUMN v varchar NULL
        |COLUMN price double NULL
        |{CRS-DATA}
        |5|e|50.0|
        |2|b|21.0|
        |""")
    root
  }
}

/** `bde_ExpandTemplate` / `bde_ExecuteTemplate` semantics
  * (`sql/02-bde_control_functions.sql.in:2090,2114`) plus the templated
  * post-load hook, and the covariance gate's agreement with a local
  * recomputation.
  */
class SqlTemplateSpec extends SparkSpec {

  test("expand substitutes every %i% occurrence in parameter order") {
    assert(SqlTemplate.expand(
      "INSERT INTO %1%_h SELECT * FROM %1% WHERE k = %2%",
      Seq("orders", "7")) ==
      "INSERT INTO orders_h SELECT * FROM orders WHERE k = 7")
    // ten-plus params: %10% must not be clipped by the %1% pass
    // (sequential REPLACE looks for the full '%1%' token, as the reference)
    val t = (1 to 10).map(i => s"%$i%").mkString(",")
    assert(SqlTemplate.expand(t, (1 to 10).map(i => s"v$i")) ==
      (1 to 10).map(i => s"v$i").mkString(","))
  }

  test("expand keeps the reference's sequential-replace quirk") {
    // a parameter containing a LATER marker is re-substituted by that
    // later iteration — bde_ExpandTemplate loops REPLACE in order
    assert(SqlTemplate.expand("%1%", Seq("x%2%x", "Y")) == "xYx")
    // a parameter containing an EARLIER marker survives
    assert(SqlTemplate.expand("%2%", Seq("A", "x%1%x")) == "x%1%x")
  }

  test("expandCol equals driver-side expand row by row") {
    val tpl = "DELETE FROM %1% WHERE n_nationkey = %2%"
    val rows = Tables.nation(spark, sf)
      .select(col("n_name"), col("n_nationkey"),
        SqlTemplate.expandCol(lit(tpl),
          Seq(col("n_name"), col("n_nationkey").cast("string"))).as("sql"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(2) ==
        SqlTemplate.expand(tpl, Seq(r.getString(0), r.get(1).toString)))
    }
  }

  test("execute returns the statement's row count over scoped views") {
    val orders = Tables.orders(spark, sf)
    val n = SqlTemplate.withViews(spark, Map("cur_orders" -> orders)) {
      SqlTemplate.execute(spark,
        "SELECT * FROM %1% WHERE o_orderkey % 2 = 0", Seq("cur_orders"))
    }
    assert(n == orders.filter(col("o_orderkey") % 2 === 0).count())
    // the view scope is gone afterwards
    assert(!spark.catalog.tableExists("cur_orders"))
  }

  test("templated hook runs per apply with the event frames in scope") {
    val root = UploadSpecHarness.mkRepo(spark)
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    val hook = SqlTemplate.templateHook(spark,
      "SELECT * FROM current -- table %1% dataset %2% level %3%", counts)
    val result = Upload.run(spark, root,
      BdeConfig.parseTables(UploadSpecHarness.Config), postApply = Seq(hook))
    // one count per apply, keyed by (table, dataset), equal to the
    // post-apply table size at that dataset
    assert(counts.keySet.map(_._2) ==
      Set("20240101000000", "20240102000000"))
    val finalN = result("orders").current.count()
    assert(counts(("orders", "20240102000000")) == finalN)
  }

  test("execute rejects DML/DDL — the ROW_COUNT contract is query-only") {
    val orders = Tables.orders(spark, sf)
    SqlTemplate.withViews(spark, Map("cur_orders" -> orders)) {
      Seq(
        "INSERT INTO %1% VALUES (1)",
        "DELETE FROM %1% WHERE o_orderkey = 1",
        "UPDATE %1% SET o_orderkey = 2 WHERE o_orderkey = 1",
        "DROP TABLE %1%",
        "CREATE TABLE t_nope (x INT)").foreach { t =>
        val e = intercept[IllegalArgumentException] {
          SqlTemplate.execute(spark, t, Seq("cur_orders"))
        }
        assert(e.getMessage.contains("query-only"), s"template: $t")
      }
    }
    // and nothing was created or dropped by the rejected statements
    assert(!spark.catalog.tableExists("t_nope"))
  }

  test("executeAll runs a statement array in order with per-statement counts") {
    // the reference's bde_ExecuteSqlArray (sql/02:2451): one hook, an
    // ARRAY of templated statements, one logged count each
    val root = UploadSpecHarness.mkRepo(spark)
    val counts = scala.collection.mutable.Map[(String, String, Int), Long]()
    val hook = SqlTemplate.templateArrayHook(spark, Seq(
      "SELECT * FROM current -- %1% %2% %3%",
      "SELECT * FROM current WHERE id % 2 = 0",
      "SELECT count(*) FROM current"), counts)
    val result = Upload.run(spark, root,
      BdeConfig.parseTables(UploadSpecHarness.Config), postApply = Seq(hook))
    // each apply recorded exactly 3 counts, one per statement position
    val datasets = counts.keySet.map(_._2)
    assert(datasets == Set("20240101000000", "20240102000000"))
    datasets.foreach { d =>
      assert(counts.keySet.filter(_._2 == d).map(_._3) == Set(0, 1, 2), d)
    }
    val cur = result("orders").current
    assert(counts(("orders", "20240102000000", 0)) == cur.count())
    assert(counts(("orders", "20240102000000", 1)) ==
      cur.filter(col("id") % 2 === 0).count())
    assert(counts(("orders", "20240102000000", 2)) == 1L)
  }

  test("embed_covariance matches a local recomputation and is symmetric-complete") {
    val out = Clustering.embedCovariance(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == (for (i <- 1 to 8; j <- i to 8) yield (i, j)).toSet)
    // diagonal entries are variances
    (1 to 8).foreach(i => assert(out((i, i)) >= 0.0, s"var($i) >= 0"))
    // local recomputation from the same quantization (dims 1 and 2)
    val q = Tables.embeddings(spark, sf)
      .select(expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))")
        .as("q"))
      .collect().map(_.getSeq[Long](0))
    val n = q.length.toDouble
    val (s1, s2) = (q.map(_(0)).sum.toDouble, q.map(_(1)).sum.toDouble)
    val p12 = q.map(v => v(0) * v(1)).sum.toDouble
    val want = BigDecimal((p12 * n - s1 * s2) / (n * n))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out((1, 2)) - want) < 1e-9, s"${out((1, 2))} vs $want")
  }
}
