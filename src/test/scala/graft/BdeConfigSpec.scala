package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources._

class BdeConfigSpec extends SparkSpec {

  test("parseTables: options, levels, files, key and tolerances") {
    val defs = BdeConfig.parseTables("""
      # comment
      TABLE l5_change_table                              files xaud
      TABLE orders   key=o_orderkey row_tol=0.15,0.02    files ord
      TABLE lineitem key=l_orderkey l0_only              files lin1 lin2
      COLUMN l_orderkey bigint
      COLUMN l_comment varchar
      TABLE events   l5_is_full                          files ev
    """)
    assert(defs.map(_.name) == Seq("l5_change_table", "orders", "lineitem", "events"))
    val byName = defs.map(t => t.name -> t).toMap
    assert(byName("l5_change_table").levels == Set("C"))
    assert(byName("orders").keyColumn.contains("o_orderkey"))
    assert(byName("orders").rowTolError.contains(0.15))
    assert(byName("orders").rowTolWarning.contains(0.02))
    assert(byName("orders").levels == Set("0", "5"))
    assert(byName("lineitem").levels == Set("0"))
    assert(byName("lineitem").files == Seq("lin1", "lin2"))
    assert(byName("lineitem").columns ==
      Seq("l_orderkey bigint", "l_comment varchar"))
    assert(byName("events").level5IsFull)
  }

  test("parseTables: errors accumulate (no files, bad tol, duplicate level)") {
    val bad = """
      TABLE t1 key=id
      TABLE t2 row_tol=1.5,0.5 files f2
      TABLE t2 files f3
    """
    val e = intercept[IllegalArgumentException](BdeConfig.parseTables(bad))
    assert(e.getMessage.contains("no files defined for table t1"))
    assert(e.getMessage.contains("error tolerance invalid for table t2"))
    assert(e.getMessage.contains("definition for t2 level 0 repeated"))
  }

  test("parseTables: unknown options warn, never fail (legacy configs)") {
    val (defs, warnings) = BdeConfig.parseTablesWithWarnings(
      "TABLE t1 key=id shiny_new_option files f1")
    assert(defs.map(_.name) == Seq("t1"))
    assert(defs.head.keyColumn.contains("id"))
    assert(warnings.exists(_.contains("shiny_new_option")))
  }

  test("parseTables: l5_change_table is level C even with a level option") {
    val defs = BdeConfig.parseTables("TABLE l5_change_table l5_only files xaud")
    assert(defs.head.levels == Set("C"),
      "the change-table record must stay level C after option processing")
  }

  test("parseTables: the reference's real tables.conf parses faithfully") {
    val text = new String(Files.readAllBytes(
      Paths.get("/root/reference/conf/tables.conf")), StandardCharsets.UTF_8)
    val defs = BdeConfig.parseTables(text)
    assert(defs.length == 100, s"expected the full registry, got ${defs.length}")
    assert(defs.forall(_.files.nonEmpty))
    val byName = defs.map(t => t.name -> t).toMap
    assert(byName("l5_change_table").levels == Set("C"))
    assert(byName("crs_action").keyColumn.contains("audit_id"))
    assert(byName("crs_action").rowTolError.contains(0.20))
    assert(byName("crs_action").rowTolWarning.contains(0.95))
  }

  test("parseErrorPolicy: the reference's main conf yields its documented defaults") {
    val text = new String(Files.readAllBytes(
      Paths.get("/root/reference/conf/linz_bde_uploader.conf")),
      StandardCharsets.UTF_8)
    val p = BdeConfig.parseErrorPolicy(text)
    assert(p.columnCount == BdeErrorAction.Error)
    assert(p.dateRange == BdeErrorAction.Warning)
    assert(p.maxErrors == 0)
    assert(p.minimumYear == 0)
    assert(p.invalidDatetimeString == "1800-01-01 00:00:00")
    assert(p.invalidDateString == "01/01/1800")
  }

  // ------------------------------------------------------ reader error policy

  private def writeCrs(name: String, rows: Seq[String]): String = {
    val header = Seq(
      "HEDR\t 2.0.0",
      "START\t 2020-01-01 00:00:00",
      "END\t 2020-01-02 00:00:00",
      "TABLE\tt",
      "COLUMN\t id integer NULL",
      "COLUMN\t at datetime NULL",
      "COLUMN\t v varchar NULL",
      "{CRS-DATA}")
    val dir = Files.createDirectories(
      Paths.get(s"${sys.props("java.io.tmpdir")}/graft-bde-policy"))
    val f = dir.resolve(name)
    Files.write(f, (header ++ rows).mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  private val Mixed = Seq(
    "1|2020-05-01 10:00:00|a|",
    "2|2020-05-02 10:00:00|b|extra|", // column_count error
    "3|2020-05-03 10:00:00|c|",
    "4|2020-05-04 10:00:00|",         // column_count error (2 fields)
    "5|1799-12-31 23:59:59|old|")     // date below minimum_year when set

  test("error policy: default budget 0 aborts on the first bad row") {
    val f = writeCrs("strict.crs", Mixed)
    val e = intercept[org.apache.spark.SparkException] {
      sources.BdeReader.read(spark, Seq(f)).collect()
    }
    assert(e.getMessage.contains("max_errors") ||
      Option(e.getCause).exists(_.getMessage.contains("max_errors")))
  }

  test("error policy: ignore/warning drop bad rows and keep loading") {
    val f = writeCrs("lenient.crs", Mixed)
    for (action <- Seq(BdeErrorAction.Ignore, BdeErrorAction.Warning)) {
      val got = sources.BdeReader.read(spark, Seq(f),
        policy = BdeErrorPolicy(columnCount = action))
        .collect().map(_.getInt(0)).sorted
      assert(got.sameElements(Array(1, 3, 5)), s"action=$action got ${got.toSeq}")
    }
  }

  test("error policy: error budget tolerates up to max_errors, then aborts") {
    val f = writeCrs("budget.crs", Mixed)
    val ok = sources.BdeReader.read(spark, Seq(f),
      policy = BdeErrorPolicy(maxErrors = 2))
      .collect().map(_.getInt(0)).sorted
    assert(ok.sameElements(Array(1, 3, 5)))
    intercept[org.apache.spark.SparkException] {
      sources.BdeReader.read(spark, Seq(f),
        policy = BdeErrorPolicy(maxErrors = 1)).collect()
    }
  }

  test("error policy: fatal aborts immediately") {
    val f = writeCrs("fatal.crs", Mixed)
    intercept[org.apache.spark.SparkException] {
      sources.BdeReader.read(spark, Seq(f),
        policy = BdeErrorPolicy(columnCount = BdeErrorAction.Fatal,
          maxErrors = 100)).collect()
    }
  }

  test("error policy: minimum_year substitutes the invalid datetime") {
    val f = writeCrs("dates.crs", Mixed)
    val got = sources.BdeReader.read(spark, Seq(f),
      policy = BdeErrorPolicy(columnCount = BdeErrorAction.Ignore,
        minimumYear = 1900))
      .collect().sortBy(_.getInt(0))
    val sub = got.find(_.getInt(0) == 5).get
      .getAs[java.time.LocalDateTime]("at")
    assert(sub.toString == "1800-01-01T00:00")
    // in-range dates untouched
    assert(got.head.getAs[java.time.LocalDateTime]("at").getYear == 2020)
  }

  // ----------------------------------------------- per-file schema reconcile

  test("mixed column order and missing columns reconcile per file") {
    val dir = Files.createDirectories(
      Paths.get(s"${sys.props("java.io.tmpdir")}/graft-bde-mixed"))
    def put(name: String, text: String): String = {
      val f = dir.resolve(name)
      Files.write(f, text.getBytes(StandardCharsets.UTF_8)); f.toString
    }
    val fa = put("a.crs",
      """TABLE t
        |COLUMN id integer NULL
        |COLUMN name varchar NULL
        |COLUMN score double NULL
        |{CRS-DATA}
        |1|alpha|1.5|
        |""".stripMargin)
    // file b: different order, no score column, one extra unknown column
    val fb = put("b.crs",
      """TABLE t
        |COLUMN name varchar NULL
        |COLUMN legacy varchar NULL
        |COLUMN id integer NULL
        |{CRS-DATA}
        |beta|junk|2|
        |""".stripMargin)
    val target = sources.BdeReader.header(fa).schema
    val got = sources.BdeReader.read(spark, Seq(fa, fb), Some(target))
      .collect().sortBy(_.getInt(0))
    assert(got.length == 2)
    assert(got(0).getString(1) == "alpha" && got(0).getDouble(2) == 1.5)
    assert(got(1).getString(1) == "beta" && got(1).isNullAt(2)) // score absent
  }

  // ---------------------------------------------------- repository discovery

  test("repository discovery: datasets, completeness, apply plan") {
    import java.nio.file.StandardOpenOption
    val root = Files.createTempDirectory("graft-repo").toString
    def mkDataset(level: Int, name: String, start: String, end: String,
                  prefixes: Seq[String]): Unit = {
      val d = Paths.get(s"$root/level_$level/$name")
      Files.createDirectories(d)
      prefixes.foreach { pre =>
        val text =
          s"""TABLE $pre
             |START\t $start
             |END\t $end
             |COLUMN id integer NULL
             |{CRS-DATA}
             |1|
             |""".stripMargin
        Files.write(d.resolve(s"$pre.crs"),
          text.getBytes(StandardCharsets.UTF_8), StandardOpenOption.CREATE)
      }
    }
    mkDataset(0, "20240101000000", "2024-01-01 00:00:00", "2024-01-02 00:00:00",
      Seq("ord", "xaud"))
    mkDataset(0, "20240201000000", "2024-02-01 00:00:00", "2024-02-02 00:00:00",
      Seq("ord", "xaud"))
    mkDataset(5, "20240202000000", "2024-02-02 00:00:00", "2024-02-03 00:00:00",
      Seq("ord", "xaud"))
    // starts 12h after the previous dataset ends → continuity breach
    mkDataset(5, "20240203120000", "2024-02-03 12:00:00", "2024-02-04 00:00:00",
      Seq("ord")) // xaud missing
    // a non-dataset directory is skipped
    Files.createDirectories(Paths.get(s"$root/level_5/not_a_dataset"))

    val ds = sources.BdeRepository.datasets(root)
    assert(ds.map(_.name) == Seq("20240101000000", "20240201000000",
      "20240202000000", "20240203120000"))

    val tables = sources.BdeConfig.parseTables("""
      TABLE l5_change_table files xaud
      TABLE orders key=o_orderkey files ord
    """)
    assert(sources.BdeRepository.missingFiles(ds.head, tables).isEmpty)
    assert(sources.BdeRepository.missingFiles(ds.last, tables) == Seq("xaud"))

    val plan = sources.BdeRepository.applyPlanFrom(spark, root)
      .collect().sortBy(_.getAs[Int]("apply_order"))
    // newest L0 (Feb) + the two later L5s; the Jan L0 is skipped
    assert(plan.map(_.getAs[String]("name")).toSeq ==
      Seq("20240201000000", "20240202000000", "20240203120000"))
    assert(plan.map(_.getAs[Boolean]("continuity_ok")).toSeq ==
      Seq(true, true, false)) // the last L5 starts 12h late
  }

  test("option store: reference set/get semantics, persisted across loads") {
    val o = sources.GraftOptions(Map("mode" -> "full"))
    assert(o.get("mode").contains("full"))
    assert(o.get("absent").isEmpty)
    assert(o.getOrElse("absent", "dflt") == "dflt")
    // upsert returns 1; delete-by-null returns 1 when present, 0 when not
    assert(o.set("mode", "incremental") == 1)
    assert(o.set("retries", "3") == 1)
    assert(o.set("mode", None) == 1)
    assert(o.set("mode", None) == 0)
    assert(o.get("mode").isEmpty && o.get("retries").contains("3"))

    // survives a save/load cycle (separate JVM steps of a real run)
    val path = java.nio.file.Files
      .createTempDirectory("graft-opts").toString + "/options.properties"
    o.save(spark, path)
    val o2 = sources.GraftOptions.load(spark, path)
    assert(o2.toMap == Map("retries" -> "3"))
    // replace-in-place publishes the new state
    o2.set("retries", "5")
    o2.save(spark, path)
    assert(sources.GraftOptions.load(spark, path).get("retries").contains("5"))
    // absent file = fresh empty store
    assert(sources.GraftOptions.load(spark, path + ".nope").toMap.isEmpty)
  }
}
