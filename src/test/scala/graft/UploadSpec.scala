package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.operators.Versioned
import graft.sources._

/** End-to-end upload pipeline: repository discovery → level-0 load →
  * level-5 change applies → bookkeeping, count checks and revision history
  * — the reference's `ApplyUpdates` loop on synthetic BDE data.
  */
class UploadSpec extends SparkSpec {

  private def put(path: String, text: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, text.stripMargin.getBytes(StandardCharsets.UTF_8))
  }

  private def mkRepo(): String = {
    val root = Files.createTempDirectory("graft-upload").toString
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
        |5|e|50.0|
        |6|f|60.0|
        |""")
    put(s"$root/level_5/20240102000000/xaud.crs",
      """TABLE cbe_data
        |COLUMN id integer NOT NULL
        |COLUMN tablename varchar NOT NULL
        |COLUMN tablekeyvalue integer NOT NULL
        |COLUMN action char NOT NULL
        |COLUMN timestamp datetime NOT NULL
        |{CRS-DATA}
        |1|orders|7|I|2024-01-02 00:00:01|
        |2|orders|2|U|2024-01-02 00:00:01|
        |3|orders|5|D|2024-01-02 00:00:01|
        |4|other_table|99|I|2024-01-02 00:00:01|
        |""")
    put(s"$root/level_5/20240102000000/ord.crs",
      """TABLE orders
        |COLUMN id bigint NOT NULL
        |COLUMN v varchar NULL
        |COLUMN price double NULL
        |{CRS-DATA}
        |7|g|70.0|
        |2|b|21.0|
        |""")
    root
  }

  private val Config = """
    TABLE l5_change_table                       files xaud
    TABLE orders  key=id  row_tol=0.5,0.4      files ord
  """

  test("upload run: L0 load + L5 change apply, bookkeeping, checks, history") {
    val root = mkRepo()
    val result = Upload.run(spark, root, BdeConfig.parseTables(Config))
    val orders = result("orders")

    // final table: 5 deleted, 2 updated, 7 inserted
    val cur = orders.current.collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(cur == Map(1L -> 10.0, 2L -> 21.0, 3L -> 30.0, 4L -> 40.0,
      6L -> 60.0, 7L -> 70.0))

    // bookkeeping: one row per (dataset, apply)
    val bk = orders.bookkeeping.collect()
      .map(r => r.getAs[String]("dataset") ->
        (r.getAs[Long]("n_insert"), r.getAs[Long]("n_update"),
          r.getAs[Long]("n_null_update"), r.getAs[Long]("n_delete"))).toMap
    assert(bk("20240101000000") == ((6L, 0L, 0L, 0L)))
    assert(bk("20240102000000") == ((1L, 1L, 0L, 1L)))

    // count checks graded against the configured tolerances
    val checks = orders.countChecks.collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[String]("status")).toMap
    assert(checks.values.forall(_ == "ok"), checks.toString)

    // revision history: r1 is the pre-apply table, diff r1→r2 is the change
    val r1 = Versioned.atRevision(orders.versioned, 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(r1 == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0,
      5L -> 50.0, 6L -> 60.0))
    val d = Versioned.diff(orders.versioned, 1, 2, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "U", 5L -> "D", 7L -> "I"))
  }

  test("change keys for other tables do not leak into the apply") {
    val root = mkRepo()
    val result = Upload.run(spark, root, BdeConfig.parseTables(Config))
    // key 99 was announced for other_table only — must not appear anywhere
    assert(!result("orders").current.collect().exists(_.getLong(0) == 99L))
  }

  test("post-load hooks fire per level with the full apply context") {
    val root = mkRepo()
    val applies = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    val level0s = scala.collection.mutable.ArrayBuffer[Int]()
    val uploads = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    Upload.run(spark, root, BdeConfig.parseTables(Config),
      postApply = Seq(ev => { applies += ((ev.dataset, ev.level)): Unit }),
      postLevel0 = Seq(ev => {
        assert(ev.previous.isEmpty && ev.actions.isEmpty,
          "a fresh level-0 snapshot has no delta")
        level0s += ev.level: Unit
      }),
      postUpload = Seq(ev => { uploads += ((ev.dataset, ev.level)): Unit }))
    // postApply: once per apply, in dataset order, with the right level
    assert(applies.toSeq ==
      Seq(("20240101000000", 0), ("20240102000000", 5)))
    assert(level0s.toSeq == Seq(0), "postLevel0 fires exactly once, at L0")
    // postUpload: once, carrying the LAST apply's context
    assert(uploads.toSeq == Seq(("20240102000000", 5)))
  }

  test("hook-maintained aggregate tracks the table through the L5 apply") {
    val root = mkRepo()
    var state: org.apache.spark.sql.DataFrame = null
    val maintain: Upload.PostApplyHook = ev =>
      state =
        if (ev.level == 0) operators.Merge.aggState(ev.current, "v", "price")
        else operators.Merge.incrementalAgg(state, ev.previous.get,
          ev.incoming.get, ev.actions.get, "id", "v", "price")
    val result = Upload.run(spark, root, BdeConfig.parseTables(Config),
      postApply = Seq(maintain))
    // the incrementally-maintained aggregate == a fresh scan of the final
    // table (level-5 actions flowed through the hook exactly once)
    val direct = operators.Merge
      .aggState(result("orders").current, "v", "price")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSet
    val maintained = state.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDecimal(2).doubleValue)).toSet
    assert(maintained == direct)
  }

  test("l5_only tables refuse to run without a seeded previous upload") {
    val root = mkRepo()
    val cfg = BdeConfig.parseTables(
      "TABLE orders key=id l5_only files ord")
    val e = intercept[IllegalStateException] {
      Upload.run(spark, root, cfg)
    }
    assert(e.getMessage.contains("l5_only"))
  }

  // ------------------------------------------- persisted-state resume

  private def putD2(root: String): Unit = {
    put(s"$root/level_5/20240103000000/xaud.crs",
      """TABLE cbe_data
        |COLUMN id integer NOT NULL
        |COLUMN tablename varchar NOT NULL
        |COLUMN tablekeyvalue integer NOT NULL
        |COLUMN action char NOT NULL
        |COLUMN timestamp datetime NOT NULL
        |{CRS-DATA}
        |1|orders|8|I|2024-01-03 00:00:01|
        |2|orders|3|U|2024-01-03 00:00:01|
        |3|orders|1|D|2024-01-03 00:00:01|
        |""")
    put(s"$root/level_5/20240103000000/ord.crs",
      """TABLE orders
        |COLUMN id bigint NOT NULL
        |COLUMN v varchar NULL
        |COLUMN price double NULL
        |{CRS-DATA}
        |8|h|80.0|
        |3|c|31.0|
        |""")
  }

  test("seeded resume run matches the single uninterrupted run") {
    // full run: D0 + D1 + D2 in one process
    val rootFull = mkRepo(); putD2(rootFull)
    val full = Upload.run(spark, rootFull, BdeConfig.parseTables(Config))
    // run #1: D0 + D1 only, publish its state
    val rootA = mkRepo()
    val store = Files.createTempDirectory("graft-resume-store").toString
    val r1 = Upload.run(spark, rootA, BdeConfig.parseTables(Config))
    Upload.publishState(r1("orders").current, "20240102000000", store)
    // run #2: a repo holding ONLY the later D2, table registered l5_only
    val rootB = Files.createTempDirectory("graft-resume-b").toString
    putD2(rootB)
    val seed = Upload.seedFrom(spark, store)
    assert(seed.lastDataset == "20240102000000")
    val cfg2 = BdeConfig.parseTables("""
      TABLE l5_change_table               files xaud
      TABLE orders  l5_only  key=id      files ord
    """)
    val r2 = Upload.run(spark, rootB, cfg2, seeds = Map("orders" -> seed))
    val got = r2("orders").current.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val want = full("orders").current.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got == want)
    // run #2's bookkeeping covers exactly the one new dataset
    val bk = r2("orders").bookkeeping.collect()
      .map(r => r.getAs[String]("dataset") ->
        (r.getAs[Long]("n_insert"), r.getAs[Long]("n_update"),
          r.getAs[Long]("n_null_update"), r.getAs[Long]("n_delete"))).toMap
    assert(bk == Map("20240103000000" -> ((1L, 1L, 0L, 1L))))
    // versioned history: rev 1 = the seed, diff 1→2 = the D2 changes
    val d = operators.Versioned.diff(r2("orders").versioned, 1, 2, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(8L -> "I", 3L -> "U", 1L -> "D"))
  }

  test("a level-0 newer than the seed supersedes it") {
    val root = mkRepo()
    val unseeded = Upload.run(spark, root, BdeConfig.parseTables(Config))
    // a stale seed (pre-D0 timestamp, deliberately wrong content) must be
    // ignored: the newest level-0 snapshot wins, as in GetLevel0Updates
    import spark.implicits._
    val bogus = Seq((99L, "z", 0.0)).toDF("id", "v", "price")
    val seeded = Upload.run(spark, root, BdeConfig.parseTables(Config),
      seeds = Map("orders" -> UploadSeed(bogus, "20231231000000")))
    assert(seeded("orders").current.collect().map(_.getLong(0)).sorted.toSeq ==
      unseeded("orders").current.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("seeded run with no newer datasets returns the seed, zero bookkeeping") {
    val rootB = Files.createTempDirectory("graft-resume-empty").toString
    putD2(rootB)
    import spark.implicits._
    val seedDf = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "v", "price")
    val cfg2 = BdeConfig.parseTables("""
      TABLE l5_change_table               files xaud
      TABLE orders  l5_only  key=id      files ord
    """)
    // seed is AT the only available dataset — nothing newer to apply
    val r = Upload.run(spark, rootB, cfg2,
      seeds = Map("orders" -> UploadSeed(seedDf, "20240103000000")))
    assert(r("orders").current.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
    val bk = r("orders").bookkeeping.collect()
    assert(bk.length == 1 && bk.head.getAs[Long]("n_insert") == 0L &&
      bk.head.getAs[Long]("n_delete") == 0L)
  }

  test("job lock: single writer, stale locks broken, withLock releases") {
    val dir = Files.createTempDirectory("graft-lock").toString
    assert(JobLock.acquire(dir, "job-a", ttlMs = 60000))
    assert(!JobLock.acquire(dir, "job-b", ttlMs = 60000), "second writer must fail")
    assert(JobLock.holder(dir).map(_._1).contains("job-a"))
    assert(!JobLock.release(dir, "job-b"), "only the owner releases")
    assert(JobLock.release(dir, "job-a"))
    // stale lock: ttl 0 means any existing lock is a zombie
    assert(JobLock.acquire(dir, "job-c", ttlMs = 60000))
    assert(JobLock.acquire(dir, "job-d", ttlMs = 0), "zombie lock must break")
    JobLock.release(dir, "job-d")
    // withLock runs the body and always releases
    val got = JobLock.withLock(dir, "job-e")(42)
    assert(got == 42 && JobLock.holder(dir).isEmpty)
    JobLock.acquire(dir, "job-f", ttlMs = 60000)
    intercept[IllegalStateException] {
      JobLock.withLock(dir, "job-g")(0)
    }
  }
}
