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
