package graft

import graft.sources.JdbcUpsert

class JdbcUpsertSpec extends SparkSpec {

  test("statements: merge upserts every non-key column, quoted") {
    val st = JdbcUpsert.statements("tgt", Seq("id", "a", "b"), Seq("id")).toMap
    val merge = st("2_merge")
    assert(merge.contains("""INSERT INTO "tgt" ("id", "a", "b")"""))
    assert(merge.contains("""ON CONFLICT ("id") DO UPDATE SET"""))
    assert(merge.contains(""""a" = EXCLUDED."a", "b" = EXCLUDED."b""""))
    assert(!merge.contains(""""id" = EXCLUDED"""))
    assert(st("3_cleanup") == """DROP TABLE IF EXISTS "tgt_stage"""")
  }

  test("statements: composite keys and delete stage") {
    val st = JdbcUpsert.statements("t", Seq("k1", "k2", "v"), Seq("k1", "k2"),
      deleteKeys = true).toMap
    assert(st("1_delete").contains("""("k1", "k2") IN"""))
    // the whole deletes-stage identifier is quoted (was "t_stage"_deletes,
    // a PG syntax error)
    assert(st("1_delete").contains("""FROM "t_stage_deletes""""))
    assert(st("2_merge").contains("""ON CONFLICT ("k1", "k2")"""))
    assert(st("4_cleanup") == """DROP TABLE IF EXISTS "t_stage_deletes"""")
    assertThrows[IllegalArgumentException] {
      JdbcUpsert.statements("t", Seq("a"), Seq("missing"))
    }
  }

  test("simulateMerge: upsert replaces on key, inserts add, deletes remove") {
    import spark.implicits._
    val cur = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val stage = Seq((2L, "b2"), (4L, "d")).toDF("id", "v")
    val dels = Seq(Tuple1(3L)).toDF("id")
    val got = JdbcUpsert.simulateMerge(cur, stage, dels, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 4L -> "d"))
  }
}
