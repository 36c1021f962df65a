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
    assert(st("2_merge").contains("""ON CONFLICT ("k1", "k2")"""))
    assertThrows[IllegalArgumentException] {
      JdbcUpsert.statements("t", Seq("a"), Seq("missing"))
    }
  }
}
