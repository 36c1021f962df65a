package graft

import graft.operators.{Merge, MergeScenarios}
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("diffActions classifies I/U/D/0 on a crafted frame") {
    val cur = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("k", "s", "v")
    val snap = Seq((2, "b", 20), (3, "c", 99), (4, "d", 40)).toDF("k", "s", "v")
    val acts = Merge.diffActions(cur, snap, "k").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(acts == Map(1 -> "D", 2 -> "0", 3 -> "U", 4 -> "I"))
  }

  test("changesetActions honors announced keys and X on unique change") {
    val cur = Seq((1, 100, "x"), (2, 200, "y"), (3, 300, "z")).toDF("k", "u", "v")
    val inc = Seq((2, -2, "y"), (3, 300, "zz"), (4, 400, "w"), (9, 900, "q"))
      .toDF("k", "u", "v")
    // key 9 announced nowhere; key 1 announced but has no image -> D;
    // key 5 announced but on neither side -> dropped
    val chg = Seq(1, 2, 3, 4, 5).toDF("k")
    val acts = Merge.changesetActions(cur, inc, chg, "k", Seq("u")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(acts == Map(1 -> "D", 2 -> "X", 3 -> "U", 4 -> "I"))
  }

  test("applyActions produces the post-merge table") {
    val cur = Seq((1, 100, "x"), (2, 200, "y"), (3, 300, "z")).toDF("k", "u", "v")
    val inc = Seq((2, -2, "y"), (3, 300, "zz"), (4, 400, "w")).toDF("k", "u", "v")
    val chg = Seq(1, 2, 3, 4).toDF("k")
    val acts = Merge.changesetActions(cur, inc, chg, "k", Seq("u"))
    val merged = Merge.applyActions(cur, inc, acts, "k")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(merged == Set((2, -2, "y"), (3, 300, "zz"), (4, 400, "w")))
  }

  test("missedKeyChanges finds re-keyed rows not in the change set") {
    val cur = Seq((1, 100), (2, 200), (3, 300)).toDF("k", "u")
    val inc = Seq((11, 100), (12, 200)).toDF("k", "u") // re-keys rows 1 and 2
    val chg = Seq(11, 12, 2).toDF("k") // row 2's old key already announced
    val missed = Merge.missedKeyChanges(cur, inc, chg, "k", Seq("u"))
      .as[Int].collect().toSet
    assert(missed == Set(1))
  }

  test("scenario counts cover every action type") {
    val n = MergeScenarios.mergeCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n.keySet == Set("0", "D", "I", "U", "X"))
    assert(n.values.forall(_ > 0))
  }

  test("rowCountChecks grades ok/warn/error") {
    val checks = Seq(("same", 100L, 100L), ("warnish", 100L, 95L),
      ("bad", 100L, 50L)).toDF("check_name", "expected_count", "actual_count")
    val byName = Merge.rowCountChecks(checks, 0.02, 0.15).collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(byName == Map("same" -> "ok", "warnish" -> "warn", "bad" -> "error"))
  }

  test("scenario merged table equals cur-minus-changes plus images") {
    val merged = MergeScenarios.applyChangeset(spark, sf)
    val curN = MergeScenarios.cur(spark, sf).count()
    val counts = MergeScenarios.mergeCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.count() == curN + counts("I") - counts("D"))
    // keys stay unique through the apply
    assert(merged.select("o_orderkey").distinct().count() == merged.count())
  }

  test("applyWithBookkeeping persists the stats row alongside the result") {
    val cur = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val inc = Seq((2L, "b2"), (4L, "d")).toDF("id", "v")
    val keys = Seq(2L, 3L, 4L).toDF("id")
    val actions = Merge.changesetActions(cur, inc, keys, "id")
    val (merged, stats) =
      Merge.applyWithBookkeeping(cur, inc, actions, "id", "20240101000000", "t")
    val path = java.nio.file.Files.createTempDirectory("graft-apply").toString
    graft.sources.ParquetSink.writeApplyResult(merged, stats, path)
    // second dataset: bookkeeping accumulates by partition
    graft.sources.ParquetSink.writeApplyResult(merged,
      Merge.bookkeeping(actions, "20240102000000", "t"), path)
    val data = spark.read.parquet(s"$path/data")
    assert(data.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b2", 4L -> "d")) // U applied, D removed, I added
    val bk = spark.read.parquet(s"$path/bookkeeping")
    assert(bk.count() == 2) // one stats row per dataset apply, appended
    val row = bk.filter(bk("dataset") === "20240101000000").collect().head
    assert(row.getAs[Long]("n_insert") == 1 && row.getAs[Long]("n_update") == 1
      && row.getAs[Long]("n_delete") == 1)
    assert(row.getAs[Double]("duration_secs") > 0.0)
  }

  test("incrementalJoin equals a fresh join over the applied table") {
    val cur = operators.MergeScenarios.cur(spark, sf)
    val inc = operators.MergeScenarios.incoming(spark, sf)
    val actions = Merge.changesetActions(cur, inc,
      operators.MergeScenarios.changeKeys(spark, sf), "o_orderkey",
      uniqueCols = Seq("o_uniq"))
    val dim = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    def joined(f: org.apache.spark.sql.DataFrame) =
      f.join(dim, f("o_custkey") === dim("c_custkey"))
        .select((f.columns.map(col) :+ col("c_mktsegment")).toIndexedSeq: _*)
    val maintained = Merge.incrementalJoin(joined(cur), inc, actions,
      "o_orderkey", dim, "c_custkey", "o_custkey")
    val fresh = joined(Merge.applyActions(cur, inc, actions, "o_orderkey"))
    assert(maintained.exceptAll(fresh).isEmpty &&
      fresh.exceptAll(maintained).isEmpty)
  }

  test("invertActions rolls an apply back to the exact pre-apply table") {
    val cur = operators.MergeScenarios.cur(spark, sf)
    val inc = operators.MergeScenarios.incoming(spark, sf)
    val actions = Merge.changesetActions(cur, inc,
      operators.MergeScenarios.changeKeys(spark, sf), "o_orderkey",
      uniqueCols = Seq("o_uniq"))
    val applied = Merge.applyActions(cur, inc, actions, "o_orderkey")
    // the apply must actually change something for the rollback to be real
    assert(applied.exceptAll(cur).count() > 0)
    val reverted = Merge.applyActions(applied, cur,
      Merge.invertActions(actions), "o_orderkey")
    assert(reverted.exceptAll(cur).isEmpty && cur.exceptAll(reverted).isEmpty)
  }
}
