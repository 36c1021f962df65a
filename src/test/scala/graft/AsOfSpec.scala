package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: most recent right row at-or-before, nulls before history") {
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), "e1"), // before any order → null
      (1L, ts("2024-01-01 10:00:00"), "e2"), // exactly at r1 → inclusive
      (1L, ts("2024-01-01 11:30:00"), "e3"), // between r1 and r2 → r1
      (1L, ts("2024-01-01 13:00:00"), "e4"), // after r2 → r2
      (2L, ts("2024-01-01 12:00:00"), "e5")  // other key, own history
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 200L),
      (2L, ts("2024-01-01 11:00:00"), 900L)
    ).toDF("k", "rt", "v")
    val got = AsOf.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") ->
        (if (r.isNullAt(r.fieldIndex("v"))) -1L else r.getAs[Long]("v"))).toMap
    assert(got == Map("e1" -> -1L, "e2" -> 100L, "e3" -> 100L,
      "e4" -> 200L, "e5" -> 900L))
  }

  test("asofJoin plan: one shuffle on the key, no range-join blowup") {
    val plan = AsOf.asofJoinQuery(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "as-of must not plan a pairwise range join")
    // the union-window recipe: a Window over the stacked sides
    assert(plan.contains("Window"))
  }
}
