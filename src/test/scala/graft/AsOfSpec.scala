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

  test("asofJoin: a legitimately-NULL payload on the latest right row wins") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "e1")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100L)),
      (1L, ts("2024-01-01 11:00:00"), None) // latest row: payload IS null
    ).toDF("k", "rt", "v")
    val row = AsOf.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("v")),
      "recency, not payload non-nullity, must drive the carry")
  }

  test("rangeJoin: bin trick matches the inequality join exactly") {
    import graft.operators.RangeJoin
    val points = Seq(
      (1L, ts("2024-01-01 10:30:00"), "p1"), // inside iv1
      (1L, ts("2024-01-01 12:00:00"), "p2"), // at iv1.hi (exclusive) → out
      (1L, ts("2024-01-02 00:30:00"), "p3"), // inside iv2 (crosses a bin)
      (2L, ts("2024-01-01 10:30:00"), "p4")  // right key, no interval
    ).toDF("k", "t", "tag")
    val ivs = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), "iv1"),
      (1L, ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00"), "iv2")
    ).toDF("k", "lo", "hi", "name")
    val got = RangeJoin.rangeJoin(points, ivs, "k", "t", "lo", "hi",
      Seq("name"), binSecs = 3600L)
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("name"))
    assert(got.toSet == Set("p1" -> "iv1", "p3" -> "iv2"))
    // the gate-scenario plan is an equi-join, not a nested loop
    val plan = RangeJoin.rangeJoinQuery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
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
