package graft

import graft.operators.Merge
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks of the merge algebra: the invariants hold for
  * ARBITRARY table states and changesets, not just the arithmetic gate
  * scenarios. Small random frames (≤ ~26 keys) keep each sample to a few
  * tiny local jobs.
  */
class MergePropSpec extends SparkSpec {
  import spark.implicits._

  /** Random table state: distinct keys 0..25 with int payloads. */
  private val stateGen: Gen[Map[Long, Int]] =
    Gen.mapOf(Gen.zip(Gen.choose(0L, 25L), Gen.choose(0, 9)))

  private def df(m: Map[Long, Int]): DataFrame = m.toSeq.toDF("k", "v")

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("property: level-0 diff-then-apply reproduces any snapshot exactly") {
    check(Prop.forAll(stateGen, stateGen) { (curM, snapM) =>
      val (cur, snap) = (df(curM), df(snapM))
      val applied =
        Merge.applyActions(cur, snap, Merge.diffActions(cur, snap, "k"), "k")
      sameRows(applied, snap)
    })
  }

  test("property: apply then invert is the identity for any changeset") {
    check(Prop.forAll(stateGen, stateGen) { (curM, incM) =>
      val (cur, inc) = (df(curM), df(incM))
      // announce every incoming key plus every third current key (covers
      // pure deletes, updates, no-ops and inserts in one changeset)
      val keys = inc.select("k")
        .unionByName(cur.filter($"k" % 3 === 0).select("k")).distinct()
      val actions = Merge.changesetActions(cur, inc, keys, "k")
      val applied = Merge.applyActions(cur, inc, actions, "k")
      val reverted =
        Merge.applyActions(applied, cur, Merge.invertActions(actions), "k")
      sameRows(reverted, cur)
    })
  }

  test("property: bookkeeping counts conserve the table size") {
    check(Prop.forAll(stateGen, stateGen) { (curM, incM) =>
      val (cur, inc) = (df(curM), df(incM))
      val keys = inc.select("k")
        .unionByName(cur.filter($"k" % 2 === 0).select("k")).distinct()
      val actions = Merge.changesetActions(cur, inc, keys, "k")
      val applied = Merge.applyActions(cur, inc, actions, "k")
      val bk = Merge.bookkeeping(actions, "ds", "t").collect().head
      applied.count() ==
        cur.count() + bk.getAs[Long]("n_insert") - bk.getAs[Long]("n_delete")
    })
  }
}
