package graft

class MemoSpec extends SparkSpec {

  test("cached: builds once per (session, key, dir), again for a new session") {
    var builds = 0
    def mk = { builds += 1; spark.range(3).toDF("n") }
    Memo.cached(spark, "memo_spec", "dirA")(mk)
    Memo.cached(spark, "memo_spec", "dirA")(mk)
    assert(builds == 1, "same session+key+dir must reuse the cached frame")
    Memo.cached(spark, "memo_spec", "dirB")(mk)
    assert(builds == 2, "a different dir is a different frame")
    // a distinct session must never be handed another session's frame
    val other = spark.newSession()
    Memo.cached(other, "memo_spec", "dirA")(
      { builds += 1; other.range(3).toDF("n") })
    assert(builds == 3, "a new session gets its own entry")
  }

  test("docContainment memo key carries maxDf") {
    // prime with the default cap, then ask for a drastically tighter one:
    // the tighter call must NOT be served the default-cap frame
    val loose = graft.operators.TextOps.docContainment(spark, sf, maxDf = 20)
      .count()
    val tight = graft.operators.TextOps.docContainment(spark, sf, maxDf = 1)
      .count()
    assert(tight == 0, s"maxDf=1 keeps only unshared fingerprints, so no " +
      s"pairs can survive; got $tight (loose run had $loose)")
  }
}
