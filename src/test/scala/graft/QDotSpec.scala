package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class QDotSpec extends SparkSpec {

  private def quantized = Tables.embeddings(spark, sf)
    .select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1e7 + 0.5).cast("long")).as("q"))

  test("q_dot matches the higher-order-function dot product") {
    GraftFunctions.register(spark)
    val q = quantized
    val pairs = q.alias("a").join(q.alias("b"),
        col("a.vec_id") + 1 === col("b.vec_id")) // adjacent pairs
      .select(col("a.vec_id"),
        expr("q_dot(a.q, b.q)").as("native"),
        expr("aggregate(zip_with(a.q, b.q, (x, y) -> x * y), 0L, (s, v) -> s + v)")
          .as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
    assert(pairs.count() > 0)
  }

  test("q_dot runs inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val q = quantized
    val df = q.alias("a").join(q.alias("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .selectExpr("q_dot(a.q, b.q) as d")
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` star marks operators fused into a whole-stage-codegen stage
    assert("""\*\(\d+\) Project \[q_dot""".r.findFirstIn(plan).isDefined,
      plan.take(400))
    // and it is null-safe + self-dot is the squared norm
    val selfRow = q.selectExpr("q_dot(q, q) as n2", "vec_id").first()
    assert(selfRow.getLong(0) > 0)
  }

  test("q_dot resolves via session extensions without explicit registration") {
    // the shared session is built with GraftExtensions injected, so the
    // function must resolve in raw SQL with no register() call
    val r = spark.sql("SELECT q_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(r == 32L)
  }
}
