package graft.tools

import graft.{Memo, Spark, SparkEntry}

/** Dev tool: Bench-protocol cold timing for selected queries — warm the
  * codegen cache at sf0.001, clear Memo + block cache, then time at the
  * target sf. Mirrors one timed-pass slot of `graft.Bench`.
  */
object ColdTime {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_agg").split(',').toSeq
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val spark = Spark.session("graft-coldtime",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    for (name <- names)
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    for (i <- 1 to n) {
      Memo.clear(spark)
      spark.catalog.clearCache()
      for (name <- names) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"[cold] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
