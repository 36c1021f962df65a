package graft.tools

import graft.{Spark, SparkEntry}

/** Dev tool: time registered queries N times (default 3) at a given sf.
  * `names` is comma-separated so a multi-query probe pays one session.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_agg").split(',').toSeq
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = Spark.session("graft-time", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    for (name <- names; i <- 1 to n) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[time] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
