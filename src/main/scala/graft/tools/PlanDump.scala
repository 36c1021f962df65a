package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Spark, SparkEntry}

/** Dev tool: write `.explain("formatted")` for a comma-separated query
  * list to `plans/<tag>/<query>_<suffix>.txt` in one session — the
  * before/after plan evidence the optimization rounds commit.
  *
  * Usage: `runMain graft.tools.PlanDump <q1,q2,...> <suffix> [sfDir] [tag]`
  *
  * Note: gates that eagerly materialize inside their builder (the
  * composed pipelines return a localCheckpoint'ed ledger) show a
  * LogicalRDD leaf here; their plan evidence is
  * [[JobProfile]]'s job/stage attribution instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_agg").split(',').toSeq
    val suffix = args.drop(1).headOption.getOrElse("before")
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.01")
    val tag = args.drop(3).headOption.getOrElse("r17")
    val spark = Spark.session("graft-plandump", "8")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"plans/$tag/${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] $name -> plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
