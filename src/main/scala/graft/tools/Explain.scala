package graft.tools

import graft.{Spark, SparkEntry}

/** Dev tool: print plan-shape stats (or the full formatted plan with
  * `-v`) for one registered query — the `.explain` feedback loop the scale
  * notes in SURVEY §4 are checked against.
  *
  * Usage: `sbt "runMain graft.tools.Explain <query> [sfDir] [-v]"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val dir = args.drop(1).headOption.filterNot(_ == "-v")
      .getOrElse("/root/testdata/sf0.01")
    val spark = Spark.session("graft-explain", "8")
    val df = SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    if (args.contains("-v")) df.explain("formatted")
    for (op <- Seq("FileScan", "Exchange", "SortMergeJoin", "BroadcastHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct", "HashAggregate",
      "ObjectHashAggregate", "SortAggregate", "Window", "WholeStageCodegen"))
      println(f"$op%-25s ${op.r.findAllIn(plan).length}")
    spark.stop()
  }
}
