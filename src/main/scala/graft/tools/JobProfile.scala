package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.{Memo, Spark, SparkEntry}

/** Dev tool: per-JOB wall-clock attribution for one registered query —
  * which action (callsite) the seconds go to. Runs the ColdTime protocol
  * (sf0.001 codegen warm, Memo + block cache cleared, one timed cold run)
  * with a listener recording every job's duration and first-stage
  * callsite, then prints jobs sorted by cost plus the job count — the
  * §1 measurement the overhead-dominated gates need (at gate scale each
  * action costs a near-constant scheduling/planning quantum, so the job
  * COUNT is the budget).
  *
  * Besides wall time it reports two HOST-NOISE-IMMUNE structure metrics
  * for A/B comparisons on a contended box: the stage count and the
  * summed executor task time (executorRunTime over all completed stages)
  * — a structural change that removes work moves both deterministically,
  * while wall-clock alone can swing 3× between runs.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_agg").split(',').toSeq
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    // "keep": retain memoized frames across the listed queries (profile a
    // query in its bench CONTEXT, where earlier gates built the shared
    // artifacts). Default clears per query (worst-case attribution).
    val keepMemo = args.contains("keep")
    val spark = Spark.session("graft-jobprofile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    var stages = 0
    var taskMs = 0L
    var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts(js.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          rows += ((je.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskMs += sc.stageInfo.taskMetrics.executorRunTime
        tasks += sc.stageInfo.numTasks
      }
    }
    for (name <- names) {
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      if (!keepMemo) { Memo.clear(spark); spark.catalog.clearCache() }
      rows.clear(); starts.clear(); stages = 0; taskMs = 0L; tasks = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      println(f"== $name: $total%.2f s, ${rows.size} jobs, " +
        f"$stages stages, $tasks tasks, ${taskMs / 1e3}%.1f task-sec ==")
      val bySite = rows.groupBy(_._3).map { case (site, rs) =>
        (rs.map(_._2).sum, rs.size, site)
      }.toSeq.sortBy(-_._1)
      for ((sec, n, site) <- bySite)
        println(f"[prof] $sec%7.2f s  n=$n%-4d $site")
      val jobSec = rows.map(_._2).sum
      println(f"[prof] job-covered $jobSec%.2f s of $total%.2f s " +
        f"(gap = driver planning/analysis)")
    }
    spark.stop()
  }
}
