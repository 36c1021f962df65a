package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every graft entrypoint shares.
  *
  * Tuned for the local[32] harness but scale-minded: AQE on (runtime
  * re-planning, skew-join splitting), small broadcast threshold left at
  * default (10MB) so dimension tables broadcast, shuffle partitions sized
  * to the harness core count rather than Spark's default 200.
  */
object Spark {
  def session(appName: String = "graft",
              cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cores]")
      // native expressions as session extensions — the cluster deployment
      // path (spark.sql.extensions=graft.functions.GraftExtensions)
      .withExtensions(new functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as long, see Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
