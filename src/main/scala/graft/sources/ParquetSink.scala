package graft.sources

import graft.operators.Versioned
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Partitioned parquet writers — the on-disk layout half of the scale
  * design in SURVEY §4.
  */
object ParquetSink {

  /** Write partitioned by `partitionCols`, bounding file sizes so a single
    * hot partition can't produce an unsplittable giant file.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Versioned-store layout: partitioned by `_ver_created`, so
    * `table_at_revision` prunes to the partitions with `created <= r` and a
    * new revision's apply only appends new partitions (append-only history,
    * never a rewrite).
    */
  def writeVersioned(store: DataFrame, path: String): Unit =
    writePartitioned(store, path, Seq(Versioned.Created))

  /** Read a versioned store back with partition pruning intact. */
  def readVersioned(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn(Versioned.Created, col(Versioned.Created).cast("int"))
}
