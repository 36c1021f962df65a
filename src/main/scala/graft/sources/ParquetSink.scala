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

  /** Persist an apply result with its bookkeeping, reference-style
    * (`_bde_RecordDatasetLoaded` + the event log): the merged table lands
    * under `<path>/data`, the stats row — stamped with the measured load
    * duration — is appended under `<path>/bookkeeping` partitioned by
    * dataset, so the upload history accumulates across applies and stays
    * partition-prunable by dataset.
    */
  def writeApplyResult(merged: DataFrame, bookkeeping: DataFrame,
                       path: String): Unit = {
    import org.apache.spark.sql.functions.lit
    val t0 = System.nanoTime()
    merged.write.mode("overwrite").parquet(s"$path/data")
    val secs = (System.nanoTime() - t0) / 1e9
    bookkeeping.withColumn("duration_secs", lit(secs))
      .write.mode("append").partitionBy("dataset")
      .parquet(s"$path/bookkeeping")
  }

  /** Read a versioned store back with partition pruning intact. */
  def readVersioned(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn(Versioned.Created, col(Versioned.Created).cast("int"))
}
