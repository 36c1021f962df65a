package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed rank / running-sum over LOW-CARDINALITY strata — the
  * scale-safe replacement for `Window.partitionBy(stratum)` when the
  * stratum has only a handful of values (market segment, language,
  * source). A window partitioned on a ~5-value key hashes the entire
  * table to ~5 reducers and sorts each stratum in a single task — fine at
  * sf0.1, hours of spill at 100 TB. The classic fix is the two-phase
  * distributed rank:
  *
  *  1. `repartitionByRange` on (stratum, orderKeys) — the range
  *     partitioner spreads every stratum across MANY partitions, each
  *     holding a contiguous slice of the stratum's total order;
  *  2. a window partitioned by (stratum, rangePartitionId) computes the
  *     LOCAL rank / running sum — every window group is one balanced
  *     range slice, so no reducer ever sees more than ~1/P of a stratum;
  *  3. per-(stratum, slice) totals — a bounded P×|strata| metadata frame —
  *     are turned into slice OFFSETS by a tiny triangular self-join
  *     (sum of totals of all earlier slices in the same stratum), and the
  *     offsets broadcast back onto the slices: global = offset + local.
  *
  * Everything stays declarative DataFrame ops (codegen'd windows +
  * broadcast hash join); no driver collect, no mapPartitions. The rank
  * values depend only on the data's total order, not on where the range
  * boundaries fall, so results are bit-identical to the single-window
  * formulation at any partition count.
  *
  * Ref: the same two-phase global-order scheme Spark itself uses inside
  * `zipWithIndex`/`RangePartitioner` (core/src/main/scala/org/apache/
  * spark/rdd/ZippedWithIndexRDD.scala) lifted to stratified DataFrames.
  */
object DistRank {

  /** Explicit partition count: passing it to `repartitionByRange` marks
    * the partitioning user-specified, which keeps AQE from re-coalescing
    * the exchange — the stamped partition id must mean the same range
    * slice in every branch that reads it.
    */
  private def partitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Range-slice the frame on (stratum, order), stamp the slice id, and
    * derive each slice's offset = sum of `total` over earlier slices of
    * the same stratum. Returns (sliced frame, broadcastable offsets).
    */
  private def sliced(df: DataFrame, stratum: String, order: Seq[Column],
                     total: Column): (DataFrame, DataFrame) = {
    val keyed = df
      .repartitionByRange(partitions(df), (col(stratum) +: order): _*)
      .withColumn("__rp", spark_partition_id())
    val totals = keyed.groupBy(col(stratum), col("__rp")).agg(total.as("__t"))
    val earlier = totals.select(col(stratum).as("__s2"),
      col("__rp").as("__p2"), col("__t").as("__t2"))
    val offsets = totals
      .join(earlier,
        col(stratum) <=> col("__s2") && col("__p2") < col("__rp"), "left")
      .groupBy(col(stratum), col("__rp"))
      .agg(coalesce(sum(col("__t2")), lit(0L)).as("__off"))
      .select(col(stratum).as("__s"), col("__rp").as("__p"), col("__off"))
    (keyed, offsets)
  }

  private def finish(keyed: DataFrame, offsets: DataFrame, stratum: String,
                     local: Column, out: String): DataFrame =
    keyed
      .withColumn("__loc", local)
      .join(broadcast(offsets),
        col(stratum) <=> col("__s") && col("__rp") === col("__p"))
      .withColumn(out, col("__off") + col("__loc"))
      .drop("__rp", "__loc", "__s", "__p", "__off")

  /** 1-based row number of every row within its stratum under `order`
    * (which must be a total order — add a unique tiebreaker). Long-typed.
    */
  def rowNumber(df: DataFrame, stratum: String, order: Seq[Column],
                out: String): DataFrame = {
    val (keyed, offsets) =
      sliced(df, stratum, order, count(lit(1)).cast("long"))
    val w = Window.partitionBy(col(stratum), col("__rp")).orderBy(order: _*)
    finish(keyed, offsets, stratum, row_number().over(w).cast("long"), out)
  }

  /** Inclusive running sum of `value` within each stratum under `order`.
    * Long-typed (exact; use for counts/token budgets, not floats).
    */
  def runningSum(df: DataFrame, stratum: String, order: Seq[Column],
                 value: Column, out: String): DataFrame = {
    val (keyed, offsets) =
      sliced(df, stratum, order, sum(value).cast("long"))
    val w = Window.partitionBy(col(stratum), col("__rp")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    finish(keyed, offsets, stratum, sum(value).over(w).cast("long"), out)
  }

  /** Exact long integer division for non-negative operands: subtracting
    * the remainder first makes the numerator an exact multiple, so the
    * double divide is exact for any values < 2^53 (a bare `/`-then-floor
    * can round up across a bucket boundary once quotients reach ~1e9).
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** SQL `NTILE(k)` reconstructed from (rank, n): the first n%k buckets
    * get ⌈n/k⌉ rows, the rest ⌊n/k⌋ — bit-identical to the window
    * function, but computable from a distributed rank with no
    * stratum-partitioned window. Long-typed.
    */
  def ntileFromRank(k: Int, rank: Column, n: Column): Column = {
    val nn = n.cast("long")
    val r = rank.cast("long")
    val base = idiv(nn, lit(k))
    val rem = pmod(nn, lit(k))
    val cut = (base + lit(1L)) * rem
    when(r <= cut, idiv(r - 1, base + lit(1L)) + lit(1L))
      .otherwise(rem + idiv(r - cut - lit(1L), base) + lit(1L))
  }
}
