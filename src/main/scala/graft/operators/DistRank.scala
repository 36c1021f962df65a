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
  * distributed rank: slice each stratum's total order into balanced
  * contiguous ranges, rank locally per slice, and add broadcast slice
  * offsets.
  *
  * The slice id is a PURE FUNCTION OF THE ROW'S DATA, never of physical
  * placement: per stratum, slice boundaries are picked from a
  * deterministic md5-sampled subset of the sort keys (a bounded first
  * pass), broadcast as a sorted array, and each row's slice is the count
  * of boundaries ≤ its sort key. `repartitionByRange` +
  * `spark_partition_id()` — the obvious formulation — is NOT sound here:
  * the range partitioner derives its bounds from a nondeterministically
  * seeded sample, so the two plan branches that must agree on the slice
  * id (the offsets aggregate and the ranked rows) can observe DIFFERENT
  * bounds when the exchange isn't reused, silently corrupting ranks.
  * Measured, not hypothetical: at 4 shuffle partitions the
  * partition-id formulation produced 432/423/387-row results across
  * reruns of the same RFM census.
  *
  * Steps:
  *  1. sample rows whose md5(hashKey) ≡ 0 (mod 64); compress the sampled
  *     keys through a per-(stratum, shard) weighted quantile summary
  *     ([[Quantile.summarizeKeyed]]) and pick ≤ P−1 boundaries by a
  *     cumulative-weight walk — every aggregate bounded regardless of
  *     stratum size;
  *  2. broadcast the boundary arrays (one row per stratum) and stamp each
  *     row's slice `__rp` = #boundaries ≤ its key — deterministic,
  *     branch-consistent, balanced to sampling accuracy;
  *  3. a window partitioned by (stratum, __rp) computes the LOCAL rank /
  *     running sum — every window group is one contiguous slice of the
  *     stratum's order, so no reducer sees more than ~1/P of a stratum;
  *  4. per-(stratum, slice) totals — a bounded P×|strata| metadata frame —
  *     become slice OFFSETS by a tiny triangular self-join, broadcast
  *     back: global = offset + local.
  *
  * Everything stays declarative DataFrame ops; no driver collect, no
  * mapPartitions, no physical-placement dependence. Rank values depend
  * only on the data's total order, so results are bit-identical to the
  * single-window formulation at any partition count. Orders must be
  * ASCENDING over the given columns with a unique tiebreaker last;
  * descending dimensions negate (exact for the integer/decimal metrics
  * ranked here). The 1-in-64 sample caps the summary pass's input; the
  * summary caps everything after it.
  *
  * Ref: the same two-phase global-order scheme Spark itself uses inside
  * `zipWithIndex` (core/src/main/scala/org/apache/spark/rdd/
  * ZippedWithIndexRDD.scala) lifted to stratified DataFrames with
  * data-deterministic slicing.
  */
object DistRank {

  /** 1-in-SampleMod md5 sample drives the boundary pick. */
  private val SampleMod = 64

  /** The sampled keys never collect flat: they compress through
    * [[Quantile.summarizeKeyed]] over this many md5 shards per stratum at
    * this many order statistics per shard, so the frame the boundary walk
    * touches is ≤ SummaryShards·(SummarySamples+1) rows per stratum no
    * matter how large the stratum is.
    */
  private val SummaryShards = 32
  private val SummarySamples = 64

  private def partitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Stamp the deterministic slice id `__rp` and the packed sort key
    * `__sk` (struct over `order`, compared lexicographically).
    *
    * Boundary pick (the bounded composition the scaladoc above promises):
    * 1-in-64 md5 sample → per-(stratum, shard) weighted quantile summary
    * ([[Quantile.summarizeKeyed]] — each shard sorts its sampled keys once
    * and keeps every ⌈n_s/S⌉-th order statistic with its gap weight) →
    * per-stratum cumulative-weight walk picks boundary j as the first
    * summary point whose cumulative weight reaches j/P of the stratum's
    * sampled weight. Every aggregate along the way is bounded: the summary
    * by construction, the walk by the summary's size, and the final
    * collect_list by P−1 boundary rows per stratum. (The previous
    * formulation collect_list'ed EVERY sampled key of a stratum into one
    * aggregation buffer — ~10^10 keys at 100 TB, the exact OOM this
    * operator exists to avoid.)
    */
  private def withSlice(df: DataFrame, stratum: String, order: Seq[Column],
                        hashKey: String): DataFrame = {
    val p = partitions(df)
    val keyed = df.withColumn("__sk", struct(order: _*))
    if (p <= 1) return keyed.withColumn("__rp", lit(0))
    val h = s"md5(concat(cast($hashKey as string), ':slice'))"
    val sample = keyed
      .filter(expr(s"pmod(cast(conv(substring($h, 1, 8), 16, 10) " +
        s"as bigint), $SampleMod)") === 0)
      .select(col(stratum),
        expr(s"pmod(cast(conv(substring($h, 9, 8), 16, 10) as bigint), " +
          s"$SummaryShards)").as("shard"),
        col("__sk").as("v"),
        expr(s"cast($hashKey as string)").as("k"))
    val summary =
      Quantile.summarizeKeyed(sample, SummarySamples, Seq(stratum, "shard"))
    val wCum = Window.partitionBy(col(stratum)).orderBy(col("v"), col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = summary.withColumn("cw", sum(col("w")).over(wCum))
      .select(col(stratum).as("__sc"), col("v"), col("cw"))
    val targets = summary.groupBy(col(stratum)).agg(sum(col("w")).as("__n"))
      .select(col(stratum), col("__n"),
        explode(expr(s"sequence(1, ${p - 1})")).as("__j"))
      .withColumn("__tr", expr(s"greatest(1L, (__j * __n) div $p)"))
    val bnds = targets
      .join(cum, col(stratum) <=> col("__sc") && col("cw") >= col("__tr"))
      .groupBy(col(stratum), col("__j"))
      .agg(min_by(col("v"), col("cw")).as("__b"))
      // ≤ P−1 boundary rows per stratum fold into the broadcast array —
      // the only collect_list in the path, bounded by construction
      .groupBy(col(stratum))
      .agg(sort_array(collect_list(col("__b"))).as("__bnds"))
      .select(col(stratum).as("__s0"), col("__bnds"))
      // materialize the ≤|strata|-row boundary frame ONCE: the ranked
      // frame is re-evaluated by several downstream branches (totals,
      // offsets, finish) and by CHAINED rank passes (customer_rfm ranks
      // three dimensions in a fold) — left lazy, the whole sample+summary
      // chain recomputes per branch per pass, compounding multiplicatively
      // (measured 56 s on customer_rfm; eager: the pick runs once and the
      // branches see a literal local relation). Eager materialization also
      // hard-guarantees both plan branches observe the SAME boundaries.
      .localCheckpoint()
    keyed.join(broadcast(bnds), col(stratum) <=> col("__s0"), "left")
      .withColumn("__rp",
        when(col("__bnds").isNull, lit(0))
          .otherwise(expr("size(filter(__bnds, b -> b <= __sk))")))
      .drop("__s0", "__bnds")
  }

  /** Slice the frame, stamp `__rp`, and derive each slice's offset = sum
    * of `total` over earlier slices of the same stratum. Returns (sliced
    * frame, broadcastable offsets).
    */
  private def sliced(df: DataFrame, stratum: String, order: Seq[Column],
                     hashKey: String, total: Column): (DataFrame, DataFrame) = {
    val keyed = withSlice(df, stratum, order, hashKey)
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
      .drop("__rp", "__loc", "__s", "__p", "__off", "__sk")

  /** 1-based row number of every row within its stratum under ASCENDING
    * `order` (which must be a total order — add a unique tiebreaker;
    * express descending dimensions by negation). `hashKey` names a
    * unique, non-null column the boundary sample hashes. Long-typed.
    */
  def rowNumber(df: DataFrame, stratum: String, order: Seq[Column],
                hashKey: String, out: String): DataFrame = {
    val (keyed, offsets) =
      sliced(df, stratum, order, hashKey, count(lit(1)).cast("long"))
    val w = Window.partitionBy(col(stratum), col("__rp")).orderBy(col("__sk"))
    finish(keyed, offsets, stratum, row_number().over(w).cast("long"), out)
  }

  /** 1-based DENSE rank of every row within its stratum under ASCENDING
    * `order` (ties share a rank; ranks are consecutive). Computed
    * directly on the full frame: slice-local `dense_rank` plus offsets =
    * the count of DISTINCT keys in earlier slices of the stratum —
    * value-identical to row_number-over-the-distinct-key-frame joined
    * back (the former formulation in [[SuffixArray]]), with two fewer
    * full-frame shuffles per call: no distinct-frame build and no key
    * join back. Sound for the same reason [[rowNumber]] is: equal keys
    * share a slice, and every key in an earlier slice is strictly
    * smaller, so distinct counts add across slices.
    */
  def denseRank(df: DataFrame, stratum: String, order: Seq[Column],
                hashKey: String, out: String): DataFrame = {
    val (keyed, offsets) = sliced(df, stratum, order, hashKey,
      countDistinct(col("__sk")).cast("long"))
    val w = Window.partitionBy(col(stratum), col("__rp")).orderBy(col("__sk"))
    finish(keyed, offsets, stratum, dense_rank().over(w).cast("long"), out)
  }

  /** Inclusive running sum of `value` within each stratum under ASCENDING
    * `order`. Long-typed (exact; use for counts/token budgets, not
    * floats).
    */
  def runningSum(df: DataFrame, stratum: String, order: Seq[Column],
                 hashKey: String, value: Column, out: String): DataFrame = {
    val (keyed, offsets) =
      sliced(df, stratum, order, hashKey, sum(value).cast("long"))
    val w = Window.partitionBy(col(stratum), col("__rp")).orderBy(col("__sk"))
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
