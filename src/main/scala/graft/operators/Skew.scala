package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join splitting (on in every graft session) covers sort-merge
  * joins; this utility covers the remaining case — a replicated ("salted")
  * broadcast-style join where one side has pathological key frequency (the
  * stop-shingle / stop-fingerprint shape from the dedup pipelines).
  *
  * The big side gets a deterministic salt derived from the full row hash
  * (stable under re-execution, unlike `rand()` — a retried task must land
  * rows in the same salt bucket); the small side is replicated `factor`
  * times. The join key becomes (key, salt), fanning each hot key's rows
  * across `factor` reducers.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, salted `factor` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int): DataFrame = {
    require(factor > 0)
    val saltCol: Column =
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(factor))
    val salted = big.withColumn("_salt", saltCol)
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
