package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-stable floating-point aggregation.
  *
  * Summing doubles is order-dependent; a Spark partial-aggregate tree and a
  * DuckDB sequential scan sum in different orders and can disagree in the
  * last ulp, which breaks hash comparison. Casting each addend to a wide
  * decimal first makes the sum exact (and therefore order-independent);
  * casting the exact total back to double is then deterministic on both
  * engines. The SQL mirror is
  * `CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE)`.
  */
object Exact {
  private val Wide = DecimalType(30, 10)

  /** The wide decimal type used for exact sums, for callers staging their
    * own partial aggregates (see [[sumDec]]).
    */
  def wide: DecimalType = Wide

  /** Order-independent sum of a double expression. */
  def sumD(c: Column): Column = sum(c.cast(Wide)).cast("double")

  /** Exact decimal sum, kept as decimal — for multi-stage aggregation
    * (partial states merged later) where only the FINAL result may round
    * to double. Decimal addition is exact and associative, so any merge
    * tree of these partials equals the direct sum.
    */
  def sumDec(c: Column): Column = sum(c.cast(Wide))

  /** Order-independent mean of a double expression. */
  def avgD(c: Column): Column = sum(c.cast(Wide)).cast("double") / count(lit(1))

  /** SQL fragments mirroring the above, for oracle strings.
    *
    * The decimal total goes through VARCHAR before DOUBLE: DuckDB's direct
    * decimal→double cast divides two doubles (int128 value, 10^scale) and
    * can be a ulp off, while its string→double parse is correctly rounded —
    * matching Spark's BigDecimal.doubleValue.
    */
  def sqlSum(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"${sqlSum(expr)} / COUNT(*)"
}
