package graft.tools

import graft.Spark
import org.apache.spark.sql.functions._

/** Dev tool: intermediate-frame volumes of the suffix-strip path at a
  * given sf — the numbers behind the §6 scale notes (how many positions
  * are classed, how many mark intervals survive merging, how many tokens
  * are actually removed).
  */
object StripStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Spark.session("graft-stripstats",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val t0 = System.nanoTime()
    def lap(tag: String): Unit =
      println(f"[stripstats] $tag at ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val rf = graft.operators.SuffixArray.suffixArray(spark, dir)
    println(s"[stripstats] positions: ${rf.count()}"); lap("ranks built")
    val strip = graft.operators.SuffixArray.dedupSuffixStrip(spark, dir)
    println(s"[stripstats] strip rows: ${strip.count()}"); lap("strip pass 1")
    println(s"[stripstats] removed tokens: " +
      strip.agg(sum(col("n_removed"))).head.getLong(0)); lap("strip pass 2")
    spark.stop()
  }
}
