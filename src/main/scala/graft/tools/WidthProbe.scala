package graft.tools

import graft.Spark
import org.apache.spark.sql.functions._

/** Dev tool: the derived-LSH-width scale audit — per corpus dir, the
  * derived signature width, band-bucket census and the implied
  * candidate-pair volume Σ c·(c−1)/2 (the quantity the `widthFor`
  * rule exists to keep ~linear in n).
  */
object WidthProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = Spark.session("graft-widthprobe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    for (dir <- dirs) {
      val n = graft.Tables.embeddings(spark, dir).count()
      val w = graft.operators.Similarity.widthFor(n)
      val r = graft.operators.Similarity.dupBandsOf(spark, dir)
        .groupBy("band", "sig").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("buckets"), max(col("c")).as("max_occ"),
          sum(expr("c * (c - 1) div 2")).as("cand_pairs"))
        .head()
      println(s"[width] dir=$dir n=$n w=$w buckets=${r.getLong(0)} " +
        s"max_occ=${r.getLong(1)} cand_pairs=${r.getLong(2)} " +
        f"cand_per_vec=${r.getLong(2).toDouble / n}%.1f")
      graft.Memo.clear(spark)
    }
    spark.stop()
  }
}
