package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the noop sink
  * (a bare `count()` would let Catalyst prune away computed columns), and
  * prints one JSON line of per-query wall seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // graded run: refuse probe-only source-swap flags (advice finding, r16)
    ProbeFlags.refuse("bench")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as long, see Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up pass: run every query once at the smallest scale factor.
    // Generated code depends on plan shape, not data volume, so this
    // compiles each query's whole-stage codegen classes (janino costs
    // seconds per distinct plan) and the timed pass below measures
    // steady-state throughput at the target scale.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    // Attribution: gates that BUILD a memoized training artifact run
    // FIRST, in dependency order, so each artifact's construction cost
    // lands on the gate NAMED for it instead of on whichever consumer
    // happens to sort alphabetically earlier (r9 example:
    // `clf_calibration`, a trivial bucketed aggregate, absorbed the
    // 16-round perceptron training chain because it sorts before
    // `perceptron_train`). The remainder keeps the stable alphabetical
    // order; totals are unchanged — only which gate pays the shared
    // build moves.
    val artifactOwners = Seq(
      "audio_fp",           // audio fingerprint frame
      "audio_fp_pairs",     // verified audio near-dup pair frame
      "suffix_array",       // prefix-doubling rank tables (sa_q*)
      "bpe_train",          // BPE merge table
      "dedup_minhash_lsh",  // minhash signature/candidate frames
      "kmeans_parallel",    // k-means|| centroids
      "pq_cb_kmpll",        // grouped-k-means|| PQ codebooks
      "perceptron_train",   // binary filter weight chain (clf_*)
      "perceptron_ordinal", // ordinal (PRank) weight chain
      "dsir_select",        // DSIR unigram importance model
      "dsir_select_bigram", // DSIR bigram model
      "dsir_domain",        // DSIR domain model
      "doc_ppl",            // bigram LM counts
      "site_rank",          // link-graph site-PR frame
      "unigram_train")      // unigram-LM vocab + segmentation table (ug_*)
    val ordered = {
      val all = SparkEntry.queries
      artifactOwners.filter(all.contains).map(n => n -> all(n)) ++
        all.toSeq.sortBy(_._1).filterNot(q => artifactOwners.contains(q._1))
    }
    // Two timed passes, report per-query min: a transient load burst on a
    // shared box hits one contiguous time window, so the min across passes
    // separated in time is a far more stable steady-state estimate than a
    // single sample (run-to-run noise on a contended host reached 3.7×).
    // Memoized frames and the Spark block cache are dropped before EACH
    // timed pass — otherwise pass 2 reads pass 1's cached RDDs and min()
    // reports warm numbers for every memoized-heavy query. With both
    // passes equally cold, min() suppresses host noise and nothing else.
    def timedPass(): Seq[(String, Double)] = {
      Memo.clear(spark)
      spark.catalog.clearCache()
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        // a failed query records the -1 sentinel, never a normal-looking time
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    val (p1, p2) = (timedPass(), timedPass())
    val results = p1.zip(p2).map { case ((name, a), (_, b)) =>
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val full =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.size},"queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // The harness keeps only a stdout tail, so a single long line loses its
    // own head. Emit the bulky per-query detail FIRST, persist the complete
    // JSON to bench_full.json, and make the LAST stdout line a short summary
    // that always survives truncation.
    println(full)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (full + "\n").getBytes("UTF-8"))
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.size},"failed":$failed,"sf":"$sfDir","detail":"bench_full.json"}""")
    spark.stop()
  }
}
