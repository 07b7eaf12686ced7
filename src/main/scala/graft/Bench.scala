package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall seconds on the
  * SPARK_GRAFT_SF_DIR tables (contract: BASELINE.json / the build brief).
  *
  * Headline queries cover every pipeline stage at its benchmark-relevant
  * scale; quadratic verification-style queries (all-pairs jaccard) are
  * excluded — they exist for the correctness gate, not the throughput
  * story. A warmup pass (q1_agg) absorbs session/codegen startup so the
  * timed numbers measure the queries, not JVM warmup.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_agg",                // grouped aggregation over the fact table
    "q_join_agg",            // dimension-chain joins + agg
    "q_interval_join",       // range-predicate join
    "q_window_lag",          // window lag/delta stack
    "q_gaps_islands",        // gaps-and-islands dwell time
    "q_time_bucket",         // tumbling time buckets
    "q_telemetry_transform", // STEP 2 silver transform (hash/enums/parse)
    "q_feature_stack",       // STEP 4 full window-feature stack
    "q_spatial_zone",        // broadcast point-in-polygon join
    "q_cpd_candidates",      // STEP 5 downsample + PELT
    "q_dedup_exact",         // exact dedup groupBy
    "q_minhash_pairs",       // MinHash-LSH near-dup pairs
    "q_ann_cosine")          // brute-force cosine top-k

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    // Per-query warmup at the smallest SF: identical plan shapes generate
    // identical code, so the janino compile + JIT cost is paid outside the
    // timed run — the timings below measure steady-state execution.
    val warmDir = "/root/testdata/sf0.001"
    headline.filter(qs.contains).foreach { name =>
      try qs(name)(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      // noop sink: count() lets Spark skip projection work on map-only
      // plans; noop forces every output column to materialize
      val ok = try {
        qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
