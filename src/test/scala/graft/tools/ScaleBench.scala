package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-up validation (VERDICT r9 next-2): synthesize a
  * ~`COPIES`× documents corpus from sf0.1 by duplicate+perturb, run the
  * slowest extra queries at both scales, and report the per-query
  * time ratio. A design that "would survive 100 TB" must scale ≲
  * linearly here (ratio ≤ ~1.5× the copy factor on a fixed 32-core
  * box); anything super-linear is a real scale bug.
  *
  * Perturbation: ~30% of each copy's words get a copy-specific suffix,
  * so copies of the same document are NOT near-duplicates of each other
  * (word-shingle Jaccard ≈ (0.7)³ ≈ 0.34 < threshold) — the near-dup
  * graph grows ~linearly with the corpus instead of quadratically by
  * construction, vocabulary grows sub-linearly (real-corpus shape), and
  * the planted docsWithDups exact/near copies still fire per copy.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleBench [copies] [reps]"
  * Writes markdown rows to stdout; paste into SCALING.md.
  */
object ScaleBench {
  private val BaseDir = "/root/testdata/sf0.1"
  private val ScaledRoot = "/tmp/graft_scale"

  private val SlowQueries = sys.env.get("SCALEBENCH_QUERIES")
    .map(_.split(",").toSeq)
    .getOrElse(Seq(
      "q_pagerank", "q_dedup_canonical", "q_dedup_clusters",
      "q_minhash_pairs", "q_kn5_logprob", "q_ccnet_bands",
      "q_bpe_pairs", "q_bpe_encode", "q_bpe_roundtrip",
      "q_containment", "q_exact_substr", "q_train_examples",
      "q_hll_groups",
      // late-r11 additions; the scaled dir now carries a synthesized
      // embeddings table too ([[synthesizeEmbeddings]]), so the
      // MIPS/bitext family sweeps by default (events-keyed queries
      // still go through EventsScaleBench)
      "q_keyword_tags", "q_url_canonical", "q_mips", "q_mips_alsh",
      "q_mips_alsh_planned",
      "q_bitext_banded", "q_bitext_planned", "q_dpo_pairs", "q_mmr",
      "q_bt_rank",
      "q_label_prop", "q_kanon", "q_kanon_rows", "q_dedup_index_probe",
      "q_curriculum", "q_cluster_balance"))

  def synthesize(spark: SparkSession, copies: Int): String = {
    val dir = s"$ScaledRoot/x$copies"
    synthesizeEmbeddings(spark, copies, dir)
    val marker = new java.io.File(s"$dir/documents.parquet/_SUCCESS")
    if (marker.exists()) return dir
    val base = spark.read.parquet(s"$BaseDir/documents.parquet")
    val scaled = base
      .crossJoin(spark.range(copies).select(col("id").cast("int").as("_k")))
      .select(
        (col("doc_id") + col("_k").cast("long") * 1000000L).as("doc_id"),
        when(col("_k") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            w => when(pmod(xxhash64(w, col("_k")), lit(10)) < 3,
              concat(w, lit("v"), col("_k").cast("string")))
              .otherwise(w)), " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    scaled.repartition(32).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  /** Embeddings twin of the documents synthesis (r11, for the
    * MIPS/bitext family): copies offset vec_id by k·10⁶ and perturb
    * every component with a deterministic hash-derived ±5·10⁻⁴ jitter,
    * so copies are distinct vectors with the same distribution (no
    * artificial duplicate cliques) while labels keep their shape. */
  private def synthesizeEmbeddings(spark: SparkSession, copies: Int,
      dir: String): Unit = {
    val marker = new java.io.File(s"$dir/embeddings.parquet/_SUCCESS")
    if (marker.exists()) return
    val base = spark.read.parquet(s"$BaseDir/embeddings.parquet")
    val scaled = base
      .crossJoin(spark.range(copies).select(col("id").cast("int").as("_k")))
      .select(
        (col("vec_id") + col("_k").cast("long") * 1000000L).as("vec_id"),
        when(col("_k") === 0, col("embedding").cast("array<double>"))
          .otherwise(zip_with(col("embedding").cast("array<double>"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, j) => x +
              (pmod(xxhash64(col("vec_id"), col("_k"), j), lit(1000))
                .cast("double") / 1e6 - 0.0005)))
          .cast("array<float>").as("embedding"),
        col("label"))
    scaled.repartition(32).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
  }

  // NOTE: the bitext scale evidence is q_bitext_banded, not
  // q_bitext_mine — the driver's exact query is an A × broadcast B
  // brute-force truth (quadratic by definition), mirroring how
  // q_ann_lsh rather than q_ann_cosine carries the ANN scale evidence.

  private def time(q: (SparkSession, String) => DataFrame,
      spark: SparkSession, dir: String, reps: Int): Double = {
    val runs = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      graft.operators.Caches.clear()
      sec
    }
    runs.min
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scalebench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scaledDir = synthesize(spark, copies)
    val qs = graft.SparkEntry.queries
    println(s"| query | sf0.1 (s) | ${copies}x (s) | ratio | verdict |")
    println("|---|---|---|---|---|")
    SlowQueries.filter(qs.contains).foreach { name =>
      try {
        val base = time(qs(name), spark, BaseDir, reps)
        val scaled = time(qs(name), spark, scaledDir, reps)
        val ratio = scaled / base
        val verdict =
          if (ratio <= copies * 1.5) "linear-ok" else "SUPERLINEAR"
        println(f"| $name | $base%.2f | $scaled%.2f | ${ratio}%.1fx | $verdict |")
      } catch {
        case e: Throwable =>
          println(s"| $name | ERR | ERR | - | ${e.toString.take(60)} |")
      }
    }
    spark.stop()
  }
}
