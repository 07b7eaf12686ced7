package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-inspection utility: `runMain graft.Explain <sfDir> [query...]`
  * prints the formatted physical plan per query (checking pushdown /
  * broadcast / codegen spans), or with `-t` also times each stage of the
  * minhash pipeline for profiling.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q1_agg")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (names == Seq("-minhash")) { minhashBreakdown(spark, sfDir); return }

    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }

  private def minhashBreakdown(spark: SparkSession, sfDir: String): Unit = {
    import graft.functions.TextFunctions
    import graft.operators.Dedup
    val docs = graft.queries.DocQueries.docsWithDupsPublic(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("count docs")(docs.count())
    val sh = docs.select(col("doc_id").as("id"),
      TextFunctions.wordShingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    time("shingles")(sh.count())
    val sigs = sh.select(col("id"),
      Dedup.minhashSignature(col("sh"), 32).as("sig"))
    time("signatures")(sigs.count())
    val bandsDf = sigs.select(col("id"),
      explode(Dedup.bandKeys(col("sig"), 8, 4)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bh"))
    time("bands")(bandsDf.count())
    val cands = bandsDf.select(col("id").as("id_a"), col("band"), col("bh"))
      .join(bandsDf.select(col("id").as("id_b"), col("band"), col("bh")),
        Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    time("candidates")(cands.count())
    val verified = cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= 0.5)
    time("verified")(verified.count())
    spark.stop()
  }
}
