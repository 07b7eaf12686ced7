package graft.tools

import org.apache.spark.sql.functions._

/** The many-epoch compaction fixture (r14 verdict #1's SCALING row):
  * build a DedupIndex from sf0.1 documents, grow it through TWENTY
  * separate appends (one tiny epoch each — a streaming gate's
  * accumulation shape), measure probe latency and file counts, then
  * [[graft.operators.DedupIndex.compact]] and measure again. The
  * pair set must be identical before and after (compaction is pure
  * data movement); the file-count collapse and the probe delta are
  * the small-files-cliff evidence.
  * Run: sbt "Test/runMain graft.tools.CompactionBench [reps]" */
object CompactionBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.DedupIndex

    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text").where(col("text").isNotNull)
      .repartition(32)
    val path = java.nio.file.Files
      .createTempDirectory("graft_compaction_bench_").toString
    def fileCount(sub: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$path/$sub")).count(f =>
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
    }
    val batch = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 300000L).as("doc_id"),
        concat(col("text"), lit(" crawl extra tail")).as("text"))
    def probeOnce(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = DedupIndex.probe(spark, path, batch, "doc_id", "text",
        threshold = 0.5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); graft.operators.Caches.clear()
      (sec, n)
    }
    try {
      // slice 0 builds; slices 1..20 are twenty separate appends
      DedupIndex.build(docs.where(col("doc_id") % 21 === 0),
        "doc_id", "text", path, bands = 16, rowsPerBand = 2)
      (1 to 20).foreach { r =>
        DedupIndex.append(docs.where(col("doc_id") % 21 === r),
          "doc_id", "text", path)
      }
      val filesBefore = (fileCount("grams"), fileCount("bands"))
      val before = (1 to reps).map(_ => probeOnce())
      val t0 = System.nanoTime()
      DedupIndex.compact(spark, path)
      val compactSec = (System.nanoTime() - t0) / 1e9
      val filesAfter = (fileCount("grams"), fileCount("bands"))
      val after = (1 to reps).map(_ => probeOnce())
      require(before.head._2 == after.head._2,
        s"pair count changed: ${before.head._2} -> ${after.head._2}")
      println(
        f"| dedup-index compaction (sf0.1 docs, build + 20 appends) " +
          f"| files grams/bands ${filesBefore._1}/${filesBefore._2} -> " +
          f"${filesAfter._1}/${filesAfter._2} " +
          f"| probe before ${before.map(_._1).min}%.2f s " +
          f"| probe after ${after.map(_._1).min}%.2f s " +
          f"| compact ${compactSec}%.2f s " +
          f"| ${before.head._2} pairs, unchanged |")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
    spark.stop()
  }
}
