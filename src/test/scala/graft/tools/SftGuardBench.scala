package graft.tools

/** A/B timer for the renderConversation null fail-fast (r13 verdict
  * #1): q_sft_render / q_sft_render_n timed with the guard on (the
  * shipped plan) vs off (`graft.sft.skipNullGuard=true` — the r12
  * plan's predicate), INTERLEAVED rep pairs so a box-load spike hits
  * both arms, per-arm MIN reported. Attributes q_sft_render's r13
  * slowdown to guard-vs-environment without a code edit.
  * Run: sbt "Test/runMain graft.tools.SftGuardBench [reps] [sfDir]" */
object SftGuardBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    def runOne(name: String, skip: Boolean): Double = {
      if (skip) spark.conf.set("graft.sft.skipNullGuard", "true")
      else spark.conf.unset("graft.sft.skipNullGuard")
      try {
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); graft.operators.Caches.clear()
        sec
      } finally spark.conf.unset("graft.sft.skipNullGuard")
    }
    Seq("q_sft_render", "q_sft_render_n").foreach { name =>
      // warm both plan shapes (janino compile) outside the timing
      runOne(name, skip = false); runOne(name, skip = true)
      val pairs = (1 to reps).map { i =>
        val g = runOne(name, skip = false)
        val u = runOne(name, skip = true)
        println(f"$name rep $i: guarded $g%.3f s, unguarded $u%.3f s")
        (g, u)
      }
      val g = pairs.map(_._1).min
      val u = pairs.map(_._2).min
      println(f"$name MIN: guarded $g%.3f s, unguarded $u%.3f s, " +
        f"guard cost ${(g / u - 1) * 100}%.1f%%")
    }
    spark.stop()
  }
}
