package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): time named driver
  * queries in isolation with the noop sink and dump their
  * `.explain("formatted")` plans for the plans/rNN/ evidence files.
  *
  * Methodology mirrors Bench exactly — warm pass at sf0.001 (codegen/JIT
  * outside the timed region), min-of-N at the target SF with cache clears
  * between reps, `local[$SPARK_GRAFT_CPUS]`, shuffle.partitions = cpus,
  * AQE on — so numbers here are directly comparable to BENCH_*.json rows.
  *
  * Run: sbt "Test/runMain graft.tools.QueryBench <plansDir> <suffix> <reps> q1,q2,..."
  *   e.g. sbt "Test/runMain graft.tools.QueryBench plans/r17 before 3 q_minhash_pairs,q_dedup_canonical"
  * Query list "headline" expands to Bench.headline.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val plansDir = args(0)
    val suffix = args(1)
    val reps = args(2).toInt
    val names = args(3) match {
      case "headline" => graft.Bench.headline
      case csv => csv.split(",").toSeq
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = "/root/testdata/sf0.001"

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // mirror Bench.newSession (comparable numbers)
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.quietKnownWarnings()

    val qs = graft.SparkEntry.queries
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(plansDir))

    names.filter(qs.contains).foreach { name =>
      spark.sparkContext.setJobDescription(s"$name warm")
      try qs(name)(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache(); graft.operators.Caches.clear()

      // plan dump happens on a fresh frame so persisted intermediates from
      // the warm pass cannot change the captured shape
      val planPath = java.nio.file.Paths.get(plansDir, s"${name}_$suffix.txt")
      try {
        val df = qs(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(planPath, plan.getBytes("UTF-8"))
        ()
      } catch { case e: Throwable =>
        System.err.println(s"[qbench] $name explain failed: ${e.getMessage}")
      }
      spark.catalog.clearCache(); graft.operators.Caches.clear()

      val times = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"$name timed")
        val t0 = System.nanoTime()
        val ok =
          try {
            qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[qbench] $name failed: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); graft.operators.Caches.clear()
        if (ok) sec else -1.0
      }
      val good = times.filter(_ >= 0)
      val min = if (good.isEmpty) -1.0 else good.min
      println(f"QBENCH $name%-28s min=$min%8.3f reps=" +
        times.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
