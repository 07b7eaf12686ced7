package graft.tools

/** Standalone runner for [[ScaleBench.boundaryRecall]] — the SemDedup
  * boundary-pair recall/cost table without the full 10× sweep.
  * Run: sbt "Test/runMain graft.tools.SemDedupRecallBench" */
object SemDedupRecallBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleBench.boundaryRecall(spark)
    spark.stop()
  }
}
