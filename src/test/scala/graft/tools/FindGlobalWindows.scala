package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Diagnostic (test source set, not shipped in the main artifact): names
  * every driver query whose physical plan contains a Window node with an
  * empty partition spec — the source of WindowExec's "No Partition
  * Defined" warning. Run: sbt "Test/runMain graft.tools.FindGlobalWindows". */
object FindGlobalWindows {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val plan = q(spark, sfDir).queryExecution.executedPlan
        val hits = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => "Window"
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            "WindowGroupLimit"
        }
        if (hits.nonEmpty) println(s"GLOBALWINDOW $name ${hits.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"ERR $name ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
