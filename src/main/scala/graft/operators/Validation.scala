package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ground-truth validation (SURVEY §5.1): inner-join pipeline labels
  * against hand-labeled truth on (device_id, timestamp) and report the
  * (predicted, actual) agreement matrix — the reference's
  * `validate_with_ground_truth.py:33-101` discrepancy report.
  */
object Validation {

  /** Discrepancy matrix: one row per (predicted, actual) pair with count
    * and share of the joined rows. */
  def groundTruthDiscrepancy(labeled: DataFrame, truth: DataFrame,
      predictedCol: String = "ml_event_label",
      actualCol: String = "actual_event_label"): DataFrame = {
    val joined = labeled.join(truth, Seq("device_id", "timestamp"))
    val total = joined.count().toDouble
    joined
      .groupBy(predictedCol, actualCol)
      .agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 6))
      .withColumn("agree", col(predictedCol) === col(actualCol))
      .orderBy(predictedCol, actualCol)
  }

  /** Scalar accuracy over the joined rows (the report's headline number). */
  def groundTruthAccuracy(labeled: DataFrame, truth: DataFrame,
      predictedCol: String = "ml_event_label",
      actualCol: String = "actual_event_label"): Double = {
    val joined = labeled.join(truth, Seq("device_id", "timestamp"))
    val row = joined.agg(
      count(lit(1)).as("n"),
      count(when(col(predictedCol) === col(actualCol), 1)).as("ok"))
      .head()
    if (row.getLong(0) == 0) 0.0
    else row.getLong(1).toDouble / row.getLong(0)
  }
}
