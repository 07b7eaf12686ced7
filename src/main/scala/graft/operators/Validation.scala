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
    // the grand total rides in-plan as a 1-row broadcast crossJoin onto
    // the (tiny, |labels|²-row) aggregated matrix — the scalar-total
    // pattern everywhere else in the library; the former
    // Window.partitionBy(lit(1)) planned as an unpartitioned WindowExec
    // (GlobalWindowGateSpec offender) for the same one pass
    val m = joined
      .groupBy(predictedCol, actualCol)
      .agg(count(lit(1)).as("n"))
    val tot = m.agg(sum(col("n")).as("_tot"))
    m.crossJoin(broadcast(tot))
      .withColumn("share",
        round(col("n") / col("_tot").cast("double"), 6))
      .drop("_tot")
      .withColumn("agree", col(predictedCol) === col(actualCol))
      .orderBy(predictedCol, actualCol)
  }

  /** CPD recall vs hand-labeled truth change points with a ± tolerance
    * window — the reference's headline CPD correctness metric
    * (`claudeupdate.md:29-35`, `validate_with_ground_truth.py:33-101`:
    * a detection within ±10 min of a labeled change point counts).
    *
    * @param candidates (device_id, timestamp_start) detections
    * @param truth      (device_id, truth_ts) labeled change points
    * @return per device: n_truth, n_matched, n_candidates, recall
    */
  def cpdRecall(candidates: DataFrame, truth: DataFrame,
      toleranceSec: Long = 600): DataFrame = {
    val tolUs = toleranceSec * 1000000L
    val c = candidates.select(col("device_id").as("c_dev"),
      col("timestamp_start"))
    val perTruth = truth.select("device_id", "truth_ts")
      .join(c, col("device_id") === col("c_dev") &&
        abs(unix_micros(col("truth_ts")) -
          unix_micros(col("timestamp_start"))) <= tolUs, "left")
      .groupBy("device_id", "truth_ts")
      .agg(max(col("c_dev").isNotNull).as("matched"))
    val perDevice = perTruth.groupBy("device_id").agg(
      count(lit(1)).as("n_truth"),
      count(when(col("matched"), 1)).as("n_matched"))
    val candCounts = candidates.groupBy("device_id")
      .agg(count(lit(1)).as("n_candidates"))
    perDevice.join(candCounts, Seq("device_id"), "left")
      .na.fill(0L, Seq("n_candidates"))
      .withColumn("recall",
        col("n_matched").cast("double") / col("n_truth"))
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
