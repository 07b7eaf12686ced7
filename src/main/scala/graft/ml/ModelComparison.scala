package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Head-to-head model validation (STEP 2.1.2's
  * `model_comparison_validation.py:111-239`): run two trained models over
  * the same held-out frame and report per-model accuracy, agreement rate,
  * and the prediction cross-matrix — the A/B harness the reference uses to
  * gate model swaps.
  */
object ModelComparison {

  case class Result(
      accuracyA: Double, accuracyB: Double, agreementRate: Double,
      nRows: Long, crossMatrix: DataFrame)

  /** Both transformers must emit `prediction` given the holdout's feature
    * columns; `labelCol` is the indexed ground-truth label. */
  def compare(modelA: Transformer, modelB: Transformer,
      holdout: DataFrame, labelCol: String = "label"): Result = {
    // stamp the row id ONCE before either transform (a model's transform
    // may change partitioning, so two separately generated monotonic ids
    // would not align) and pin it with a cache
    val withId = holdout.withColumn("_rid", monotonically_increasing_id())
      .cache()
    val pa = modelA.transform(withId)
      .select(col("_rid"), col(labelCol), col("prediction").as("pred_a"))
    val pb = modelB.transform(withId)
      .select(col("_rid"), col("prediction").as("pred_b"))
    val joined = pa.join(pb, "_rid").cache()

    val agg = joined.agg(
      count(lit(1)).as("n"),
      avg((col("pred_a") === col(labelCol)).cast("double")).as("acc_a"),
      avg((col("pred_b") === col(labelCol)).cast("double")).as("acc_b"),
      avg((col("pred_a") === col("pred_b")).cast("double")).as("agree"))
      .head()

    val matrix = joined.groupBy("pred_a", "pred_b")
      .agg(count(lit(1)).as("n"))
      .orderBy("pred_a", "pred_b")

    Result(agg.getAs[Double]("acc_a"), agg.getAs[Double]("acc_b"),
      agg.getAs[Double]("agree"), agg.getAs[Long]("n"), matrix)
  }
}
