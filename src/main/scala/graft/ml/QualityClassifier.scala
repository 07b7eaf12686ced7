package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Pretraining-data quality classifier: the learned keep/drop filter of
  * the GPT-3/CCNet-style curation stacks (a fastText-class model over
  * cheap text statistics; here MLlib gradient-boosted trees over the
  * SAME per-row signals the rule-based curation funnel uses, so the
  * learned filter and the rule filter share one feature codepath).
  *
  * Scale notes: feature extraction is narrow per-row expression work
  * (codegen'd, no shuffle); GBT training distributes over the cluster;
  * scoring is a broadcast of the model inside one mapPartitions — the
  * classifier adds no corpus-sized shuffle to a curation pipeline.
  */
object QualityClassifier {

  val featureCols: Array[String] =
    Array("f_len", "f_punct", "f_upper", "f_stop", "f_rep")

  /** Per-document quality signals (identical expressions to the curation
    * funnel's rule components). */
  def features(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("f_len",
        least(length(col(textCol)).cast("double") / 200.0, lit(1.0)))
      .withColumn("f_punct", TextFunctions.punctRatio(col(textCol)))
      .withColumn("f_upper", TextFunctions.upperRatio(col(textCol)))
      .withColumn("f_stop", TextFunctions.stopwordRatio(col(textCol)))
      .withColumn("f_rep", TextFunctions.repetitionRatio(col(textCol), 3))

  /** Train on (textCol, labelCol) — labelCol is 0/1 keep/drop. */
  def train(labeled: DataFrame, textCol: String,
      labelCol: String): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("features")
    val gbt = new GBTClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(20).setMaxDepth(3).setSeed(42)
    new Pipeline().setStages(Array(assembler, gbt))
      .fit(features(labeled, textCol))
  }

  /** Score a corpus: adds `prediction` (0.0 keep / 1.0 drop). */
  def score(model: PipelineModel, docs: DataFrame,
      textCol: String): DataFrame =
    model.transform(features(docs, textCol))
}
