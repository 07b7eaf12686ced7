package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-shaped quality classifier: a linear model over hashed
  * bag-of-ngram features (word unigrams + bigrams hashed into one
  * 2^18 bucket space) — the published shape of the CCNet / GPT-3 /
  * LLaMA pretraining-data quality filters (Joulin et al. 2017,
  * "Bag of Tricks for Efficient Text Classification"). The
  * vocabulary-free sibling of [[QualityClassifier]]'s
  * statistics-over-rules GBT: hashing needs no vocab broadcast or
  * fit-time dictionary, so the same featurizer runs identically on any
  * corpus shard.
  *
  * Scale shape: gram construction is a narrow row-local HOF projection;
  * HashingTF is row-local; LogisticRegression training is MLlib L-BFGS —
  * one treeAggregate gradient pass per iteration over cached features,
  * no shuffle; scoring broadcasts the dim-sized dense weight vector
  * (2^18 doubles ≈ 2 MB) inside one narrow map. Nothing corpus-sized
  * ever shuffles.
  */
object FastTextQuality {

  /** Word unigrams + adjacent bigrams of the lowercased text, one array
    * (fastText hashes both into a single feature space). */
  def ngrams(textCol: Column): Column = {
    val ws = split(lower(trim(textCol)), "\\s+")
    // sequence(0, -1) DESCENDS in Spark, so a sub-2-token text needs an
    // explicit empty branch, not a clamped upper bound
    val bigrams = when(size(ws) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2))))
    when(length(trim(textCol)) === 0, array().cast("array<string>"))
      .otherwise(concat(ws, bigrams))
  }

  private def featurize(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("_grams", ngrams(col(textCol)))

  /** Train on (textCol, labelCol = 0.0 keep / 1.0 drop). */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1 << 18): PipelineModel = {
    val tf = new HashingTF().setInputCol("_grams").setOutputCol("features")
      .setNumFeatures(dim).setBinary(true)
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(50).setRegParam(1e-4)
    new Pipeline().setStages(Array(tf, lr))
      .fit(featurize(labeled, textCol))
  }

  /** Score a corpus: adds `prediction` (0.0 keep / 1.0 drop) and
    * `probability`. */
  def score(model: PipelineModel, docs: DataFrame,
      textCol: String): DataFrame =
    model.transform(featurize(docs, textCol))
}
