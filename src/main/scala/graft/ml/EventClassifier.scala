package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SavitzkyGolay

/** STEP 2.1.3 event classifier, MLlib edition.
  *
  * The reference trains a 3-class XGBoost (load/dump/background) on
  * per-device time-series features
  * (`02.1.3_train_xgboost_model.py:146-196`: per-device Savitzky-Golay on
  * load_weight, 10-step diff velocities, stationary flag, squared terms,
  * one-hot prndl/state/software_state; 80/20 stratified split `:240-247`;
  * 95.55% accuracy baseline `:303-304`). XGBoost is not available offline,
  * so the model is MLlib's gradient-boosted trees behind the identical
  * feature pipeline — feature parity, swappable estimator.
  *
  * Scale notes: feature prep is window functions over
  * `(device_id ORDER BY timestamp)` — one shuffle; Savitzky-Golay runs as
  * a per-device `flatMapGroups` kernel (no driver loops); MLlib GBT
  * distributes tree building over the cluster.
  */
object EventClassifier {

  /** Per-device feature engineering mirroring `engineer_features`. Input
    * needs: device_id, timestamp, load_weight, altitude, current_speed,
    * prndl, state, software_state, system_engaged, parking_brake_applied,
    * ml_event_label. */
  def engineerFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // Savitzky-Golay per device (window 15 poly 3; short series fall back,
    // matching the reference's min(15, len) guard)
    val filtered = df
      .select(col("device_id"), col("timestamp"), col("load_weight"))
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (dev, it) =>
        val rows = it.toArray.sortBy(_._2.getTime)
        val y = rows.map(_._3)
        val sm =
          if (y.length >= 5)
            SavitzkyGolay.smooth(y, math.min(15, y.length | 1), 3)
          else y
        rows.zip(sm).map { case ((_, ts, _), v) => (dev, ts, v) }
      }
      .toDF("device_id", "timestamp", "load_weight_filtered")

    val w = Window.partitionBy("device_id").orderBy("timestamp")
    df.join(filtered, Seq("device_id", "timestamp"))
      .withColumn("load_weight_velocity",
        col("load_weight_filtered") - lag("load_weight_filtered", 10).over(w))
      .withColumn("altitude_velocity",
        col("altitude") - lag("altitude", 10).over(w))
      .withColumn("is_stationary",
        (col("current_speed") < 5.0).cast("int"))
      .withColumn("speed_squared", col("current_speed") * col("current_speed"))
      .withColumn("load_squared",
        col("load_weight_filtered") * col("load_weight_filtered"))
      .withColumn("system_engaged_i",
        coalesce(col("system_engaged").cast("int"), lit(0)))
      .withColumn("parking_brake_i",
        coalesce(col("parking_brake_applied").cast("int"), lit(0)))
      // one-hot via boolean columns (fixed enum domains — no indexer drift)
      .withColumns(Map(
        "prndl_park" -> (col("prndl") === "park").cast("int"),
        "prndl_reverse" -> (col("prndl") === "reverse").cast("int"),
        "prndl_neutral" -> (col("prndl") === "neutral").cast("int"),
        "prndl_drive" -> (col("prndl") === "drive").cast("int"),
        "prndl_low" -> (col("prndl") === "low").cast("int"),
        "prndl_unknown" -> (col("prndl") === "unknown").cast("int")))
      .withColumns(
        Seq("idle", "active", "loading", "hauling", "dumping", "stopped",
          "maintenance", "unknown")
          .map(s => s"state_$s" -> (col("state") === s).cast("int")).toMap)
      .withColumns(
        Seq("manual", "autonomous", "intervention", "fault", "disabled",
          "calibrating", "unknown")
          .map(s => s"sw_state_$s" -> (col("software_state") === s).cast("int"))
          .toMap)
      .na.fill(0.0, Seq("load_weight_velocity", "altitude_velocity"))
  }

  val featureCols: Seq[String] = Seq(
    "load_weight_filtered", "load_weight_velocity", "altitude_velocity",
    "current_speed", "speed_squared", "load_squared", "is_stationary",
    "system_engaged_i", "parking_brake_i") ++
    Seq("park", "reverse", "neutral", "drive", "low", "unknown")
      .map(s => s"prndl_$s") ++
    Seq("idle", "active", "loading", "hauling", "dumping", "stopped",
      "maintenance", "unknown").map(s => s"state_$s") ++
    Seq("manual", "autonomous", "intervention", "fault", "disabled",
      "calibrating", "unknown").map(s => s"sw_state_$s")

  /** The training pipeline: label index → assemble → boosted trees.
    * MLlib's GBT is binary-only, so the 3-class task runs one-vs-rest
    * (same 500-tree-capable boosted-tree family as the reference's
    * XGBoost config, `02.1.3_train_xgboost_model.py:73-85`). */
  def pipeline(maxIter: Int = 30, maxDepth: Int = 6): Pipeline = {
    val indexer = new StringIndexer()
      .setInputCol("ml_event_label").setOutputCol("label")
      .setStringOrderType("alphabetAsc")
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val gbt = new GBTClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(42)
    val ovr = new org.apache.spark.ml.classification.OneVsRest()
      .setClassifier(gbt)
      .setLabelCol("label").setFeaturesCol("features")
    new Pipeline().setStages(Array(indexer, assembler, ovr))
  }

  case class TrainResult(accuracy: Double, f1: Double,
      trainRows: Long, testRows: Long)

  /** 80/20 split (seeded like the reference's random_state=42), train,
    * evaluate accuracy + weighted F1. Binary-label data trains directly on
    * GBT; the 3-class case goes through one-vs-rest internally. */
  def trainAndEvaluate(labeled: DataFrame, maxIter: Int = 30)
      : TrainResult = {
    val feats = engineerFeatures(labeled)
    val Array(train, test) = feats.randomSplit(Array(0.8, 0.2), seed = 42)
    val model = pipeline(maxIter).fit(train)
    val pred = model.transform(test)
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName("accuracy").evaluate(pred)
    val f1 = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName("f1").evaluate(pred)
    TrainResult(acc, f1, train.count(), test.count())
  }
}
