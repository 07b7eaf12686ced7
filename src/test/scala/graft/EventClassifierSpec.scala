package graft

import graft.ml.EventClassifier
import org.scalatest.funsuite.AnyFunSuite

class EventClassifierSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Synthetic separable fixture: loads are stationary+heavy with rising
    * load weight, dumps moving+falling weight, background cruising. */
  private def fixture() = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = for {
      dev <- Seq("t-1", "t-2", "t-3")
      i <- 0 until 400
    } yield {
      val label = i % 40 match {
        case k if k < 8  => "load_event"
        case k if k < 16 => "dump_event"
        case _           => "background"
      }
      val (speed, lw, alt) = label match {
        case "load_event" => (0.3 + rnd.nextDouble() * 0.1,
          20000.0 + (i % 8) * 8000 + rnd.nextGaussian() * 500, 250.0)
        case "dump_event" => (2.0 + rnd.nextDouble(),
          80000.0 - (i % 8) * 9000 + rnd.nextGaussian() * 500, 260.0)
        case _ => (8.0 + rnd.nextDouble() * 4,
          1000.0 + rnd.nextGaussian() * 200, 255.0 + rnd.nextGaussian())
      }
      val state = label match {
        case "load_event" => "loading"
        case "dump_event" => "dumping"
        case _            => "hauling"
      }
      (dev, new java.sql.Timestamp(1700000000000L + i * 500L), lw, alt,
        speed, if (i % 2 == 0) "drive" else "neutral", state, "autonomous",
        true, false, label)
    }
    rows.toDF("device_id", "timestamp", "load_weight", "altitude",
      "current_speed", "prndl", "state", "software_state",
      "system_engaged", "parking_brake_applied", "ml_event_label")
  }

  test("3-class boosted-tree pipeline learns the separable fixture") {
    val res = EventClassifier.trainAndEvaluate(fixture(), maxIter = 8)
    assert(res.trainRows + res.testRows == 1200)
    assert(res.accuracy > 0.9, s"accuracy ${res.accuracy}")
    assert(res.f1 > 0.9, s"f1 ${res.f1}")
  }

  test("A/B comparison ranks the stronger model and reports agreement") {
    import graft.ml.ModelComparison
    val feats = EventClassifier.engineerFeatures(fixture())
    val Array(train, test) = feats.randomSplit(Array(0.8, 0.2), seed = 42)
    val strong = EventClassifier.pipeline(maxIter = 8).fit(train)
    val weak = EventClassifier.pipeline(maxIter = 1, maxDepth = 1).fit(train)
    // holdout must carry label + features for both models
    val holdout = strong.stages.take(2).foldLeft(test)((d, t) => t.transform(d))
    val res = ModelComparison.compare(
      strong.stages.last, weak.stages.last, holdout)
    assert(res.nRows > 0)
    // the fixture is cleanly separable — even the stump can reach 1.0, so
    // assert ordering weakly and full marks for the strong model
    assert(res.accuracyA >= res.accuracyB,
      s"strong ${res.accuracyA} < weak ${res.accuracyB}")
    assert(res.accuracyA > 0.95)
    assert(res.agreementRate > 0.4 && res.agreementRate <= 1.0)
    assert(res.crossMatrix.count() > 0)
  }
}
