package graft

import graft.ml.QualityClassifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite {
  import SparkTestSession._

  private def corpus(n: Int, offset: Int = 0) = {
    import spark.implicits._
    (offset until offset + n).map { i =>
      val good = "the quick brown fox jumps over a lazy dog and then " +
        s"walks to the market in town number $i with some friends"
      val bad = (i % 3) match {
        case 0 => Seq.fill(12)(s"spam$i spam$i").mkString(" ")  // repetition
        case 1 => s"!!! ### $$$$$$ %%% @@@ &&& *** ((( ))) [[[ ]]] $i !!!"
        case _ => s"SHOUTING ALL CAPS NONSTOP TEXT BLOCK $i AAAH EEEK"
      }
      Seq((2L * i, good, 0.0), (2L * i + 1, bad, 1.0))
    }.flatten.toDF("doc_id", "text", "label")
  }

  test("learned keep/drop filter separates clean from junk docs") {
    val train = corpus(40)
    val test = corpus(15, offset = 1000)
    val model = QualityClassifier.train(train, "text", "label")
    val scored = QualityClassifier.score(model, test, "text")
    val acc = scored
      .select(avg(when(col("prediction") === col("label"), 1.0)
        .otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.9, s"held-out accuracy $acc < 0.9")
  }

  test("scoring adds no corpus shuffle (no Exchange in the plan)") {
    val train = corpus(10)
    val model = QualityClassifier.train(train, "text", "label")
    val plan = QualityClassifier.score(model, corpus(5, 500), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"classifier scoring should be narrow, plan was:\n$plan")
  }
}
