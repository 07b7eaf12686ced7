package graft

import graft.ml.FastTextQuality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FastTextQualitySpec extends AnyFunSuite {
  import SparkTestSession._

  /** Junk classes chosen so separation needs the TEXT (hashed n-grams),
    * not just surface statistics: the junk is grammatical-looking word
    * soup with normal length/punctuation, distinguished by its content
    * words — the regime where the statistics-based [[QualityClassifier]]
    * features are blind and a bag-of-ngrams model is the standard fix. */
  private def corpus(n: Int, offset: Int = 0) = {
    import spark.implicits._
    (offset until offset + n).map { i =>
      val good = "the quick brown fox jumps over a lazy dog and then " +
        s"walks to the market in town number $i with some friends."
      val bad = "buy cheap pills online casino bonus click here free " +
        s"winner prize claim now offer $i limited deal discount code."
      Seq((2L * i, good, 0.0), (2L * i + 1, bad, 1.0))
    }.flatten.toDF("doc_id", "text", "label")
  }

  test("hashed-ngram linear model separates held-out spam from prose") {
    val train = corpus(40)
    val test = corpus(15, offset = 1000)
    val model = FastTextQuality.train(train, "text", "label")
    val scored = FastTextQuality.score(model, test, "text")
    val acc = scored
      .select(avg(when(col("prediction") === col("label"), 1.0)
        .otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.9, s"held-out accuracy $acc < 0.9")
  }

  test("ngrams emits unigrams plus adjacent bigrams; empty text is empty") {
    import spark.implicits._
    val out = Seq("a b c", "solo", "  ").toDF("t")
      .select(FastTextQuality.ngrams(col("t")).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a", "b", "c", "a b", "b c"))
    assert(out(1) == Seq("solo"))
    assert(out(2) == Seq.empty)
  }

  test("scoring adds no corpus shuffle (no Exchange in the plan)") {
    val model = FastTextQuality.train(corpus(10), "text", "label")
    val plan = FastTextQuality.score(model, corpus(5, 500), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"fastText scoring should be narrow, plan was:\n$plan")
  }
}
