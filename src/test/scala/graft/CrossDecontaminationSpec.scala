package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Cross-corpus near-dup decontamination ([[Dedup.minhashCrossDupPairs]]):
  * corpus docs flagged iff they near-duplicate a REFERENCE (benchmark)
  * doc — corpus-internal duplicates must never flag, and clean corpora
  * must come back empty.
  */
class CrossDecontaminationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // long word sequences so trigram Jaccard is sharp: the contaminated
  // doc shares all but the tail; the clean docs share nothing
  private val bench1 =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
  private val bench2 =
    "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
  private val clean =
    "red orange yellow green blue indigo violet crimson amber teal " +
      "maroon olive navy silver copper bronze pearl slate ivory jade"

  private def reference = Seq(
    (1001L, bench1), (1002L, bench2)).toDF("doc_id", "text")

  private def corpus = Seq(
    (1L, bench1 + " with a short extra tail"), // near-copy of bench1
    (2L, clean),
    (3L, clean),                               // corpus-internal exact dup
    (4L, "totally different words entirely unrelated to anything else " +
      "written in any benchmark document of the reference suite corpus")
  ).toDF("doc_id", "text")

  test("planted near-copy is flagged against its reference doc only") {
    val r = Dedup.minhashCrossDupPairs(corpus, reference,
        "doc_id", "text", threshold = 0.5)
      .collect().map(x => (x.getAs[Long]("id"), x.getAs[Long]("ref_id"),
        x.getAs[Double]("jaccard")))
    assert(r.map(p => (p._1, p._2)).toSet == Set((1L, 1001L)))
    // 18 of bench1's 18+? trigrams survive; verified similarity is high
    assert(r.head._3 > 0.7 && r.head._3 <= 1.0)
  }

  test("corpus-internal duplicates never flag; clean corpus is empty") {
    // docs 2 and 3 are identical to each other but unlike any reference
    val flagged = Dedup.minhashCrossDupPairs(corpus, reference,
      "doc_id", "text", threshold = 0.5)
    assert(!flagged.select("id").as[Long].collect().toSet
      .exists(Set(2L, 3L, 4L)))
    val cleanOnly = Dedup.minhashCrossDupPairs(
      corpus.where(col("doc_id") =!= 1L), reference,
      "doc_id", "text", threshold = 0.5)
    assert(cleanOnly.count() == 0)
  }

  test("identical doc on both sides verifies at jaccard 1.0") {
    val r = Dedup.minhashCrossDupPairs(
        Seq((7L, bench2)).toDF("doc_id", "text"), reference,
        "doc_id", "text", threshold = 0.9)
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("ref_id") == 1002L)
    assert(r.head.getAs[Double]("jaccard") == 1.0)
  }
}
