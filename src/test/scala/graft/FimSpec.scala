package graft

import graft.operators.DataPrep
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fill-in-the-middle transform: the defining reassembly invariant
  * (prefix + middle + suffix == original for every applied row), exact
  * replay from the local hash twin, the apply rate, and null/edge
  * passthrough. */
class FimSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Psm =
    "(?s)^<fim_prefix>(.*)<fim_suffix>(.*)<fim_middle>(.*)$".r

  test("applied rows reassemble to the original; cut points replay from " +
      "the local hash twin") {
    import spark.implicits._
    val docs = (0L until 100L)
      .map(i => (i, s"doc $i body " + ("x" * (i % 17).toInt)))
      .toDF("doc_id", "text")
    val byId = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = DataPrep.fimTransform(docs, "doc_id", "text", fimRate = 0.5)
      .collect()
    var applied = 0
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val orig = byId(id)
      if (r.getAs[Boolean]("fim_applied")) {
        applied += 1
        val Psm(p, s, m) = r.getAs[String]("text_out")
        assert(p + m + s == orig, s"doc $id does not reassemble")
        // cut points from the driver-side md5 twin
        val n = orig.length.toLong
        val a = math.floorMod(
          graft.functions.Hashing.md5Long56Local(s"fimA|$id"), n + 1)
        val b = math.floorMod(
          graft.functions.Hashing.md5Long56Local(s"fimB|$id"), n + 1)
        assert(p.length == math.min(a, b) && m.length == math.abs(a - b))
      } else {
        assert(r.getAs[String]("text_out") == orig)
        assert(math.floorMod(graft.functions.Hashing
          .md5Long56Local(s"fim|$id"), 1000000L) >= 500000L)
      }
    }
    // the md5 apply-draw should land near the rate on 100 docs
    assert(applied >= 35 && applied <= 65, s"applied=$applied")
  }

  test("null and empty text pass through; rate 0 and 1 are total") {
    import spark.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "ab"))
      .toDF("doc_id", "text")
    val never = DataPrep.fimTransform(docs, "doc_id", "text", fimRate = 0.0)
      .collect()
    assert(never.forall(!_.getAs[Boolean]("fim_applied")))
    assert(never.find(_.getLong(0) == 1L).get.getAs[String]("text_out")
      == null)
    val always = DataPrep.fimTransform(docs, "doc_id", "text", fimRate = 1.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!always(1L).getAs[Boolean]("fim_applied")) // null never applies
    assert(always(2L).getAs[String]("text_out")
      == "<fim_prefix><fim_suffix><fim_middle>")
    val Psm(p, s, m) = always(3L).getAs[String]("text_out")
    assert(p + m + s == "ab")
  }
}
