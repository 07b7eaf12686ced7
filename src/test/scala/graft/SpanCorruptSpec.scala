package graft

import graft.operators.SpanCorrupt
import org.scalatest.funsuite.AnyFunSuite

/** T5-style span corruption: the sentinel round trip must reconstruct
  * the original text, every block decision must replay from the local
  * hash twin, and the rate knobs must behave at both extremes. */
class SpanCorruptSpec extends AnyFunSuite {
  import SparkTestSession._

  private def reconstruct(input: String, target: String): String = {
    // parse "<extra_id_k> span..." segments, substitute back
    val spans = "<extra_id_(\\d+)> ?".r.split(target).drop(1)
    var out = input
    spans.zipWithIndex.foreach { case (span, k) =>
      out = out.replace(s"<extra_id_$k>", span.trim)
    }
    out.replaceAll("\\s+", " ").trim
  }

  test("sentinel round trip reconstructs the original text") {
    import spark.implicits._
    val docs = (0L until 60L)
      .map(i => (i, s"alpha beta g$i delta epsilon zeta eta theta " * 3))
      .toDF("doc_id", "text")
    val byId = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.replaceAll("\\s+", " ")).toMap
    SpanCorrupt.corrupt(docs, "doc_id", "text", maskPct = 40)
      .collect().foreach { r =>
        val id = r.getAs[Long]("doc_id")
        val got = reconstruct(r.getAs[String]("input_text"),
          r.getAs[String]("target_text"))
        assert(got == byId(id), s"doc $id round trip")
        // sentinel indices are dense 0..n_spans-1 in both outputs
        val n = r.getAs[Int]("n_spans")
        (0 until n).foreach { k =>
          assert(r.getAs[String]("input_text").contains(s"<extra_id_$k>"))
          assert(r.getAs[String]("target_text").contains(s"<extra_id_$k>"))
        }
      }
  }

  test("block decisions replay from the local hash twin") {
    import spark.implicits._
    val docs = Seq((7L, "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen"))
      .toDF("doc_id", "text")
    val row = SpanCorrupt.corrupt(docs, "doc_id", "text", maskPct = 60)
      .head()
    val toks = docs.head().getString(1).split("\\s+").toSeq
    val nBlocks = (toks.size + 7) / 8
    var k = 0
    val frags = Seq.newBuilder[String]
    val tgts = Seq.newBuilder[String]
    (0 until nBlocks).foreach { b =>
      val block = toks.slice(b * 8, b * 8 + 8)
      def h(salt: String) = math.floorMod(
        graft.functions.Hashing.md5Long56Local(s"${salt}7:$b"), 100L)
      def h2(salt: String, m: Long) = math.floorMod(
        graft.functions.Hashing.md5Long56Local(s"${salt}7:$b"), m)
      if (block.nonEmpty && h("span|") < 60) {
        val off = h2("spanO|", block.size.toLong).toInt
        val len = math.min(h2("spanL|", 3L).toInt + 1, block.size - off)
        frags += (block.take(off) ++ Seq(s"<extra_id_$k>") ++
          block.drop(off + len)).mkString(" ")
        tgts += s"<extra_id_$k> " + block.slice(off, off + len).mkString(" ")
        k += 1
      } else frags += block.mkString(" ")
    }
    assert(row.getAs[String]("input_text") == frags.result().mkString(" "))
    assert(row.getAs[String]("target_text") == tgts.result().mkString(" "))
    assert(row.getAs[Int]("n_spans") == k)
  }

  test("rate extremes and null/empty passthrough") {
    import spark.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val zero = SpanCorrupt.corrupt(docs, "doc_id", "text", maskPct = 0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(zero(1L).getAs[String]("input_text") == "")
    assert(zero(2L).getAs[String]("input_text") == "")
    assert(zero(3L).getAs[String]("input_text") == "a b c d e f g h i j")
    assert(zero.values.forall(_.getAs[Int]("n_spans") == 0))
    val full = SpanCorrupt.corrupt(docs, "doc_id", "text", maskPct = 100)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(full(3L).getAs[Int]("n_spans") == 2) // 10 tokens → 2 blocks
    assert(full(1L).getAs[Int]("n_spans") == 0)
  }
}
