package graft

import graft.operators.SftFormat
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SFT chat rendering: the loss-mask invariant
  * substr(train_text, start_off, span_len) == span_text on every row,
  * a hand-computed fixture, and the stripped-render reassembly. */
class SftFormatSpec extends AnyFunSuite {
  import SparkTestSession._

  test("hand-computed two-turn fixture: render and offsets") {
    import spark.implicits._
    val df = Seq((1L, "hi", "hello there", "bye", "see you"))
      .toDF("doc_id", "u1", "a1", "u2", "a2")
    val rows = SftFormat.renderTwoTurn(df, "doc_id",
        col("u1"), col("a1"), col("u2"), col("a2"))
      .collect().sortBy(_.getAs[Int]("turn"))
    val want =
      "<|user|> hi <|assistant|> hello there <|user|> bye <|assistant|> see you"
    assert(rows.forall(_.getAs[String]("train_text") == want))
    val r1 = rows(0)
    assert(r1.getAs[Int]("start_off") == "<|user|> hi <|assistant|> ".length + 1)
    assert(r1.getAs[String]("span_text") == "hello there")
    val r2 = rows(1)
    assert(r2.getAs[String]("span_text") == "see you")
    assert(want.substring(r2.getAs[Int]("start_off") - 1,
      r2.getAs[Int]("start_off") - 1 + r2.getAs[Int]("span_len"))
      == "see you")
  }

  test("short documents (< 4 tokens) render with empty segments, " +
      "never nulls, and the loss-mask invariant still holds") {
    import spark.implicits._
    val docs = Seq((1L, "ab"), (2L, "x y"), (3L, "a b c"), (4L, "   "))
      .toDF("doc_id", "text")
    val turns = SftFormat.quartersFromText(docs, "doc_id", "text")
    val rows = SftFormat.renderTwoTurn(turns, "doc_id",
      col("u1"), col("a1"), col("u2"), col("a2")).collect()
    assert(rows.length == 8, "two turns per doc, none dropped")
    rows.foreach { r =>
      val t = r.getAs[String]("train_text")
      assert(t != null && t.contains("<|assistant|>"))
      val s = r.getAs[Int]("start_off") - 1
      val l = r.getAs[Int]("span_len")
      assert(t.substring(s, s + l) == r.getAs[String]("span_text"),
        s"offset drift for short doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("loss-mask invariant holds on the corpus-derived quarters, and " +
      "stripping role markers reassembles the normalized text") {
    val docs = graft.Tables.documents(spark, sf).limit(80)
    val turns = SftFormat.quartersFromText(docs, "doc_id", "text")
    val rows = SftFormat.renderTwoTurn(turns, "doc_id",
      col("u1"), col("a1"), col("u2"), col("a2")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("train_text")
      val s = r.getAs[Int]("start_off") - 1
      val l = r.getAs[Int]("span_len")
      assert(t.substring(s, s + l) == r.getAs[String]("span_text"),
        s"offset drift for doc ${r.getAs[Long]("doc_id")}")
    }
    val orig = docs.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.replaceAll("\\s+", " ")).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val stripped = rs.head.getAs[String]("train_text")
        .replace("<|user|>", " ").replace("<|assistant|>", " ")
        .replaceAll("\\s+", " ").trim
      assert(stripped == orig(id), s"doc $id reassembly")
    }
  }
}
