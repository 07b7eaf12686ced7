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

  test("n-turn conversations: 1..4-turn fixtures incl. empty contents " +
      "— spans, ordinals, and the loss-mask invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(("user", "hello"))), // no assistant turn -> zero rows
      (2L, Seq(("user", "hi"), ("assistant", "yo"))),
      (3L, Seq(("user", ""), ("assistant", "a b"), ("user", "x"))),
      (4L, Seq(("user", "q1"), ("assistant", ""), ("user", "q2"),
        ("assistant", "fin al"))),
      // EMPTY conversation: zero rows, not a sequence(0,-1) crash
      (5L, Seq.empty[(String, String)]))
      .toDF("id", "raw")
      .withColumn("turns", transform(col("raw"),
        t => struct(t("_1").as("role"), t("_2").as("content"))))
    val rows = SftFormat.renderConversation(df, "id", col("turns"))
      .collect()
    assert(!rows.exists(_.getAs[Long]("id") == 1L),
      "a user-only conversation must contribute no spans")
    assert(!rows.exists(_.getAs[Long]("id") == 5L),
      "an EMPTY conversation must contribute no spans (and not crash)")
    // every span satisfies the invariant — offsets and render come
    // from the same arithmetic
    rows.foreach { r =>
      val tt = r.getAs[String]("train_text")
      val off = r.getAs[Int]("start_off") - 1
      assert(tt.substring(off, off + r.getAs[Int]("span_len"))
        == r.getAs[String]("span_text"), r.toString)
    }
    val r2 = rows.filter(_.getAs[Long]("id") == 2L)
    assert(r2.length == 1 &&
      r2.head.getAs[String]("train_text") == "<|user|> hi <|assistant|> yo" &&
      r2.head.getAs[Int]("turn") == 1 && r2.head.getAs[Int]("turn_pos") == 2)
    // 3-turn with empty first content: single assistant span at pos 2,
    // surrounded by the empty user turn's doubled space
    val r3 = rows.filter(_.getAs[Long]("id") == 3L)
    assert(r3.length == 1 &&
      r3.head.getAs[String]("train_text") ==
        "<|user|>  <|assistant|> a b <|user|> x" &&
      r3.head.getAs[String]("span_text") == "a b")
    // 4-turn with an EMPTY assistant span: both ordinals present, the
    // empty span has span_len 0 at the right offset
    val r4 = rows.filter(_.getAs[Long]("id") == 4L)
      .sortBy(_.getAs[Int]("turn"))
    assert(r4.map(_.getAs[Int]("turn")).toSeq == Seq(1, 2))
    assert(r4.map(_.getAs[Int]("turn_pos")).toSeq == Seq(2, 4))
    assert(r4.head.getAs[Int]("span_len") == 0)
    assert(r4(1).getAs[String]("span_text") == "fin al")
  }

  test("a null role or content FAILS THE JOB in-plan — even when the " +
      "corrupt conversation would emit zero spans") {
    import spark.implicits._
    def render(turns: Seq[(String, String)]) = {
      val df = Seq((1L, turns)).toDF("id", "raw")
        .withColumn("turns", transform(col("raw"),
          t => struct(t("_1").as("role"), t("_2").as("content"))))
      SftFormat.renderConversation(df, "id", col("turns")).collect()
    }
    // null CONTENT on an assistant turn
    val e1 = intercept[Exception] {
      render(Seq(("user", "hi"), ("assistant", null)))
    }
    assert(e1.getMessage.contains("null role/content"), e1.getMessage)
    // null ROLE — the span filter would read it as non-assistant and
    // silently emit zero rows without the guard
    val e2 = intercept[Exception] {
      render(Seq((null, "hi"), ("user", "x")))
    }
    assert(e2.getMessage.contains("null role/content"), e2.getMessage)
    // clean conversations through the SAME code path stay green
    assert(render(Seq(("user", "hi"), ("assistant", "yo"))).length == 1)
  }

  test("renderTwoTurn is the 4-element special case of " +
      "renderConversation (legacy shape preserved)") {
    import spark.implicits._
    val df = Seq((7L, "a", "b c", "", "d"))
      .toDF("doc_id", "u1", "a1", "u2", "a2")
    val legacy = SftFormat.renderTwoTurn(df, "doc_id",
      col("u1"), col("a1"), col("u2"), col("a2"))
    assert(legacy.columns.toSeq == Seq("doc_id", "train_text", "turn",
      "start_off", "span_len", "span_text"))
    val rows = legacy.collect().sortBy(_.getAs[Int]("turn"))
    assert(rows.map(_.getAs[Int]("turn")).toSeq == Seq(1, 2))
    assert(rows.forall(_.getAs[String]("train_text") ==
      "<|user|> a <|assistant|> b c <|user|>  <|assistant|> d"))
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
