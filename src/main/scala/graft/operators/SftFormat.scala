package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT (instruction-tuning) chat-template rendering with loss-mask
  * spans: turn a (user, assistant)* conversation into ONE training
  * string plus the character offsets of the assistant spans — the
  * loss mask every SFT trainer needs (loss is computed only on
  * assistant tokens; rendering and masking must come from the same
  * arithmetic or they drift, which is exactly the bug class this
  * operator exists to prevent).
  *
  * Template: `<|user|> U <|assistant|> A` repeated per exchange, single
  * spaces between role markers and contents (empty contents keep their
  * surrounding spaces so offset arithmetic never branches).
  *
  * The demo query derives a deterministic 2-exchange conversation from
  * each document (token quarters: U1 A1 U2 A2) because the test corpus
  * has no conversation table; the OPERATOR takes arbitrary turn
  * columns. Offsets are 1-based (substr convention) and satisfy the
  * spec-pinned invariant
  * `substr(train_text, start_off, span_len) == span_text`.
  *
  * Plan shape: pure column expressions — one narrow codegen projection
  * + a 2-row posexplode per doc; zero shuffles, no UDF; every length
  * is computed from the SAME concat tree that builds the render, so
  * the SQL oracle replays offsets exactly.
  */
object SftFormat {

  /** Render one 2-exchange conversation per row from four turn
    * columns. Returns one row per ASSISTANT span:
    * (idCol, train_text, turn, start_off, span_len, span_text). */
  def renderTwoTurn(df: DataFrame, idCol: String,
      u1: Column, a1: Column, u2: Column, a2: Column): DataFrame = {
    val p1 = concat(lit("<|user|> "), u1, lit(" <|assistant|> "))
    val render = concat(p1, a1, lit(" <|user|> "), u2,
      lit(" <|assistant|> "), a2)
    val start1 = length(p1) + 1
    val p2 = concat(p1, a1, lit(" <|user|> "), u2, lit(" <|assistant|> "))
    val start2 = length(p2) + 1
    df.select(col(idCol), render.as("train_text"),
        posexplode(array(
          struct(start1.as("start_off"), length(a1).as("span_len"),
            a1.as("span_text")),
          struct(start2.as("start_off"), length(a2).as("span_len"),
            a2.as("span_text")))).as(Seq("turn", "span")))
      .select(col(idCol), col("train_text"),
        (col("turn") + 1).as("turn"),
        col("span.start_off"), col("span.span_len"), col("span.span_text"))
  }

  /** Token-quarter conversation derivation for corpora without a turn
    * structure (the demo/gate path): quarters of the whitespace token
    * stream become U1 A1 U2 A2. */
  def quartersFromText(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val q = size(toks)
    def bound(k: Int): Column =
      floor(q.cast("double") * k / 4.0).cast("int")
    def seg(from: Column, until: Column): Column =
      concat_ws(" ", slice(toks, from + 1, until - from))
    docs.where(col(textCol).isNotNull)
      .select(col(idCol),
        seg(lit(0), bound(1)).as("u1"),
        seg(bound(1), bound(2)).as("a1"),
        seg(bound(2), bound(3)).as("u2"),
        seg(bound(3), q).as("a2"))
  }
}
