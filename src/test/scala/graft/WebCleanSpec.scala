package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Web-text cleanup ([[TextFunctions.webClean]]): HTML strip, pinned
  * entity unescape, mojibake repair — known-answer cases for each rule
  * and for the rule ORDERING (strip before unescape; `&amp;` last).
  */
class WebCleanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def clean(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextFunctions.webClean(col("t")).as("c"))
      .head().getString(0)

  test("tags become spaces, script/style bodies vanish") {
    assert(clean("a<br>b") == "a b")
    assert(clean("<p>hello <b>world</b></p>") == "hello world")
    assert(clean("keep<script type=\"x\">var a = '<secret>';</script>me")
      == "keep me")
    assert(clean("x<style>.a { color: red }</style>y") == "x y")
  }

  test("entity subset unescapes; &amp; goes last (no double unescape)") {
    assert(clean("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; b&nbsp;c")
      == "a <tag> \"q\" 's' b c")
    // &amp;lt; is the ESCAPED text "&lt;" — must not become "<"
    assert(clean("&amp;lt;literal&amp;gt;") == "&lt;literal&gt;")
    assert(clean("fish &amp; chips") == "fish & chips")
  }

  test("strip runs before unescape: escaped tags stay text") {
    // if entities unescaped first, this would become a tag and vanish
    assert(clean("&lt;b&gt;not a tag&lt;/b&gt;") == "<b>not a tag</b>")
  }

  test("mojibake digraphs repair; clean text untouched") {
    assert(clean("CafÃ© crÃ¨me niÃ±o") == "Café crème niño")
    assert(clean("itâ€™s â€œquotedâ€“ishâ€¦") == "it’s “quoted–ish…")
    val plain = "already clean text with é and ü intact"
    assert(clean(plain) == plain)
  }

  test("whitespace collapses and trims after all rules") {
    assert(clean("  a   <p>  </p>  b  ") == "a b")
  }

  test("generated SQL twin mirrors every table entry") {
    val sql = TextFunctions.webCleanSql("t")
    (TextFunctions.htmlEntityTable ++ TextFunctions.mojibakeTable)
      .foreach { case (from, _) =>
        assert(sql.contains(from.replace("'", "''")),
          s"oracle SQL is missing table entry $from")
      }
    assert(sql.indexOf("'&amp;'") > sql.indexOf("'&lt;'"),
      "oracle must unescape &amp; after the other entities")
  }
}
