package graft

import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  import SparkTestSession._

  private val good1 = "the quick brown fox jumps over the lazy dog and " +
    "it was a fine day for all of the animals in the field as they sat " +
    "by the river"
  private val good2 = "a different story about the weather in the north " +
    "where it rains for most of the year and the people are used to it " +
    "by now"
  private val pii = "please write to us at user@example.com if you want " +
    "to hear more about the plan for the garden and the trees we hope " +
    "to plant this spring"
  private val contam = "this is the secret benchmark passage that must " +
    "never appear in the training data for it would leak the answers"

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, good1), (2L, good2),
      (3L, good1),                                 // exact dup of 1
      (4L, good1 + " with a few extra tail words"), // near dup of 1
      (5L, "el perro corre por la calle y se va a la casa donde vive " +
        "con toda la familia"),                    // non-English
      (6L, Seq.fill(12)("the cat sat on the mat and").mkString(" ")), // repetitive
      (7L, pii),                                   // survives, redacted
      (8L, contam + " plus some extra words around the passage to make " +
        "it a real document"))                     // contaminated
      .toDF("doc_id", "text")
  }

  test("curate composes filters, dedup stages and decontamination") {
    import spark.implicits._
    val benchmark = Seq((100L, contam)).toDF("doc_id", "text")
    val kept = graft.operators.Curation
      .curate(corpus, "doc_id", "text", Some(benchmark))
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 7L))
    val redacted = kept.where($"doc_id" === 7L)
      .select("text").head().getString(0)
    assert(redacted.contains("<EMAIL>") && !redacted.contains("user@"))
  }

  test("report counts every funnel stage") {
    val r = graft.operators.Curation.report(corpus, "doc_id", "text")
    assert(r("input") == 8L)
    assert(r("after_filters") == 6L)     // -5 (lang), -6 (repetition)
    assert(r("after_exact_dedup") == 5L) // -3
    assert(r("after_near_dedup") == 4L)  // -4
    assert(r("curated") == 4L)           // no benchmark given
  }

  test("bag-of-words dedup stage drops word-order permutations; " +
      "compression band drops long-period loop spam") {
    import spark.implicits._
    import graft.operators.Curation
    // 20-word period: repetitionRatio's 3-gram window misses it, the
    // deflate ratio does not
    val loopSpam = Seq.fill(12)("the quick brown fox jumps over a lazy " +
      "dog while the other animals watch from the side of the field")
      .mkString(" ")
    val permuted = good1.split(" ").reverse.mkString(" ")
    val docs = Seq((1L, good1), (2L, good2), (3L, permuted),
      (4L, loopSpam)).toDF("doc_id", "text")
    val defaults = Curation.curate(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // default rules: permutation and loop spam both survive
    assert(Set(1L, 2L, 3L).subsetOf(defaults))
    val strict = Curation.curate(docs, "doc_id", "text",
        rules = Curation.Rules(bowDedup = true,
          compressionBand = Some((0.2, 0.95))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L, 2L))
  }

  test("c4LineClean applies the published line and page rules") {
    import spark.implicits._
    import graft.operators.Curation
    val goodPage = Seq(
      "this is a good line.",        // kept
      "too short.",                  // < 3 words
      "no terminal punct here",      // no . ! ? "
      "this line mentions javascript sadly.", // javascript
      "another perfectly good line!",
      "a third fine line?",
      "he said \"yes indeed\"",      // ends in closing quote
      "one more to clear the page minimum.").mkString("\n")
    val fourLinePage = Seq(          // only 4 surviving lines < 5
      "a good line number one.", "a good line number two.",
      "a good line number three.", "a good line number four.")
      .mkString("\n")
    val loremPage = goodPage + "\nsome lorem ipsum filler appears here."
    val bracePage = goodPage + "\nvar config = { x } ends the page."
    val closeBracePage = goodPage + "\na stray } appears on this page."
    val docs = Seq((1L, goodPage), (2L, fourLinePage), (3L, loremPage),
      (4L, bracePage), (5L, closeBracePage)).toDF("doc_id", "text")
    val r = Curation.c4LineClean(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getBoolean(3), x.getString(4)))
      .toMap
    assert(r(1L)._1 == 8 && r(1L)._2 == 5 && r(1L)._3)
    assert(r(1L)._4 == Seq("this is a good line.",
      "another perfectly good line!", "a third fine line?",
      "he said \"yes indeed\"",
      "one more to clear the page minimum.").mkString("\n"))
    assert(!r(2L)._3 && r(2L)._2 == 4)   // below min surviving lines
    assert(!r(3L)._3 && r(3L)._4 == "")  // lorem ipsum page rule
    assert(!r(4L)._3)                    // curly-bracket page rule
    assert(!r(5L)._3)                    // '}' alone also blocks the page
  }

  test("lineDedup keeps only the (min doc, min idx) copy of each line") {
    import spark.implicits._
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "x\ny\nz"),   // all first occurrences
      (2L, "y\nw\nx"),   // y, x dup away; w survives
      (3L, "z"),         // fully deduplicated
      (4L, "d\nd")       // within-doc dup: first copy only
    ).toDF("doc_id", "text")
    val r = Dedup.lineDedup(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(1L) == ((3L, 3L, "x\ny\nz")))
    assert(r(2L) == ((3L, 1L, "w")))
    assert(r(3L) == ((1L, 0L, "")))
    assert(r(4L) == ((2L, 1L, "d")))
  }

  test("lineDedup plan: one split per branch, never inside the rebuild " +
      "lambda (the per-kept-line re-split trap)") {
    import spark.implicits._
    import graft.operators.Dedup
    val docs = Seq((1L, "a\nb"), (2L, "b\nc")).toDF("doc_id", "text")
    val opt = Dedup.lineDedup(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString()
    // exactly two splits: the hash-key branch's posexplode input and the
    // ONE post-join rebuild split (CollapseProject must not inline the
    // non-cheap split into its three consumers)
    val nSplit = "split\\(".r.findAllIn(opt).length
    assert(nSplit == 2, s"expected 2 split() sites, got $nSplit in:\n$opt")
    // and none of them may sit under a lambdafunction — that shape
    // re-splits the whole document once per kept line
    opt.linesIterator.filter(_.contains("lambdafunction")).foreach { l =>
      assert(!l.contains("split("),
        s"split() leaked into a lambda: $l")
    }
  }
}
