package graft

import graft.operators.Relevance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelevanceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "spark spark spark join"),        // tf(spark)=3, short
      (2L, "spark join join join join"),     // tf(spark)=1
      (3L, "scan filter merge order"),       // no query terms
      (4L, "spark spark scan scan scan scan scan scan scan scan")
    ).toDF("doc_id", "text")
  }

  test("termStats: tf and df over the restricted vocabulary") {
    val stats = Relevance.termStats(fixture, "doc_id", "text", Seq("spark"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"))).toSet
    assert(stats == Set((1L, 3L, 3L), (2L, 1L, 3L), (4L, 2L, 3L)))
  }

  test("bm25: more hits rank higher, non-matching docs drop out") {
    val scored = Relevance.bm25(fixture, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      .toMap
    assert(!scored.contains(3L))
    // doc 1: tf 3 in a 4-token doc — highest; doc 4: tf 2 but long;
    // doc 2: tf 1
    assert(scored(1L) > scored(4L) && scored(4L) > scored(2L))
    assert(scored.values.forall(_ > 0))
  }

  test("bm25 quantized mode preserves the raw ranking") {
    val raw = Relevance.bm25(fixture, "doc_id", "text", Seq("spark", "join"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      .toMap
    val q = Relevance.bm25(fixture, "doc_id", "text", Seq("spark", "join"),
        quantize = Some(1000000L))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      .toMap
    assert(raw.keySet == q.keySet)
    raw.foreach { case (id, s) => assert(math.abs(q(id) - s) < 1e-5) }
    assert(raw.toSeq.sortBy(-_._2).map(_._1) == q.toSeq.sortBy(-_._2).map(_._1))
  }

  private def phraseFixture = {
    import spark.implicits._
    Seq(
      (1L, "a b a b a c"),          // "a b a" twice (overlapping), "b a b" once
      (2L, "x a y b z a"),          // terms present, never consecutive
      (3L, "a b"),                  // proper prefix only
      (4L, "c c a b a c")           // "a b a" once
    ).toDF("doc_id", "text")
  }

  test("phraseOccurrences: counts consecutive runs, overlapping included") {
    val r = Relevance.phraseOccurrences(phraseFixture, "doc_id", "text",
        Seq("a", "b", "a"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_occurrences")).toMap
    assert(r == Map(1L -> 2L, 4L -> 1L))
  }

  test("phraseOccurrences: scattered terms and prefixes never match") {
    val r = Relevance.phraseOccurrences(phraseFixture, "doc_id", "text",
      Seq("b", "a", "b"))
    assert(r.collect().map(x => x.getAs[Long]("doc_id") ->
      x.getAs[Long]("n_occurrences")).toMap == Map(1L -> 1L))
    assert(Relevance.phraseOccurrences(phraseFixture, "doc_id", "text",
      Seq("z", "b")).count() == 0)
  }

  test("phraseOccurrences: single-term phrase degenerates to tf") {
    val r = Relevance.phraseOccurrences(phraseFixture, "doc_id", "text",
        Seq("a"))
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[Long]("n_occurrences")).toMap
    assert(r == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 2L))
  }

  test("rrfFuse: hand-computed fusion, tie order, and list coverage") {
    import spark.implicits._
    // query 1: lexical ranks a=1 b=2; semantic ranks b=1 c=2.
    // k=60 -> contributions: a: 10^9 div 61 = 16393442
    //   b: 10^9 div 62 + 10^9 div 61 = 16129032 + 16393442 = 32522474
    //   c: 10^9 div 62 = 16129032
    val lex = Seq((1L, "a", 1), (1L, "b", 2)).toDF("qid", "id", "rank")
    val sem = Seq((1L, "b", 1), (1L, "c", 2)).toDF("qid", "id", "rank")
    val got = Relevance.rrfFuse(Seq(lex, sem), "qid", "id", "rank")
      .orderBy("fused_rank")
      .collect().map(r => (r.getAs[String]("id"),
        r.getAs[Long]("rrf_score_ppb"), r.getAs[Long]("n_lists"),
        r.getAs[Int]("fused_rank"))).toSeq
    assert(got == Seq(("b", 32522474L, 2L, 1), ("a", 16393442L, 1L, 2),
      ("c", 16129032L, 1L, 3)))
    // equal scores tie on ascending id: two singleton lists, same rank
    val l2 = Seq((7L, "z", 3), (7L, "y", 3)).toDF("qid", "id", "rank")
    val t = Relevance.rrfFuse(Seq(l2), "qid", "id", "rank", topK = 2)
      .orderBy("fused_rank").collect().map(_.getAs[String]("id")).toSeq
    assert(t == Seq("y", "z"))
  }

  test("rankingMetrics: hand-computed recall/MRR/nDCG at ppm grain; " +
      "a perfect ranking scores nDCG exactly 10^6") {
    import spark.implicits._
    // discount table hand-verified: floor(1e6/log2(r+1)) for r=1..3
    assert(Relevance.dcgDiscounts(3) == Seq(1000000L, 630929L, 500000L))
    assert(Relevance.dcgIdealPrefix(3) ==
      Seq(1000000L, 1630929L, 2130929L))
    val results = Seq(
      // q1: hits at ranks 1 and 3, miss at 2
      (1L, "a", 1), (1L, "x", 2), (1L, "b", 3),
      // q2: top-3 misses the one relevant doc entirely
      (2L, "m", 1), (2L, "n", 2), (2L, "o", 3),
      // q3: perfect two-relevant ranking
      (3L, "p", 1), (3L, "q", 2))
      .toDF("qid", "id", "rank")
    val truth = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
      (2L, "z"), (3L, "p"), (3L, "q")).toDF("qid", "id")
    val got = Relevance.rankingMetrics(results, truth,
        "qid", "id", "rank", k = 3)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm"),
          r.getAs[Long]("mrr_ppm"), r.getAs[Long]("ndcg_ppm"),
          r.getAs[Long]("precision_ppm"), r.getAs[Long]("map_ppm")))
      .toMap
    // q1: 2 of 4 relevant in top-3 -> recall 0.5; first hit rank 1;
    // dcg = disc(1)+disc(3) = 1.5e6, idcg = prefix(min(4,3)) = 2130929;
    // precision@3 = 2/3 -> 666666; AP@3 = (P@1 + P@3) / min(4,3)
    //   = (1000000 + 2*1000000 div 3) div 3 = 1666666 div 3 = 555555
    assert(got(1L) == ((2L, 500000L, 1000000L,
      1500000L * 1000000L / 2130929L, 666666L, 555555L)), got.toString)
    // q2: zero hits -> all zeros (but the query IS emitted)
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    // q3: perfect 2-relevant ranking -> recall, MRR, nDCG, and MAP all
    // exactly 10^6 (n_rel = 2 <= k); precision@3 = 2/3
    assert(got(3L) == ((2L, 1000000L, 1000000L, 1000000L, 666666L,
      1000000L)))
  }

  test("rankingMetricsAt: the multi-cutoff pass equals the single-k " +
      "operator at every cutoff; hand-checked @1 slice") {
    import spark.implicits._
    val results = Seq(
      (1L, "a", 1), (1L, "x", 2), (1L, "b", 3),
      (2L, "m", 1), (2L, "n", 2), (2L, "o", 3),
      (3L, "p", 1), (3L, "q", 2))
      .toDF("qid", "id", "rank")
    val truth = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
      (2L, "z"), (3L, "p"), (3L, "q")).toDF("qid", "id")
    val at = Relevance.rankingMetricsAt(results, truth,
      "qid", "id", "rank", ks = Seq(1, 3))
    // each k-slice must equal the single-cutoff operator verbatim
    Seq(1, 3).foreach { k =>
      val slice = at.where(col("k") === k).drop("k")
        .collect().map(_.toString).sorted.toSeq
      val single = Relevance.rankingMetrics(results, truth,
          "qid", "id", "rank", k = k)
        .collect().map(_.toString).sorted.toSeq
      assert(slice == single, s"k=$k slice diverges")
    }
    // hand-checked @1: q1 takes its rank-1 hit of 4 relevant
    val q1at1 = at.where(col("k") === 1 && col("query_id") === 1L)
      .collect().head
    assert(q1at1.getAs[Long]("n_hits") == 1L &&
      q1at1.getAs[Long]("recall_ppm") == 250000L &&
      q1at1.getAs[Long]("mrr_ppm") == 1000000L &&
      q1at1.getAs[Long]("ndcg_ppm") == 1000000L &&
      q1at1.getAs[Long]("precision_ppm") == 1000000L &&
      q1at1.getAs[Long]("map_ppm") == 1000000L, q1at1.toString)
    // zero-hit queries are emitted at every cutoff
    assert(at.where(col("query_id") === 2L).count() == 2)
  }

  test("rankingMetrics: a rank outside [1, k] FAILS the job instead " +
      "of indexing the discount table from the end (r12 advice)") {
    import spark.implicits._
    val truth = Seq((1L, "a")).toDF("qid", "id")
    // rank -1 would read element_at(discounts, -1) = the LAST discount
    // and emit a negative mrr_ppm — garbage with no error before r13
    val bad = Seq((1L, "a", -1)).toDF("qid", "id", "rank")
    val e = intercept[Exception] {
      Relevance.rankingMetrics(bad, truth, "qid", "id", "rank", k = 3)
        .collect()
    }
    assert(e.getMessage.contains("rank must be >= 1"), e.getMessage)
    // rank 0 used to throw an opaque element_at error; now the same
    // contract message
    val zero = Seq((1L, "a", 0)).toDF("qid", "id", "rank")
    val e0 = intercept[Exception] {
      Relevance.rankingMetrics(zero, truth, "qid", "id", "rank", k = 3)
        .collect()
    }
    assert(e0.getMessage.contains("rank must be >= 1"), e0.getMessage)
    // over-k ranks are outside the @k window, not errors
    val over = Seq((1L, "a", 9)).toDF("qid", "id", "rank")
    val gotOver = Relevance.rankingMetrics(over, truth,
      "qid", "id", "rank", k = 3).collect()
    assert(gotOver.length == 1 &&
      gotOver.head.getAs[Long]("n_hits") == 0L)
  }
}
