package graft

import graft.operators.Tokenizer
import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {
  import SparkTestSession._

  test("wordFreq counts lower-cased whitespace tokens") {
    import spark.implicits._
    val docs = Seq("The cat the DOG", "dog  dog").toDF("text")
    val got = Tokenizer.wordFreq(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("the" -> 2L, "cat" -> 1L, "dog" -> 3L))
  }

  test("bpePairCounts weights char pairs by word frequency") {
    import spark.implicits._
    // "aba" x3, "ab" x1 → pair "a b": 3*2 (two positions... "aba" has
    // pairs (a,b),(b,a)) — enumerate exactly:
    //   aba: (a b), (b a)   freq 3
    //   ab:  (a b)          freq 1
    val docs = Seq("aba aba", "aba ab").toDF("text")
    val got = Tokenizer.bpePairCounts(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a b" -> 4L, "b a" -> 3L))
  }

  test("bpeTrain learns the classic merges on the Sennrich-style fixture") {
    import spark.implicits._
    // the canonical BPE walkthrough corpus: {low:5, lower:2, newest:6,
    // widest:3}. With </w> markers the first merges are driven by
    // "est</w>" (9 occurrences): (e,s) 9 → (es,t) 9 → (est,</w>) 9,
    // then (l,o) 7 → (lo,w) 7 ...
    val docs = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val rules = Tokenizer.bpeTrain(Seq(docs).toDF("text"), "text",
      merges = 5)
    assert(rules.take(5) == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
  }

  test("segment applies learned rules greedily left-to-right") {
    val rules = Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"))
    assert(Tokenizer.segment("lowest", rules) ==
      Seq("low", "est</w>"))
    assert(Tokenizer.segment("newest", rules) ==
      Seq("n", "e", "w", "est</w>"))
  }

  test("overlapping pairs merge left-to-right (aaaa + (a,a) → aa,aa)") {
    import spark.implicits._
    val docs = Seq("aaaa").toDF("text")
    val rules = Tokenizer.bpeTrain(docs, "text", merges = 1, eow = "")
    assert(rules == Seq(("a", "a")))
    assert(Tokenizer.segment("aaaa", rules, eow = "") == Seq("aa", "aa"))
    assert(Tokenizer.segment("aaa", rules, eow = "") == Seq("aa", "a"))
  }

  test("segmentCorpus applies learned rules to every corpus word via " +
      "the vocab broadcast") {
    import spark.implicits._
    val docs = Seq((1L, "low lowest"), (2L, "newest")).toDF("doc_id", "text")
    val rules = Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"))
    val got = Tokenizer.segmentCorpus(docs, "doc_id", "text", rules)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
      .toSet
    assert(got == Set(
      (1L, "low", Seq("low", "</w>")),
      (1L, "lowest", Seq("low", "est</w>")),
      (2L, "newest", Seq("n", "e", "w", "est</w>"))))
  }

  test("encode maps subwords to frequency-ranked ids in document order " +
      "and round-trips through the vocab") {
    import spark.implicits._
    val docs = Seq((1L, "low low newest"), (2L, "newest low"))
      .toDF("doc_id", "text")
    val rules = Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"))
    // subword streams: doc1 = low </w> low </w> n e w est</w>
    //                  doc2 = n e w est</w> low </w>
    // corpus counts: </w> x3, low x3, est</w> x2, n x2, e x2, w x2
    // rank (n desc, subword asc): 1=</w> 2=low 3=e 4=est</w> 5=n 6=w
    val got = Tokenizer.encode(docs, "doc_id", "text", rules)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(got(1L) == List(2, 1, 2, 1, 5, 3, 6, 4))
    assert(got(2L) == List(5, 3, 6, 4, 2, 1))
  }

  test("bpeTrain stops when no pair reaches minPairCount") {
    import spark.implicits._
    val docs = Seq("ab cd ef").toDF("text")
    // every pair occurs once < minPairCount=2 → no merges learned
    assert(Tokenizer.bpeTrain(docs, "text", merges = 3, eow = "") == Nil)
  }

  test("decode inverts encode exactly on the normalized corpus " +
      "(messy whitespace and case included)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "  LOW low \t NEWest  "),
      (2L, "newest\n\nlow"),
      (3L, "   "), // whitespace-only: no words → no encoded/decoded row
      (4L, "solo"))
      .toDF("doc_id", "text")
    val rules = Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"))
    val vocab = Tokenizer.vocabulary(docs, "text", rules)
    val got = Tokenizer.decode(
        Tokenizer.encode(docs, "doc_id", "text", rules),
        "doc_id", "input_ids", vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "low low newest",
      2L -> "newest low",
      4L -> "solo"))
    // vocab ids are a contiguous 1..V ranking
    val ids = vocab.collect().map(_.getAs[Long]("tok_id")).sorted
    assert(ids.toSeq == (1L to ids.length))
  }

  test("segmentCorpus/encode degrade from broadcast to keyed join past " +
      "the distinct-word threshold, with identical results") {
    import spark.implicits._
    val docs = Seq((1L, "low lowest low"), (2L, "newest lowest"))
      .toDF("doc_id", "text")
    val rules = Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"))
    // AdaptiveSparkPlanExec hides its input plan from TreeNode traversal,
    // so inspect the rendered plan text instead
    def broadcastJoins(df: org.apache.spark.sql.DataFrame): Int =
      "BroadcastHashJoin".r
        .findAllIn(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("simple")))
        .length
    val viaBroadcast = Tokenizer.segmentCorpus(docs, "doc_id", "text", rules)
    val encBroadcast = Tokenizer.encode(docs, "doc_id", "text", rules)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(broadcastJoins(viaBroadcast) >= 1,
      "small vocab must take the broadcast path")
    val gotB = viaBroadcast.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2))).toSet
    spark.conf.set("graft.tokenizer.maxBroadcastWords", "0")
    try {
      val viaKeyed = Tokenizer.segmentCorpus(docs, "doc_id", "text", rules)
      assert(broadcastJoins(viaKeyed) == 0,
        "past the threshold the word join-back must not broadcast")
      val gotK = viaKeyed.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2))).toSet
      assert(gotK == gotB, "keyed fallback changed segmentation results")
      val encKeyed = Tokenizer.encode(docs, "doc_id", "text", rules)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
      assert(encKeyed == encBroadcast, "keyed fallback changed encode ids")
    } finally {
      spark.conf.unset("graft.tokenizer.maxBroadcastWords")
      graft.operators.Caches.clear()
    }
  }

  test("encodeWith: matches encode under the native vocab; unknown " +
      "subwords under a foreign vocab map to unkId") {
    import spark.implicits._
    val docs = Seq((1L, "low low newest"), (2L, "solo low"))
      .toDF("doc_id", "text")
    val rules = Seq(("l", "o"), ("lo", "w"))
    // native vocab → identical ids to encode()
    val (encoded, vocab) =
      Tokenizer.encodeAndVocab(docs, "doc_id", "text", rules)
    val viaWith = Tokenizer.encodeWith(docs, "doc_id", "text", rules,
      vocab)
    assert(viaWith.exceptAll(encoded).isEmpty &&
      encoded.exceptAll(viaWith).isEmpty)
    // foreign vocab missing every 'solo'/'newest' subword: those
    // positions read unkId, known subwords keep their foreign ids
    val foreign = vocab.where(
      org.apache.spark.sql.functions.col("subword").startsWith("lo"))
    val got = Tokenizer.encodeWith(docs, "doc_id", "text", rules,
        foreign, unkId = 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val knownIds = foreign.collect()
      .map(r => r.getAs[String]("subword") -> r.getAs[Long]("tok_id"))
      .toMap.values.map(_.toInt).toSet
    assert(got(2L).contains(0), "unknown subwords must map to unkId")
    assert(got(1L).forall(id => id == 0 || knownIds.contains(id)))
  }
}
