package graft

import graft.operators.DataPrep
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataPrepSpec extends AnyFunSuite {
  import SparkTestSession._

  test("shard packing: exclusive prefix sum, boundary doc stays in its shard") {
    import spark.implicits._
    // tokens 1000 each, budget 2048: docs 0,1 → shard 0 (cum-excl 0, 1000),
    // doc 2 → shard 0 (cum-excl 2000 < 2048... floor(2000/2048)=0),
    // doc 3 → floor(3000/2048)=1
    val docs = (0 until 6).map(i => (i.toLong, "s", 1000L))
      .toDF("doc_id", "source", "toks")
    val out = DataPrep.shardByTokenBudget(docs, "doc_id", "source",
        col("toks"), budget = 2048L)
      .orderBy("doc_id").select("shard_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 0L, 1L, 1L, 2L))
  }

  test("shard packing is independent per group") {
    import spark.implicits._
    val docs = Seq((1L, "a", 3000L), (2L, "b", 3000L), (3L, "a", 3000L))
      .toDF("doc_id", "source", "toks")
    val out = DataPrep.shardByTokenBudget(docs, "doc_id", "source",
        col("toks"), budget = 2048L)
      .select("doc_id", "shard_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // first doc of each group starts at shard 0 regardless of other groups
    assert(out(1L) == 0L && out(2L) == 0L && out(3L) == 1L)
  }

  test("hash split is deterministic, exhaustive, and roughly proportional") {
    import spark.implicits._
    val df = (0 until 2000).map(_.toLong).toDF("id")
    val out = DataPrep.hashSplit(df, "id",
      Seq("train" -> "cc", "val" -> "e6"), rest = "test")
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    // cc/256 ≈ 79.7%, (e6-cc)/256 ≈ 10.2%
    assert(counts("train") > 1400 && counts("train") < 1800, counts)
    assert(counts("val") > 100 && counts("val") < 350, counts)
    // deterministic across invocations
    val again = DataPrep.hashSplit(df, "id",
        Seq("train" -> "cc", "val" -> "e6"), rest = "test")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("packSequences assembles shards in id order with the separator") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "s", "aa bb"),   // 2 tokens
      (2L, "s", "cc"),      // 1 token  → shard 0 (cum-excl 0,2)
      (3L, "s", "dd ee ff") // 3 tokens → cum-excl 3 → shard 1 at budget 3
    ).toDF("doc_id", "source", "text")
    val out = DataPrep.packSequences(docs, "doc_id", "source",
        graft.functions.TextFunctions.tokenCountWs(col("text")),
        budget = 3L, sep = " | ")
      .orderBy("shard_id")
      .collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("packed") == "aa bb | cc")
    assert(out(0).getAs[Long]("n_docs") == 2 &&
      out(0).getAs[Long]("total_tokens") == 3)
    assert(out(1).getAs[String]("packed") == "dd ee ff")
  }

  test("mixture sampling is deterministic, weight-monotone, and a whitelist") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    def kept(w: Map[String, Double]): Map[String, Long] =
      DataPrep.mixtureSample(df, "doc_id", "source", w)
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = kept(Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.1))
    assert(counts("src0") == 500)                       // p=1 keeps all
    assert(!counts.contains("src3"))                    // unlisted → dropped
    assert(counts("src1") > 150 && counts("src1") < 350) // ~250
    assert(counts("src2") < counts("src1"))
    assert(kept(Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.1)) == counts)
    // subset property: raising a weight only ADDS documents (same draw)
    val lo = DataPrep.mixtureSample(df, "doc_id", "source",
      Map("src1" -> 0.3)).select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = DataPrep.mixtureSample(df, "doc_id", "source",
      Map("src1" -> 0.7)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
  }

  test("contamination flags exact containment and respects minOverlap") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot"), // shares 4 trigrams
      (2L, "alpha bravo charlie zulu yankee xray"),   // shares 1 trigram
      (3L, "one two three four five six")             // shares none
    ).toDF("doc_id", "text")
    val benchmark = Seq((99L, "alpha bravo charlie delta echo foxtrot golf"))
      .toDF("doc_id", "text")
    val out = DataPrep.contaminationFlags(corpus, benchmark,
        "doc_id", "text", n = 3, minOverlap = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == 4L)
  }

  test("stratifiedSample takes exactly n per stratum deterministically " +
      "and plans a pre-shuffle WindowGroupLimit") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("id", "grp")
    val sampled = DataPrep.stratifiedSample(df, "id", "grp", n = 7)
    val rows = sampled.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("s0" -> 7, "s1" -> 7, "s2" -> 7))
    // determinism: identical draw on a re-run
    val again = DataPrep.stratifiedSample(df, "id", "grp", n = 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
    // the scale property PLANS.md documents: per-stratum state is top-n
    // BEFORE the shuffle, not a full sort
    val plan = sampled.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("contiguousIds assigns 0..n-1 in order regardless of input " +
      "partitioning") {
    import spark.implicits._
    val df = (1 to 97).map(i => (i * 7L % 1000, s"v$i"))
      .toDF("k", "v").repartition(13) // scrambled partitions
    val got = DataPrep.contiguousIds(df, "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.map(_._2).toSeq == (0L until 97L))
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
  }

  test("dsirWeights ranks target-domain docs above off-domain docs " +
      "and is invariant to doc order") {
    import graft.operators.DataPrep
    import spark.implicits._
    val sci = Seq("the cell divides under the microscope lens",
      "the enzyme binds the protein in the cell wall",
      "the microscope shows the enzyme and the protein")
    val web = Seq("click here to win a free prize now",
      "best deals and offers click the link now")
    val target = sci.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val raw = (Seq(
      (10L, "the protein and the enzyme in the cell"), // sci-like
      (11L, "win free prize deals click now here"))    // web-like
      ++ web.zipWithIndex.map { case (t, i) => (20L + i, t) })
      .toDF("doc_id", "text")
    val w = DataPrep.dsirWeights(raw, target, "doc_id", "text",
        buckets = 512)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Double]("avg_logratio")).toMap
    assert(w(10L) > w(11L),
      s"sci-like doc should outweigh web-like: ${w(10L)} vs ${w(11L)}")
    // permuting the raw rows leaves every weight identical (the
    // quantized-integer sum commutes)
    val w2 = DataPrep.dsirWeights(raw.orderBy(col("doc_id").desc), target,
        "doc_id", "text", buckets = 512)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Double]("avg_logratio")).toMap
    assert(w == w2)
  }

  test("pcaReduce projects to k dims and maps identical vectors " +
      "identically") {
    import graft.operators.SimilaritySearch
    import spark.implicits._
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array(i.toDouble, 2.0 * i, 0.5 * i + 1, 3.0))
    } :+ (100L, Array(5.0, 10.0, 3.5, 3.0)) :+ // dup of i=5
      (5L + 1000, Array(5.0, 10.0, 3.5, 3.0))
    val df = vecs.toDF("vec_id", "embedding")
    val red = SimilaritySearch.pcaReduce(df, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(red.values.forall(_.length == 2))
    assert(red(100L) == red(5L + 1000))
  }

  test("temperatureSample pulls output composition toward p^alpha") {
    import graft.operators.DataPrep
    import spark.implicits._
    // 90/10 input split; at alpha=0.5 the target composition is
    // sqrt-rebalanced: 0.75/0.25 — the minority share must rise well
    // above its input share
    val docs = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val kept = DataPrep.temperatureSample(docs, "doc_id", "source",
        alpha = 0.5, targetFrac = 0.5)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum.toDouble
    val smallShare = kept("small") / total
    assert(smallShare > 0.15 && smallShare < 0.35,
      s"small share $smallShare not near sqrt-rebalanced 0.25")
    // determinism: same draw under different partitioning
    val again = DataPrep.temperatureSample(docs.repartition(7), "doc_id",
        "source", alpha = 0.5, targetFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = DataPrep.temperatureSample(docs, "doc_id", "source",
        alpha = 0.5, targetFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("epochPlan: integer-exact targets and epochs; upsampled source " +
      "shows epochs > 1") {
    import spark.implicits._
    // src a: 2 docs × 100 tokens = 200 avail; src b: 1 doc × 800 = 800.
    // budget 1000, weights a=70%, b=30%: target a=700 (3.5 epochs),
    // target b=300 (0.375 epochs)
    val docs = Seq((1L, "a", 100L), (2L, "a", 100L), (3L, "b", 800L))
      .toDF("doc_id", "source", "n")
    val out = DataPrep.epochPlan(docs, "source", col("n"),
        Seq("a" -> 700000L, "b" -> 300000L), budgetTokens = 1000L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", 2L, 200L, 200000L, 700L, 3500000L),
      ("b", 1L, 800L, 800000L, 300L, 375000L)))
    // budget × 1e6 beyond Long wraps silently in the DIV tree — the
    // operator must refuse it loudly instead
    val tooBig = Long.MaxValue / 1000000L + 1
    val ex = intercept[IllegalArgumentException] {
      DataPrep.epochPlan(docs, "source", col("n"),
        Seq("a" -> 1000000L), budgetTokens = tooBig)
    }
    assert(ex.getMessage.contains("overflow"))
  }

  test("trainExamples cuts the EOS-joined per-group stream into " +
      "fixed-length examples that cross doc boundaries") {
    import spark.implicits._
    // group s stream (eos=0): 1,2,3,0, 4,5,0,6, 7,8,9,0 → three len-4
    // examples; doc 2's tokens straddle examples 1 and 2 via the eos
    val docs = Seq(
      (1L, "s", Seq(1, 2, 3)),
      (2L, "s", Seq(4, 5)),
      (3L, "s", Seq(6, 7, 8, 9)),
      (4L, "t", Seq(11, 12, 13, 14, 15)) // t: 11..15,0 → len-4 + len-2
    ).toDF("doc_id", "source", "input_ids")
    val out = DataPrep.trainExamples(docs, "doc_id", "source",
        exampleLen = 4)
      .orderBy("source", "example_idx")
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("example_idx"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("first_tok"),
        r.getAs[Long]("sum_ids")))
    assert(out.toSeq == Seq(
      ("s", 0L, 4L, 1L, 6L),   // [1,2,3,0]
      ("s", 1L, 4L, 4L, 15L),  // [4,5,0,6]
      ("s", 2L, 4L, 7L, 24L),  // [7,8,9,0]
      ("t", 0L, 4L, 11L, 50L), // [11,12,13,14]
      ("t", 1L, 2L, 15L, 15L)  // [15,0] — short tail example
    ))
    // partitioning-invariant: the offsets come from a keyed window, not
    // physical row order
    val again = DataPrep.trainExamples(docs.repartition(7), "doc_id",
        "source", exampleLen = 4)
      .orderBy("source", "example_idx")
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("example_idx"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("first_tok"),
        r.getAs[Long]("sum_ids")))
    assert(again.toSeq == out.toSeq)
  }

  test("weightedSample: deterministic, partitioning-invariant, size " +
      "min(n, group), and raising a weight never worsens its rank") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, "g", 1L + i % 7)).toDF(
      "id", "grp", "w")
    val a = DataPrep.weightedSample(df, "id", "grp", col("w"), n = 10)
      .select("id").as[Long].collect().toSet
    val b = DataPrep.weightedSample(df.repartition(13), "id", "grp",
        col("w"), n = 10)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 10)
    // small group: everything kept
    val tiny = Seq((1L, "g", 5L), (2L, "g", 1L)).toDF("id", "grp", "w")
    assert(DataPrep.weightedSample(tiny, "id", "grp", col("w"), 10)
      .count() == 2)
    // E-S key ln(u)/w is monotone in w (ln u < 0): multiply one
    // excluded item's weight by 100000 — enough that its key must rise
    // into the top-10 for this fixture — and assert it now makes the
    // sample (a membership check; u is id-stable, so only w moves)
    val excluded = (1L to 200L).find(i => !a.contains(i)).get
    val boosted = df.withColumn("w",
      when(col("id") === excluded, col("w") * 100000).otherwise(col("w")))
    val c = DataPrep.weightedSample(boosted, "id", "grp", col("w"), 10)
      .select("id").as[Long].collect().toSet
    assert(c.contains(excluded),
      s"weight-boosted item $excluded still excluded")
  }

  test("tokenBudgetSample: inclusive cut, straddle-drop, partition-invariant") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, "g", 10L)).toDF("id", "grp", "n")
    // 10 tokens each, budget 95 → exactly 9 kept (10th would hit 100 > 95)
    val kept = DataPrep.tokenBudgetSample(df, "id", "grp", col("n"), 95)
    assert(kept.count() == 9)
    val cums = kept.select("cum_tokens").as[Long].collect().sorted
    assert(cums.toSeq == (1L to 9L).map(_ * 10))
    // exact-boundary doc is KEPT (inclusive cumsum ≤ budget)
    assert(DataPrep.tokenBudgetSample(df, "id", "grp", col("n"), 100)
      .count() == 10)
    // partitioning must not move the cut
    val a = kept.select("id").as[Long].collect().toSet
    val b = DataPrep.tokenBudgetSample(df.repartition(7), "id", "grp",
        col("n"), 95)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // per-group budgets are independent
    val two = ((1L to 5L).map(i => (i, "g1", 10L)) ++
      (6L to 10L).map(i => (i, "g2", 40L))).toDF("id", "grp", "n")
    val r = DataPrep.tokenBudgetSample(two, "id", "grp", col("n"), 40)
      .groupBy("grp").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("g1" -> 4L, "g2" -> 1L))
  }

  test("packEfficiency: exact integer example counts and waste") {
    import spark.implicits._
    // tokens 1, 64, 65, 128 at L=64: padded ceils = 1,1,2,2 → 6;
    // total = 258 → packed = ceil(258/64) = 5; waste = 6*64-258 = 126
    val df = Seq((1L, "g", 1L), (2L, "g", 64L), (3L, "g", 65L),
      (4L, "g", 128L), (5L, "g", 0L)).toDF("id", "grp", "n")
    val r = DataPrep.packEfficiency(df, "grp", col("n"), 64).head()
    assert(r.getAs[Long]("n_docs") == 4) // zero-token doc excluded
    assert(r.getAs[Long]("total_tokens") == 258)
    assert(r.getAs[Long]("padded_examples") == 6)
    assert(r.getAs[Long]("packed_examples") == 5)
    assert(r.getAs[Long]("pad_waste_tokens") == 126)
    assert(math.abs(r.getAs[Double]("padded_efficiency") -
      258.0 / 384) < 1e-15)
    assert(math.abs(r.getAs[Double]("packed_efficiency") -
      258.0 / 320) < 1e-15)
  }

  test("groupAdvantages: hand-computed (x - mean)/sigma quantization; " +
      "zero-variance groups and singletons emit 0") {
    import spark.implicits._
    val df = Seq((1L, "g", 10L), (2L, "g", 20L), (3L, "g", 30L),
      (4L, "z", 5L), (5L, "z", 5L), (6L, "solo", 7L))
      .toDF("id", "grp", "score")
    val got = DataPrep.groupAdvantages(df, "id", "grp", "score")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("adv_q"))
      .toMap
    // group g: n=3, s1=60, s2=1400 -> radicand n*s2-s1^2 = 600;
    // adv(10) = -30e6/sqrt(600) = -1224744.87.. -> floor -1224745
    // (floor, not truncation: negative advantages round AWAY from 0)
    assert(got(1L) == -1224745L, got.toString)
    assert(got(2L) == 0L)
    assert(got(3L) == 1224744L)
    // all-equal group and the singleton: zero variance -> 0
    assert(got(4L) == 0L && got(5L) == 0L && got(6L) == 0L)
  }

  test("groupAdvantages: output/temp column collisions fail fast " +
      "instead of silently overwriting caller data (r12 advice)") {
    import spark.implicits._
    // adv_q would be overwritten by withColumn; _n/_s1/_s2 would trip
    // a confusing duplicate-name AnalysisException in the projection
    Seq("adv_q", "_n", "_s1", "_s2").foreach { c =>
      val df = Seq((1L, "g", 10L, 99L)).toDF("id", "grp", "score", c)
      val e = intercept[IllegalArgumentException] {
        DataPrep.groupAdvantages(df, "id", "grp", "score")
      }
      assert(e.getMessage.contains(c), e.getMessage)
    }
  }
}
