package graft

import graft.operators.Bitext
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Margin-based bitext mining (Artetxe & Schwenk 2019): the margin must
  * separate planted translation pairs from random distractors where raw
  * cosine thresholds cannot, the integer margin must match a
  * hand-computed fixture, the mutual (intersection) strategy must drop
  * hub-contested pairs, and the LSH-bucketed scale path must keep the
  * planted alignment. */
class BitextSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dim = 16
  private def randVec(rnd: scala.util.Random): Seq[Double] =
    Seq.fill(dim)(rnd.nextGaussian())
  private def perturb(v: Seq[Double], rnd: scala.util.Random,
      eps: Double): Seq[Double] =
    v.map(_ + eps * rnd.nextGaussian())

  // 10 aligned pairs (src i ↔ tgt 100+i, tgt = src + small noise) plus
  // 10 unaligned distractors on each side
  private lazy val (srcDf, tgtDf) = {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(10)(randVec(rnd))
    val src = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      Seq.tabulate(10)(i => (200L + i, randVec(rnd)))
    val tgt = base.zipWithIndex.map { case (v, i) =>
      (100L + i, perturb(v, rnd, 0.05)) } ++
      Seq.tabulate(10)(i => (300L + i, randVec(rnd)))
    import spark.implicits._
    (src.toDF("vec_id", "embedding"), tgt.toDF("vec_id", "embedding"))
  }

  test("margin separates planted translations from distractors") {
    val all = Bitext.mine(srcDf, tgtDf, "vec_id", "embedding",
      k = 3, minMargin = 0.0).collect()
    val byId = all.map(r => r.getAs[Long]("src_id") ->
      (r.getAs[Long]("tgt_id"), r.getAs[Double]("margin"))).toMap
    // every aligned source picks its planted twin as forward best
    (0 until 10).foreach { i =>
      assert(byId(i.toLong)._1 == 100L + i,
        s"src $i best pair ${byId(i.toLong)}")
    }
    // the defining property: min aligned margin strictly above max
    // distractor margin — a threshold between them mines EXACTLY the
    // planted alignment (raw cosine can't promise this on hub vectors)
    val alignedMin = (0 until 10).map(i => byId(i.toLong)._2).min
    val distractorMax = (200 until 210)
      .flatMap(i => byId.get(i.toLong).map(_._2)).max
    assert(alignedMin > distractorMax,
      s"aligned min $alignedMin vs distractor max $distractorMax")
    val cut = (alignedMin + distractorMax) / 2
    val mined = Bitext.mine(srcDf, tgtDf, "vec_id", "embedding",
      k = 3, minMargin = cut).collect()
      .map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id")).toSet
    assert(mined == (0 until 10).map(i => i.toLong -> (100L + i)).toSet)
  }

  test("integer margin matches the hand-computed fixture") {
    import spark.implicits._
    // one source, two targets, k=1: cos(a, t1) = 1.0 → cq = 10^6 exactly
    // is t1's and a's whole neighborhood (t2 ⊥ a contributes nothing);
    // margin(a, t1) = cq·2·1·1·10^6 div (10^6·1 + 10^6·1) = 10^6 → 1.0
    val a = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val t = Seq((10L, Seq(2.0, 0.0)), (11L, Seq(0.0, 3.0)))
      .toDF("vec_id", "embedding")
    val got = Bitext.mine(a, t, "vec_id", "embedding",
      k = 1, minMargin = 0.0).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("tgt_id") == 10L)
    assert(got.head.getAs[Double]("cosine") == 1.0)
    assert(got.head.getAs[Double]("margin") == 1.0)
  }

  test("mutual strategy keeps one winner per hub-contested target") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val x = randVec(rnd)
    // two sources both closest to the SAME target (a hub): forward mines
    // both; mutual keeps only the target's own best-margin source
    val a = Seq((1L, x), (2L, perturb(x, rnd, 0.02))) ++
      Seq.tabulate(5)(i => (50L + i, randVec(rnd)))
    val b = Seq((10L, perturb(x, rnd, 0.01))) ++
      Seq.tabulate(5)(i => (60L + i, randVec(rnd)))
    val fwd = Bitext.mine(a.toDF("vec_id", "embedding"),
      b.toDF("vec_id", "embedding"), "vec_id", "embedding",
      k = 2, minMargin = 1.0).collect()
      .filter(_.getAs[Long]("tgt_id") == 10L)
    assert(fwd.length == 2, s"forward should mine both contenders: " +
      fwd.map(_.getAs[Long]("src_id")).mkString(","))
    val mut = Bitext.mine(a.toDF("vec_id", "embedding"),
      b.toDF("vec_id", "embedding"), "vec_id", "embedding",
      k = 2, minMargin = 1.0, mutual = true).collect()
      .filter(_.getAs[Long]("tgt_id") == 10L)
    assert(mut.length == 1,
      s"mutual keeps one: ${mut.map(_.getAs[Long]("src_id")).mkString(",")}")
  }

  test("LSH-bucketed scale path keeps the planted alignment") {
    val mined = Bitext.mine(srcDf, tgtDf, "vec_id", "embedding",
      k = 3, minMargin = 1.2, bits = Some(4)).collect()
      .map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id")).toSet
    // near-identical vectors share 4-bit buckets with high probability;
    // all 10 planted pairs must survive the candidate restriction
    (0 until 10).foreach { i =>
      assert(mined.contains(i.toLong -> (100L + i)),
        s"planted pair $i lost by bucketing; mined=$mined")
    }
  }

  test("hyperplane planner: hand-verified S-curve + cost argmin, " +
      "corpus-size-dependent grid, honest None at the budget wall") {
    import graft.operators.SimilaritySearch._
    // agreement probability: p = 1 - acos(s)/pi (Charikar 2002);
    // hand-computed anchors
    assert(math.abs(hyperplaneAgreeProbability(0.0) - 0.5) == 0.0,
      "p(0) must be EXACTLY 0.5 — the SQL planner twin relies on it")
    assert(math.abs(hyperplaneAgreeProbability(0.99) - 0.9549465864)
      < 1e-9)
    // catch probabilities at the plans the size sweep below picks
    assert(math.abs(hyperplaneCatchProbability(0.99, 9, 3)
      - 0.960837008889) < 1e-9)
    assert(math.abs(hyperplaneCatchProbability(0.99, 13, 4)
      - 0.958700221813) < 1e-9)
    // the grid GROWS with the corpus: 250-row sides afford 3 cheap
    // 9-bit bands; 1000-row sides buy 13 bits x 4 bands to hold the
    // quadratic candidate term down (hand-checked cost argmin)
    assert(hyperplanePlanFor(0.99, 250, 250) == Some((9, 3)))
    assert(hyperplanePlanFor(0.99, 1000, 1000) == Some((13, 4)))
    assert(hyperplanePlanFor(0.99, 10000, 10000) == Some((13, 4)))
    // at ~1e9 rows a 64-bit signature cannot deliver 0.95 recall at a
    // sane candidate rate — the planner refuses rather than flooding
    assert(hyperplanePlanFor(0.99, 1000000000L, 1000000000L).isEmpty)
    // ALSH width planner: smallest bits with n/2^bits <= 64
    assert(alshBitsFor(500) == 3)
    assert(alshBitsFor(2000) == 5)
    assert(alshBitsFor(20000) == 9)
    assert(alshBitsFor(1) == 1)
  }

  test("minePlanned equals mine under the planner's own grid") {
    val planned = Bitext.minePlanned(srcDf, tgtDf, "vec_id", "embedding",
      k = 3, minMargin = 1.2, targetCosine = 0.99, minCatch = 0.95)
      .collect().map(_.toString).sorted.toSeq
    val n = srcDf.count()
    val (bits, bands) = graft.operators.SimilaritySearch
      .hyperplanePlanFor(0.99, n, tgtDf.count()).get
    val direct = Bitext.mine(srcDf, tgtDf, "vec_id", "embedding",
      k = 3, minMargin = 1.2, bits = Some(bits), bands = bands)
      .collect().map(_.toString).sorted.toSeq
    assert(planned.nonEmpty && planned == direct)
  }
}
