package graft

import graft.operators.{KMeans, SimilaritySearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  import SparkTestSession._

  // three well-separated planted clusters in 8-d. The md5-draw init
  // picks ids 168, 236, 138 first; with truth = id%3 those seed truths
  // are (0, 2, 0) and Lloyd would (correctly) converge to a split/merge
  // local optimum — swapping 235/236 and 137/138's memberships puts one
  // seed in each planted cluster, so exact recovery is the right
  // expectation.
  private def planted = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array.fill(8)(5.0), Array.fill(8)(-5.0),
      Array.tabulate(8)(j => if (j % 2 == 0) 5.0 else -5.0))
    val swapped = Map(236 -> 1, 235 -> 2, 138 -> 2, 137 -> 0)
    (0 until 300).map { i =>
      val c = swapped.getOrElse(i, i % 3)
      (i.toLong, c,
        centers(c).map(x => x + rnd.nextGaussian() * 0.3).toSeq)
    }.toDF("id", "truth", "vec")
  }

  test("train recovers planted clusters and converges") {
    val cs = KMeans.train(planted, "id", "vec", k = 3, maxIters = 25)
    val labeled = KMeans.assign(planted, "vec", 1024, cs)
      .groupBy("truth").agg(countDistinct("cluster").as("n"),
        first("cluster").as("c"))
      .collect()
    // each planted cluster maps to exactly one learned label...
    assert(labeled.forall(_.getLong(1) == 1L))
    // ...and the three learned labels are distinct
    assert(labeled.map(_.get(2)).toSet.size == 3)
  }

  test("iterate matches a local brute-force Lloyd step exactly") {
    val df = planted
    val scale = 1024
    val init = KMeans.initCentroids(df, "id", "vec", 3, scale)
    val dist = KMeans.iterate(df, "vec", scale, init)

    // local reference in the same integer space
    val pts = df.select(KMeans.quantize(col("vec"), scale))
      .collect().map(_.getSeq[Long](0).toArray)
    val sums = Array.fill(3)(new Array[Long](8))
    val counts = new Array[Long](3)
    pts.foreach { p =>
      var best = 0; var bd = Long.MaxValue
      for (c <- 0 until 3) {
        val d = p.zip(init(c)).map { case (a, b) =>
          (a - b) * (a - b) }.sum
        if (d < bd) { bd = d; best = c }
      }
      counts(best) += 1
      for (j <- 0 until 8) sums(best)(j) += p(j)
    }
    dist.foreach { case (c, n, vec) =>
      assert(n == counts(c))
      val expect =
        if (n == 0) init(c)
        else sums(c).map(s => math.floor(s * 1.0 / n).toLong)
      assert(vec.sameElements(expect), s"cluster $c")
    }
  }

  test("training is partitioning-invariant (exact integer sums)") {
    val a = KMeans.train(planted.repartition(1), "id", "vec", k = 3)
    val b = KMeans.train(planted.repartition(7), "id", "vec", k = 3)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("ivfTopK accepts full-corpus trained centroids and keeps recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 400).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian()))).toDF("id", "vec")
    val queries = (0 until 10).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian()))).toDF("qid", "vec")
    val cs = KMeans.dequantize(
      KMeans.train(corpus, "id", "vec", k = 8), 1024)
    val ivf = SimilaritySearch.ivfTopK(corpus, queries, "id", "vec",
        "qid", k = 5, nlist = 8, nprobe = 4, trainedCentroids = Some(cs))
      .select("query_id", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val brute = SimilaritySearch.bruteForceTopK(corpus, queries, "id",
        "vec", "qid", k = 5)
      .select("query_id", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val recalls = brute.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble /
        truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean under nprobe=4/8")
  }

  test("ivfPqTopK accepts full-corpus trained coarse centroids") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val corpus = (0 until 300).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian()))).toDF("id", "vec")
    val queries = (0 until 5).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian()))).toDF("qid", "vec")
    // coarse centroids must live in UNIT space — train on normalized
    // vectors (the hook's documented contract)
    val unit = corpus.select(col("id"),
      transform(col("vec"),
        x => x / sqrt(aggregate(col("vec"), lit(0.0),
          (a, v) => a + v * v))).as("vec"))
    val cs = KMeans.dequantize(
      KMeans.train(unit, "id", "vec", k = 4, scale = 4096), 4096)
    val out = SimilaritySearch.ivfPqTopK(corpus, queries, "id", "vec",
      "qid", k = 5, nlist = 4, nprobe = 4, m = 8, ksub = 8,
      trainedCoarse = Some(cs))
    assert(out.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 5L))
  }
}
