package graft

import graft.operators.CorpusStats
import org.scalatest.funsuite.AnyFunSuite

/** word2vec negative sampling: draws must replay exactly from the local
  * md5 twin + the same cumulative table (the binary search is pinned
  * against an independent interval scan), be deterministic, and show
  * the ^0.75 damping that is the whole point of the distribution. */
class NegativeSamplingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every draw replays exactly from the local hash twin and the " +
      "cumulative weight table") {
    import spark.implicits._
    val docs = (0L until 50L).map { i =>
      (i, if (i % 5 == 0) "big big big big small" else "big big tiny")
    }.toDF("doc_id", "text")
    val got = CorpusStats.negativeSamples(docs, "doc_id", "text",
        vocabSize = 10, negatives = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("j")) ->
        r.getAs[String]("neg_word")).toMap
    // independent replica: counts → ^0.75 quantized weights → intervals
    val counts = docs.collect()
      .flatMap(_.getString(1).split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }
      .take(10)
    val lo = counts.scanLeft(0L) { case (acc, (_, c)) =>
      acc + math.floor(math.sqrt(c.toDouble * math.sqrt(c.toDouble)) * 1e6)
        .toLong
    }
    val total = lo.last
    for (i <- 0L until 50L; j <- 0L until 2L) {
      val u = math.floorMod(
        graft.functions.Hashing.md5Long56Local(s"neg|$i:$j"), total)
      // lo has n+1 boundary entries; word k owns [lo(k), lo(k+1)), so
      // the greatest boundary ≤ u IS the word index
      val idx = lo.lastIndexWhere(_ <= u)
      val want = counts(idx)._1
      assert(got((i, j)) == want, s"draw ($i,$j): u=$u")
    }
  }

  test("deterministic across runs and ^0.75-damped vs raw frequency") {
    import spark.implicits._
    // one dominant word: raw share 1000/1200; the ^0.75 draw share is
    // provably lower — damping the head is the point
    val docs = (0L until 200L).map { i =>
      (i, ("big " * 5).trim + s" rare${i % 9}")
    }.toDF("doc_id", "text")
    val a = CorpusStats.negativeSamples(docs, "doc_id", "text",
      vocabSize = 10, negatives = 3).collect()
    val b = CorpusStats.negativeSamples(docs, "doc_id", "text",
      vocabSize = 10, negatives = 3).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    val share = a.count(_.getAs[String]("neg_word") == "big").toDouble /
      a.length
    val rawShare = (200.0 * 5) / (200 * 5 + 200) // big tokens / all tokens
    assert(share < rawShare && share > 0.5,
      s"draw share $share vs raw $rawShare")
  }
}
