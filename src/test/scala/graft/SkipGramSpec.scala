package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing
import graft.operators.CorpusStats

/** Word2vec skip-gram pair extraction ([[CorpusStats.skipGramPairs]]):
  * windowed pairing over the subsample-compacted token stream, checked
  * against a full local replay of the operator's published contract
  * (md5(doc:pos) keep draw vs floor-quantized sqrt(t·N/n_w), per-doc
  * compaction, ±window rank pairing).
  */
class SkipGramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Exact local twin of the operator (the spec's oracle). */
  private def localPairs(docs: Seq[(Long, String)], window: Int,
      minCount: Long, t: Double): Map[(String, String), Long] = {
    val toks = docs.map { case (id, s) =>
      id -> s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val vocab = toks.flatMap(_._2).groupBy(identity).map {
      case (w, o) => w -> o.size.toLong }
    val nTok = vocab.values.sum
    val kept = toks.map { case (id, ws) =>
      id -> ws.zipWithIndex.filter { case (w, pos) =>
        vocab(w) >= minCount && {
          val p = math.min(1000000L,
            math.floor(math.sqrt(t * nTok.toDouble / vocab(w).toDouble)
              * 1000000).toLong)
          Hashing.md5Long56Local(s"$id:$pos") % 1000000 < p
        }
      }.map(_._1)
    }
    val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
    kept.foreach { case (_, ws) =>
      for {
        i <- ws.indices
        j <- math.max(0, i - window) to math.min(ws.size - 1, i + window)
        if j != i
      } pairs((ws(i), ws(j))) =
        pairs.getOrElse((ws(i), ws(j)), 0L) + 1L
    }
    pairs.toMap
  }

  // 40 docs of looped vocabulary: 'filler' dominates (appears every
  // other token) so the t=1e-3 subsample actually drops occurrences,
  // while the content words stay below the always-keep knee
  private def fixture: Seq[(Long, String)] = (0L until 40L).map { i =>
    val content = Seq("sun", "moon", "star", "cloud", "rain", "wind",
      "snow", "storm")
    val ws = (0 until 24).map { k =>
      if (k % 2 == 0) "filler" else content(((i + k) % 8).toInt)
    }
    i -> ws.mkString(" ")
  }

  test("pairs match the exact local replay (subsampling + compaction)") {
    val expected = localPairs(fixture, window = 2, minCount = 5, t = 1e-3)
    val got = CorpusStats.skipGramPairs(fixture.toDF("doc_id", "text"),
        "doc_id", "text", window = 2, minCount = 5, subsampleT = 1e-3)
      .collect().map(r => (r.getAs[String]("w_center"),
        r.getAs[String]("w_context")) -> r.getAs[Long]("n_pairs")).toMap
    assert(got == expected)
    // the fixture must actually exercise subsampling: some filler
    // occurrences dropped, and compaction must pair content words that
    // were never adjacent in the raw stream (distance 2 via a dropped
    // filler between them)
    val keepAll = localPairs(fixture, window = 2, minCount = 5, t = 1e9)
    assert(got.values.sum < keepAll.values.sum,
      "fixture must actually trigger subsampling drops")
    assert(got.keys.exists { case (a, b) =>
      a != "filler" && b != "filler" })
  }

  test("no subsampling when t is huge; symmetric counts") {
    val got = CorpusStats.skipGramPairs(fixture.toDF("doc_id", "text"),
        "doc_id", "text", window = 2, minCount = 1, subsampleT = 1e9)
      .collect().map(r => (r.getAs[String]("w_center"),
        r.getAs[String]("w_context")) -> r.getAs[Long]("n_pairs")).toMap
    val expected = localPairs(fixture, window = 2, minCount = 1, t = 1e9)
    assert(got == expected)
    // skip-gram pairing is symmetric: count(a,b) == count(b,a)
    got.foreach { case ((a, b), n) => assert(got((b, a)) == n) }
    // keep-all mode: every adjacent (rank-distance <= 2) pair present;
    // 'filler' survives everywhere, so filler-filler distance-2 pairs
    // exist in volume
    assert(got(("filler", "filler")) > 0)
  }

  test("minCount drops rare words before pairing") {
    val docs = Seq((1L, "rare common common common common common rare2"))
    val got = CorpusStats.skipGramPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", window = 2, minCount = 5, subsampleT = 1e9)
      .collect().map(r => (r.getAs[String]("w_center"),
        r.getAs[String]("w_context")) -> r.getAs[Long]("n_pairs")).toMap
    assert(got.keySet.flatMap(k => Set(k._1, k._2)) == Set("common"))
    // 5 'common' tokens compact to ranks 1..5: 4 dist-1 + 3 dist-2
    // ordered pairs each way
    assert(got(("common", "common")) == 14L)
  }
}
