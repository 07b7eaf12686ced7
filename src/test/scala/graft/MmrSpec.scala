package graft

import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR diversified re-rank: local greedy replay on the corpus, the
  * diversity property on a planted two-cluster fixture, negative-sim
  * maxSim handling, and the k > candidates edge. */
class MmrSpec extends AnyFunSuite {
  import SparkTestSession._

  private def quantLocal(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000).toLong).toArray

  private def dotL(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** Independent greedy MMR over a candidate list (id, vec, rel). */
  private def greedyLocal(cs: Seq[(Long, Array[Long], Long)], k: Int,
      lam: Long): Seq[(Long, Long, Long)] = {
    val mu = 1000000L - lam
    val picked = scala.collection.mutable.ArrayBuffer[Int]()
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    while (out.length < math.min(k, cs.length)) {
      val step = out.length
      val best = cs.indices.filterNot(picked.contains).minBy { i =>
        val ms = if (step == 0) 0L
          else picked.map(p => dotL(cs(i)._2, cs(p)._2)).max
        val s = if (step == 0) lam * cs(i)._3 else lam * cs(i)._3 - mu * ms
        (-s, cs(i)._1)
      }
      val ms = if (step == 0) 0L
        else picked.map(p => dotL(cs(best)._2, cs(p)._2)).max
      val s = if (step == 0) lam * cs(best)._3
        else lam * cs(best)._3 - mu * ms
      picked += best
      out += (((step + 1).toLong, cs(best)._1, s))
    }
    out.toSeq
  }

  test("every pick replays the local greedy on corpus-derived pools") {
    val emb = graft.Tables.embeddings(spark, sf)
    val got = SimilaritySearch.mmrTopK(emb, emb.where(col("vec_id") < 3),
        "vec_id", "embedding", "vec_id", k = 6, candidates = 15)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
    val all = emb.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        quantLocal(r.getAs[scala.collection.Seq[Float]]("embedding").toSeq))
      .toMap
    (0L until 3L).foreach { qid =>
      val qv = all(qid)
      val cands = all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, v, dotL(v, qv)) }
        .sortBy(c => (-c._3, c._1)).take(15)
      val want = greedyLocal(cands, 6, 700000L)
      val rows = got(qid).sortBy(_.getAs[Long]("pick_rank"))
        .map(r => (r.getAs[Long]("pick_rank"), r.getAs[Long]("id"),
          r.getAs[Long]("mmr_score"))).toSeq
      assert(rows == want, s"query $qid")
    }
  }

  test("two planted clusters: MMR jumps clusters, pure relevance " +
      "does not") {
    import spark.implicits._
    // clusters on DISJOINT dims (A: dims 0-1, B: dims 2-3), so A-B
    // sims are exactly zero; the query lives in A's span. Relevance
    // alone picks A,A,A,...; λ=0.5 MMR must pick B second (score 0
    // beats every second-A's negative redundancy-penalized score)
    val a = (i: Long) => Seq(0.9f, 0.1f + 0.01f * i, 0.0f, 0.0f)
    val b = (i: Long) => Seq(0.0f, 0.0f, 0.9f, 0.1f + 0.01f * i)
    val rows = Seq((0L, a(0L))) ++
      (1L to 4L).map(i => (i, a(i))) ++ (5L to 8L).map(i => (i, b(i)))
    val emb = rows.toDF("vec_id", "embedding")
    def run(lam: Long) = SimilaritySearch.mmrTopK(emb,
        emb.where(col("vec_id") === 0L), "vec_id", "embedding", "vec_id",
        k = 4, candidates = 8, lambdaPpm = lam)
      .collect().sortBy(_.getAs[Long]("pick_rank"))
      .map(r => if (r.getAs[Long]("id") <= 4L) "A" else "B").toSeq
    assert(run(1000000L) == Seq("A", "A", "A", "A"), "pure relevance")
    val mmr = run(500000L)
    assert(mmr.take(2) == Seq("A", "B"),
      s"picks $mmr: second pick must jump clusters")
  }

  test("duplicate (id, vec) corpus rows are picked at most once") {
    import spark.implicits._
    // an un-deduplicated union: id 1 appears twice with identical vecs;
    // pure relevance (λ=1e6) would otherwise pick id 1 at ranks 1 AND 2
    val base = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.5f, 0.5f)), (3L, Seq(0.1f, 0.9f)))
    val emb = (base ++ Seq((1L, Seq(0.9f, 0.1f))))
      .toDF("vec_id", "embedding")
    val got = SimilaritySearch.mmrTopK(emb,
        emb.where(col("vec_id") === 0L).dropDuplicates("vec_id"),
        "vec_id", "embedding", "vec_id",
        k = 8, candidates = 8, lambdaPpm = 1000000L)
      .collect().sortBy(_.getAs[Long]("pick_rank"))
    val ids = got.map(_.getAs[Long]("id")).toSeq
    assert(ids.distinct == ids, s"repeated id in picks: $ids")
    assert(ids.toSet == Set(1L, 2L, 3L), s"picks $ids")
  }

  test("k capped at pool size; lambda=1e6 degenerates to relevance") {
    import spark.implicits._
    val emb = (0L until 4L)
      .map(i => (i, Seq(1.0f, 0.5f, i.toFloat / 10)))
      .toDF("vec_id", "embedding")
    val got = SimilaritySearch.mmrTopK(emb,
        emb.where(col("vec_id") === 0L), "vec_id", "embedding", "vec_id",
        k = 8, candidates = 8, lambdaPpm = 1000000L)
      .collect().sortBy(_.getAs[Long]("pick_rank"))
    assert(got.length == 3, "only 3 candidates exist")
    // the query's third component is 0, so rel is identical for all
    // three candidates — the deterministic id-asc tiebreak decides
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
  }
}
