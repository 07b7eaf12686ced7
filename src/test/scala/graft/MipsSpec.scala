package graft

import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Maximum-inner-product search (MIPS): the exact ranking, its genuine
  * divergence from cosine, and the ALSH (Shrivastava & Li 2014)
  * asymmetric-transform scale path in both flavors (float hyperplanes
  * and the portable integer-Rademacher buckets the q_mips_alsh oracle
  * replays). */
class MipsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emb = graft.Tables.embeddings(spark, sf)
  private lazy val queries = emb.where(col("vec_id") < 10)

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("id")).toSet }

  test("dot and cosine orderings genuinely differ (norm carries signal)") {
    import spark.implicits._
    // q = (1,0): the unit vector a is the cosine-nearest (cos = 1.0 vs
    // 0.707), but the long diagonal b wins on raw inner product (3 vs 1)
    // — the defining MIPS property (a vector need not be its own
    // nearest neighbor under dot, which is also why no symmetric LSH
    // family exists for it)
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(3.0, 3.0))).toDF("vec_id", "embedding")
    val q = Seq((10L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val byDot = SimilaritySearch.mipsTopK(
      corpus, q, "vec_id", "embedding", "vec_id", k = 2).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("id")).toSeq
    val byCos = SimilaritySearch.bruteForceTopK(
      corpus, q, "vec_id", "embedding", "vec_id", k = 2).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("id")).toSeq
    assert(byDot == Seq(2L, 1L), s"dot ranking $byDot")
    assert(byCos == Seq(1L, 2L), s"cosine ranking $byCos")
  }

  test("mipsTopK matches a hand-computed inner-product ranking") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),   // dot with q: 1*1 + 2*0 + 3*2 = 7
      (2L, Seq(4.0, 0.0, 0.5)),   // 4 + 0 + 1 = 5
      (3L, Seq(0.0, 9.0, 4.5)))   // 0 + 0 + 9 = 9
      .toDF("vec_id", "embedding")
    val q = Seq((10L, Seq(1.0, 0.0, 2.0))).toDF("vec_id", "embedding")
    val got = SimilaritySearch.mipsTopK(
      corpus, q, "vec_id", "embedding", "vec_id", k = 3).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("dot"))).toSeq
    assert(got == Seq((3L, 9.0), (1L, 7.0), (2L, 5.0)))
  }

  test("portable ALSH asymmetry: corpus kernel at its own norm2 equals " +
      "the plain portable signature (appended dim contributes nothing)") {
    val vecs = emb.select(col("embedding").cast("array<double>"))
      .limit(20).collect().map(_.getSeq[Double](0))
    vecs.foreach { v =>
      val n2 = v.map(x => { val q = math.floor(x * 1e6).toLong; q * q }).sum
      assert(SimilaritySearch.alshCorpusPortableKernel(v, 6, n2) ==
        SimilaritySearch.lshSignaturePortableKernel(v, 6),
        "zero-augmented corpus signature must equal the query-side bucket")
    }
    // empty/null guards mirror lshSignaturePortableKernel
    assert(SimilaritySearch.alshCorpusPortableKernel(null, 6, 0L) == 0L)
    assert(SimilaritySearch.alshCorpusPortableKernel(Seq.empty, 6, 0L) == 0L)
  }

  test("ALSH MIPS recalls real signal vs exact MIPS and scores with the " +
      "exact dot (both bucket flavors)") {
    val exact = topkSet(SimilaritySearch.mipsTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10))
    for (portable <- Seq(false, true)) {
      val alsh = SimilaritySearch.mipsAlshTopK(
        emb, queries, "vec_id", "embedding", "vec_id", k = 10,
        bits = 3, portableBuckets = portable)
      val got = topkSet(alsh)
      val recalls = exact.map { case (q, want) =>
        want.intersect(got.getOrElse(q, Set.empty)).size.toDouble / want.size
      }
      val mean = recalls.sum / recalls.size
      // 3-bit buckets keep ~1/8 of the corpus per query on near-random
      // vectors; chance recall@10 at that pool size is ~0.12 — 0.25+
      // means bucket collisions correlate with high inner product
      // through the augmented-cosine reduction
      assert(mean >= 0.25, s"mean ALSH(portable=$portable) recall $mean")
      // LSH buys recall, never scores: every returned dot is the exact
      // inner product of the original (un-augmented) vectors
      val byId = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => r.getAs[Long](0) -> r.getSeq[Double](1)).toMap
      alsh.collect().foreach { r =>
        val want = byId(r.getAs[Long]("query_id")).lazyZip(
          byId(r.getAs[Long]("id"))).map(_ * _).sum
        assert(math.abs(r.getAs[Double]("dot") - want) < 1e-9)
      }
      // every ranked list is a valid 1..n prefix
      alsh.collect().groupBy(_.getAs[Long]("query_id")).foreach {
        case (_, rows) =>
          assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
            (1 to rows.length))
      }
    }
  }
}
