package graft

import graft.operators.SimilaritySearch
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySearchSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emb = graft.Tables.embeddings(spark, sf)
  private lazy val queries = emb.where(
    org.apache.spark.sql.functions.col("vec_id") < 10)

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("id")).toSet }

  test("IVF ANN recalls most of the exact top-10") {
    val exact = topkSet(SimilaritySearch.bruteForceTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10))
    val ivf = topkSet(SimilaritySearch.ivfTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10,
      nlist = 8, nprobe = 4))
    val recalls = exact.map { case (q, want) =>
      val got = ivf.getOrElse(q, Set.empty)
      want.intersect(got).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean IVF recall $mean")
  }

  test("PQ ANN recalls most of the exact top-10 and is deterministic") {
    val exact = topkSet(SimilaritySearch.bruteForceTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10))
    val pq = SimilaritySearch.pqTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10,
      m = 16, ksub = 16)
    val got = topkSet(pq)
    val recalls = exact.map { case (q, want) =>
      want.intersect(got.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    // the synthetic vectors are near-random, so neighbor margins are
    // tiny — the hardest case for a lossy code. Chance recall@10 here
    // is ~0.02; 0.3+ means the quantized distances carry real signal
    // (measured ~0.5 at sf0.01; clustered real embeddings do better).
    assert(mean >= 0.3, s"mean PQ recall $mean")
    // seeded training + quantized ADC → bit-identical re-run
    val again = SimilaritySearch.pqTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10,
      m = 16, ksub = 16)
    assert(pq.collect().map(_.toString).sorted.toSeq ==
      again.collect().map(_.toString).sorted.toSeq)
  }

  test("IVF-PQ ANN recalls real signal vs the exact top-10, ranks only " +
      "probed-cell candidates, and is deterministic") {
    val exact = topkSet(SimilaritySearch.bruteForceTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10))
    val ivfpq = SimilaritySearch.ivfPqTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10,
      nlist = 8, nprobe = 4, m = 16, ksub = 16)
    val got = topkSet(ivfpq)
    val recalls = exact.map { case (q, want) =>
      want.intersect(got.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    // routing halves the candidate pool (nprobe/nlist = 1/2) on top of
    // PQ's lossy code, on near-random vectors — the floor is the PQ
    // bound scaled by the probe ratio, far above chance (~0.02)
    assert(mean >= 0.2, s"mean IVF-PQ recall $mean")
    // every ranked list is a valid 1..n prefix
    ivfpq.collect().groupBy(_.getAs[Long]("query_id"))
      .foreach { case (_, rows) =>
        assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
          (1 to rows.length))
      }
    // seeded training + quantized ADC → bit-identical re-run
    val again = SimilaritySearch.ivfPqTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10,
      nlist = 8, nprobe = 4, m = 16, ksub = 16)
    assert(ivfpq.collect().map(_.toString).sorted.toSeq ==
      again.collect().map(_.toString).sorted.toSeq)
  }

  test("residual IVF-PQ (paper IVFADC) recalls real signal and is " +
      "deterministic") {
    val exact = topkSet(SimilaritySearch.bruteForceTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10))
    val res = SimilaritySearch.ivfPqTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10,
      nlist = 8, nprobe = 4, m = 16, ksub = 16, byResidual = true)
    val got = topkSet(res)
    val recalls = exact.map { case (q, want) =>
      want.intersect(got.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean residual IVF-PQ recall $mean")
    val again = SimilaritySearch.ivfPqTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10,
      nlist = 8, nprobe = 4, m = 16, ksub = 16, byResidual = true)
    assert(res.collect().map(_.toString).sorted.toSeq ==
      again.collect().map(_.toString).sorted.toSeq)
  }

  test("LSH ANN returns valid ranked subsets of the corpus") {
    val lsh = SimilaritySearch.lshTopK(
      emb, queries, "vec_id", "embedding", "vec_id", k = 10, bits = 4)
      .collect()
    assert(lsh.nonEmpty)
    lsh.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to ranks.length))
    }
  }

  test("portable LSH buckets: locality + sign symmetry + determinism") {
    val k = SimilaritySearch.lshSignaturePortableKernel _
    val v = Seq(0.5, -0.25, 1.0, 0.125)
    assert(k(v, 16) == k(v, 16))
    // identical vectors share every bucket; negation flips every
    // projection with a nonzero sum (sign-of-projection family)
    assert(k(v, 16) == k(Seq(0.5, -0.25, 1.0, 0.125), 16))
    assert(k(v.map(-_), 16) != k(v, 16))
    assert(k(Seq.empty, 16) == 0L)
  }

  test("native vec_cosine and lsh_signature are bit-identical to the HOF twins") {
    import org.apache.spark.sql.functions._
    graft.plans.GraftExtensions.register(spark)
    val v = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val paired = v.select(col("vec_id"), col("v"),
      reverse(col("v")).as("w"))
    val rows = paired.select(
      SimilaritySearch.cosine(col("v"), col("w")).as("native_cos"),
      SimilaritySearch.cosineHof(col("v"), col("w")).as("hof_cos"),
      SimilaritySearch.lshSignature(col("v"), 16).as("native_sig"),
      SimilaritySearch.lshSignatureHof(col("v"), 16).as("hof_sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"cosine ${r.getDouble(0)} != ${r.getDouble(1)}")
      assert(r.getLong(2) == r.getLong(3),
        s"sig ${r.getLong(2)} != ${r.getLong(3)}")
    }
  }

  test("md5Long56Local is bit-identical to the Column form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.Hashing
    val strs = Seq("jl|0|0", "jl|63|15", "a", "", "xyz|13|7",
      "Grüße ☃") // multi-byte UTF-8 must hash identically too
    val fromCol = strs.toDF("s")
      .select(col("s"), Hashing.md5Long56(col("s")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s =>
      assert(fromCol(s) == Hashing.md5Long56Local(s), s"mismatch on '$s'")
    }
  }

  test("jlReduce: deterministic, and squared norms concentrate (JL)") {
    import org.apache.spark.sql.functions._
    val e = emb.select(col("vec_id"), col("embedding")).limit(100)
    val p1 = SimilaritySearch.jlReduce(e, "vec_id", "embedding", k = 16)
    val p2 = SimilaritySearch.jlReduce(e, "vec_id", "embedding", k = 16)
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty,
      "projection is not deterministic")
    // E[‖proj‖²] = ‖x‖² for the ±1/√k ensemble; check the per-vector
    // ratio is in a loose concentration band on real embeddings
    val orig = e.select(col("vec_id"),
      aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double")).as("n2"))
    val proj = p1.groupBy("vec_id")
      .agg(sum(col("value") * col("value")).as("p2"))
    val ratios = proj.join(orig, "vec_id")
      .select((col("p2") / col("n2")).as("r"))
      .where(col("n2") > 0).collect().map(_.getDouble(0))
    assert(ratios.nonEmpty)
    val median = ratios.sorted.apply(ratios.length / 2)
    assert(median > 0.5 && median < 1.5,
      s"norm ratio median $median outside JL concentration band")
  }
  test("hardNegatives: top-k similar vectors never share the anchor label") {
    import spark.implicits._
    // three labels; vectors cluster by label direction with cross-label
    // neighbors planted close to the anchor
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f), 0), // same label, most similar — excluded
      (2L, Array(0.8f, 0.2f, 0.0f), 1), // different label → rank 1
      (3L, Array(0.7f, 0.3f, 0.0f), 2), // different label → rank 2
      (4L, Array(0.0f, 1.0f, 0.0f), 1),
      (5L, Array(0.0f, 0.0f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val anchors = vecs.where($"vec_id" === 0L)
    val res = SimilaritySearch.hardNegatives(vecs, anchors,
        "vec_id", "embedding", "label", k = 3)
      .orderBy("rank").collect()
    assert(res.map(_.getAs[Long]("id")).toSeq == Seq(2L, 3L, 4L))
    assert(res.forall(_.getAs[Int]("neg_label") != 0))
    assert(res.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    // cosines non-increasing
    val cos = res.map(_.getAs[Double]("cosine"))
    assert(cos.sliding(2).forall(p => p(0) >= p(1)))
  }
}
