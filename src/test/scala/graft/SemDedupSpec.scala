package graft

import graft.operators.SemDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup cluster-scoped semantic dedup: the keep-the-outlier policy
  * (lowest centroid cosine survives), exact-copy ties to the minimum
  * id, singletons keep themselves, and the documented recall trade —
  * a near-dup pair split across two cells is not examined. */
class SemDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  // two pinned unit-axis centroids (quantized at 1024): every
  // assignment and centroid cosine below is hand-checkable
  private val centroids =
    Array(Array(1024L, 0L, 0L, 0L), Array(0L, 1024L, 0L, 0L))

  private def run(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    SemDedup.verdicts(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, threshold = 0.99,
        centroids = Some(centroids))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cluster"), r.getAs[Long]("component"),
          r.getAs[Boolean]("keep"))).toMap
  }

  test("keep-the-outlier: the group member FARTHEST from its centroid " +
      "survives; exact-copy ties break to the minimum id") {
    val got = run(Seq(
      1L -> Seq(1.0, 0.0, 0.0, 0.0),      // exactly centroid A
      2L -> Seq(0.999, 0.04, 0.0, 0.0),   // near-dup of 1, off-centroid
      8L -> Seq(0.999, 0.04, 0.0, 0.0),   // exact copy of 2
      3L -> Seq(0.0, 1.0, 0.0, 0.0),      // exactly centroid B
      4L -> Seq(0.04, 0.999, 0.0, 0.0)))  // near-dup of 3, off-centroid
    // cluster A group {1, 2, 8}: ids 2/8 tie at the lowest centroid
    // cosine -> min id 2 is the representative
    assert(got(1L)._3 == false && got(2L)._3 == true &&
      got(8L)._3 == false, got.toString)
    assert(Set(1L, 2L, 8L).map(got(_)._2) == Set(1L),
      "A-group must share component 1")
    // cluster B group {3, 4}: 4 is farther from the centroid -> kept
    assert(got(3L)._3 == false && got(4L)._3 == true)
    assert(got(1L)._1 == 0 && got(3L)._1 == 1)
  }

  test("singletons keep themselves; a near-dup pair SPLIT ACROSS two " +
      "cells is not examined (the documented recall trade)") {
    val got = run(Seq(
      9L -> Seq(0.9, 0.1, 0.0, 0.0),      // cluster A singleton
      // cos(6,7) = 0.99936 >= 0.99, but 6 assigns to A and 7 to B
      6L -> Seq(0.72, 0.694, 0.0, 0.0),
      7L -> Seq(0.694, 0.72, 0.0, 0.0)))
    assert(got(9L)._3 == true)
    assert(got(6L)._1 == 0 && got(7L)._1 == 1,
      "boundary pair must straddle the two cells for this fixture")
    assert(got(6L)._3 == true && got(7L)._3 == true,
      "cross-cell near-dups are out of scope by design")
    assert(got(6L)._2 == 6L && got(7L)._2 == 7L)
  }

  test("planted hot cell: the grid split fires and the verdicts are " +
      "bit-identical to the unguarded plan (exact split, no recall " +
      "loss inside the cell)") {
    import spark.implicits._
    // 60 rows in cluster A — 40 of them forming 20 exact-copy pairs —
    // plus a 3-row cluster B; cap 16 forces g = ceil(60/16) = 4 on A
    val hot = (0 until 20).flatMap { i =>
      val base = Seq(0.999, 0.01 + i * 0.001, 0.0, 0.0)
      Seq((100L + i) -> base, (500L + i) -> base)
    } ++ (0 until 20).map(i =>
      (900L + i) -> Seq(0.9, 0.2 + i * 0.02, 0.0, 0.0))
    val cold = Seq(30L -> Seq(0.0, 1.0, 0.0, 0.0),
      31L -> Seq(0.02, 0.999, 0.0, 0.0), 32L -> Seq(0.02, 0.999, 0.0, 0.0))
    val df = (hot ++ cold).toDF("vec_id", "embedding")
    def verdicts() = SemDedup.verdicts(df, "vec_id", "embedding",
        k = 2, threshold = 0.99, centroids = Some(centroids))
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Int]("cluster"), r.getAs[Long]("component"),
        r.getAs[Long]("centroid_cos_q"), r.getAs[Boolean]("keep")))
      .sortBy(_._1).toSeq
    val unguarded = verdicts()
    spark.conf.set("graft.semdedup.maxCellRows", "16")
    val split =
      try verdicts()
      finally spark.conf.unset("graft.semdedup.maxCellRows")
    assert(split == unguarded,
      "grid-split verdicts must be bit-identical to the unguarded plan")
    // sanity on the fixture itself: every exact-copy pair landed in
    // one component (the split examined the pair), exactly one keep
    // per component, and the cold cluster still dedups
    val byId = split.map(r => r._1 -> r).toMap
    (0 until 20).foreach { i =>
      assert(byId(100L + i)._3 == byId(500L + i)._3,
        s"copy pair $i must share a component")
    }
    split.groupBy(_._3).foreach { case (comp, members) =>
      assert(members.count(_._5) == 1,
        s"component $comp must have exactly one representative")
    }
    assert(byId(31L)._3 == byId(32L)._3 &&
      byId(31L)._5 != byId(32L)._5,
      "cold-cluster exact pair still dedups under the split plan")
  }

  test("probeCells = 2 recovers the boundary-straddling pair the " +
      "single-cell scan misses, leaves no-boundary fixtures " +
      "bit-identical, and composes with the hot-cell grid split") {
    import spark.implicits._
    def run2(rows: Seq[(Long, Seq[Double])], pc: Int) =
      SemDedup.verdicts(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", k = 2, threshold = 0.99,
          centroids = Some(centroids), probeCells = pc)
        .collect().map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Int]("cluster"), r.getAs[Long]("component"),
            r.getAs[Boolean]("keep"))).toMap
    // the recall-trade fixture: cos(6,7) = 0.99936 but the members
    // quantize into different cells — single-cell misses, 2-probe hits
    val boundary = Seq(
      9L -> Seq(0.9, 0.1, 0.0, 0.0),
      6L -> Seq(0.72, 0.694, 0.0, 0.0),
      7L -> Seq(0.694, 0.72, 0.0, 0.0))
    val single = run2(boundary, 1)
    assert(single(6L)._3 && single(7L)._3, "missed at probeCells = 1")
    val multi = run2(boundary, 2)
    assert(multi(6L)._2 == multi(7L)._2,
      "2-probe must join the boundary pair into one component")
    assert(multi(6L)._3 != multi(7L)._3,
      "exactly one of the recovered pair survives")
    // cluster assignment (and so centroid cosine / keep-pick inputs)
    // stay 1-nearest under multi-probe
    assert(multi(6L)._1 == single(6L)._1 && multi(7L)._1 == single(7L)._1)
    assert(multi(9L)._3)
    // a fixture with NO cross-cell pairs: multi-probe changes nothing
    val plain = Seq(
      1L -> Seq(1.0, 0.0, 0.0, 0.0),
      2L -> Seq(0.999, 0.04, 0.0, 0.0),
      8L -> Seq(0.999, 0.04, 0.0, 0.0),
      3L -> Seq(0.0, 1.0, 0.0, 0.0),
      4L -> Seq(0.04, 0.999, 0.0, 0.0))
    assert(run2(plain, 2) == run2(plain, 1))
    // and the grid split composes: force a hot cell under 2-probe —
    // verdicts must stay bit-identical to the unguarded 2-probe plan
    // (the pair-set argument is per probed cell, so it survives the
    // domain explode)
    val hot = (0 until 20).flatMap { i =>
      val base = Seq(0.999, 0.01 + i * 0.001, 0.0, 0.0)
      Seq((100L + i) -> base, (500L + i) -> base)
    } ++ boundary
    val unguarded = run2(hot, 2)
    spark.conf.set("graft.semdedup.maxCellRows", "16")
    val split =
      try run2(hot, 2)
      finally spark.conf.unset("graft.semdedup.maxCellRows")
    assert(split == unguarded,
      "grid-split 2-probe verdicts must equal the unguarded 2-probe")
    assert(split(6L)._2 == split(7L)._2,
      "boundary pair still recovered under the split")
  }

  test("semdedupKFor grows k linearly with the corpus (constant " +
      "expected cell size), never returns < 1") {
    assert(SemDedup.semdedupKFor(1L) == 1)
    assert(SemDedup.semdedupKFor(2048L) == 1)
    assert(SemDedup.semdedupKFor(2049L) == 2)
    assert(SemDedup.semdedupKFor(1000000L) == 489)
    assert(SemDedup.semdedupKFor(10000000L) == 4883,
      "10x corpus -> 10x cells: per-cell work stays constant")
    assert(SemDedup.semdedupKFor(100L, targetCellRows = 10L) == 10)
    intercept[IllegalArgumentException] {
      SemDedup.semdedupKFor(0L)
    }
  }

  test("semdedupKFor is probeCells-aware (r14): the budget scales by " +
      "probeCells so PROBED occupancy — the pair join's true key " +
      "cardinality — stays at the single-probe target") {
    // p-probe over n rows == single-probe over p·n rows
    assert(SemDedup.semdedupKFor(1000000L, probeCells = 2) ==
      SemDedup.semdedupKFor(2000000L))
    assert(SemDedup.semdedupKFor(1000000L, probeCells = 3) ==
      SemDedup.semdedupKFor(3000000L))
    // default unchanged — the r13 planner verbatim at probeCells = 1
    assert(SemDedup.semdedupKFor(1000000L) ==
      SemDedup.semdedupKFor(1000000L, probeCells = 1))
    // hand arithmetic at the gate fixture: 525 rows, target 64,
    // 2-probe -> ceil(1050/64) = 17 (vs 9 single-probe)
    assert(SemDedup.semdedupKFor(525L, targetCellRows = 64L,
      probeCells = 2) == 17)
    assert(SemDedup.semdedupKFor(525L, targetCellRows = 64L) == 9)
    // floored at probeCells: verdicts needs k >= probeCells for the
    // probe list to exist at all
    assert(SemDedup.semdedupKFor(10L, targetCellRows = 64L,
      probeCells = 3) == 3)
    intercept[IllegalArgumentException] {
      SemDedup.semdedupKFor(100L, probeCells = 0)
    }
    // the planned 2-probe verdicts run end to end and agree with the
    // same-k explicit call (planner and executor share one contract)
    val e = graft.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val k = SemDedup.semdedupKFor(e.count(), targetCellRows = 64L,
      probeCells = 2)
    val planned = SemDedup.verdicts(e, "vec_id", "embedding", k = k,
        threshold = 0.99, probeCells = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(planned.nonEmpty)
  }
}
