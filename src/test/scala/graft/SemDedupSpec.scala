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
}
