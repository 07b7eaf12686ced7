package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** PageRank integer-nanos recurrence: hand-computed fixtures + the
  * conservation / convergence properties the nano arithmetic must keep.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRankNanos(
        edges.toDF("id_a", "id_b"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("two-node graph is the symmetric fixpoint from iteration 0") {
    // N=2: pr0 = 500000000; contrib = 5e8/1 → pr1 = 75000000 +
    // 17*5e8/20 = 75000000 + 425000000 = 500000000 — stable
    val ranks = pr(Seq((1L, 2L)), 5)
    assert(ranks == Map(1L -> 500000000L, 2L -> 500000000L))
  }

  test("path graph A-B-C: one iteration, hand-computed") {
    // N=3, pr0 = 333333333 each; deg A=1 B=2 C=1
    // S(A) = 333333333 div 2 = 166666666
    //   pr1(A) = 150000000 div 3 + 17*166666666 div 20
    //          = 50000000 + 141666666 = 191666666  (= pr1(C))
    // S(B) = 333333333 + 333333333 = 666666666
    //   pr1(B) = 50000000 + 17*666666666 div 20 = 616666666
    val ranks = pr(Seq((1L, 2L), (2L, 3L)), 1)
    assert(ranks == Map(1L -> 191666666L, 2L -> 616666666L,
      3L -> 191666666L))
  }

  test("center of a star dominates; total mass ≈ 1e9 (floor loss only)") {
    val star = (2L to 7L).map(i => (1L, i))
    val ranks = pr(star, 5)
    val center = ranks(1L)
    assert((2L to 7L).forall(i => ranks(i) < center))
    // every division floors; with ≤ 13 nodes·degrees per iteration the
    // loss is bounded well under 1000 nanos over 5 iterations
    val total = ranks.values.sum
    assert(total <= 1000000000L && total > 999999000L)
    // leaves are symmetric — identical integer arithmetic, identical rank
    assert((2L to 7L).map(ranks).toSet.size == 1)
  }

  test("hub holds the max rank at every depth; ranks stay in [0, 1e9]") {
    // (one iteration overshoots the hub — it receives nearly all mass
    // before reflecting it back out — so per-node monotonicity in the
    // iteration count does NOT hold; the ordering does)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
    Seq(1, 3, 5).foreach { k =>
      val r = pr(edges, k)
      assert(r(1L) == r.values.max, s"hub not max at iters=$k")
      assert(r.values.forall(v => v >= 0L && v <= 1000000000L))
    }
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    Graph.triangleStats(edges.toDF("id_a", "id_b"))
      .select("node", "deg", "n_tri", "clustering_ppm")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("triangleStats: clique is clustering 1e6, path is 0") {
    // K4: every node deg 3, 3 triangles each, clustering exactly 1
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val rk4 = tri(k4)
    assert(rk4.size == 4)
    assert(rk4.values.forall(_ == ((3L, 3L, 1000000L))))
    // path a-b-c: no triangles anywhere
    val rp = tri(Seq((1L, 2L), (2L, 3L)))
    assert(rp(2L) == ((2L, 0L, 0L)) && rp(1L) == ((1L, 0L, 0L)))
  }

  test("triangleStats: pendant on a triangle; unordered/dup edges canonicalize") {
    // triangle 1-2-3 plus pendant 3-4; edges given reversed + duplicated
    val e = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (4L, 3L))
    val r = tri(e)
    assert(r(3L) == ((3L, 1L, 333333L))) // 2*1*1e6 div (3*2)
    assert(r(1L) == ((2L, 1L, 1000000L)))
    assert(r(4L) == ((1L, 0L, 0L)))      // deg < 2 -> defined as 0
  }
}
