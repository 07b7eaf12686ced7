package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic synchronous label propagation: communities on a
  * planted two-clique-plus-bridge graph (where connected components
  * would merge everything), a local replay of the argmax recurrence,
  * and storage hygiene. */
class LabelPropSpec extends AnyFunSuite {
  import SparkTestSession._

  private def edges(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("id_a", "id_b")
  }

  test("two 4-cliques joined by one bridge edge stay separate " +
      "communities (CC would merge them)") {
    // cliques {0..3} and {10..13}, bridge 3-10
    val clique = (ids: Seq[Long]) =>
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val e = edges(clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (3L, 10L))
    val got = Graph.labelPropagation(e, iters = 4)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("community"))
      .toMap
    val left = Seq(0L, 1L, 2L, 3L).map(got)
    val right = Seq(10L, 11L, 12L, 13L).map(got)
    assert(left.distinct.size == 1, s"left clique split: $left")
    assert(right.distinct.size == 1, s"right clique split: $right")
    assert(left.head != right.head,
      s"bridge merged the cliques: $got")
  }

  test("every round replays the local argmax (count desc, label asc) " +
      "recurrence") {
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L))
    val iters = 3
    val got = Graph.labelPropagation(edges(pairs), iters)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("community"))
      .toMap
    // independent local replay
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      lbl = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(lbl).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        val mx = counts.values.max
        n -> counts.filter(_._2 == mx).keys.min
      }
    }
    assert(got == lbl)
  }

  test("round plan: one src exchange feeds BOTH aggs (plus the " +
      "node-sized label shuffle to the edge partitioning)") {
    import spark.implicits._
    val e = (Seq((0L, 1L), (1L, 2L), (2L, 3L)) ++
      Seq((1L, 0L), (2L, 1L), (3L, 2L)))
      .toDF("src", "dst")
    val lbl = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("node", "lbl")
    val plan = Graph.lpRound(e, lbl).queryExecution.executedPlan.toString
    // the load-bearing claim: exactly ONE src-keyed exchange — the
    // explicit repartition — which BOTH aggs reuse
    // (HashPartitioning(src) satisfies the (src, lbl) clustering too:
    // the subset rule). Without the repartition each agg plans its own
    // exchange and this count is 2.
    val srcExchanges = "Exchange hashpartitioning\\(src".r
      .findAllIn(plan).size
    assert(srcExchanges == 1,
      s"expected one shared src exchange, got $srcExchanges in:\n$plan")
  }

  test("no persistent-RDD residue after the run") {
    // before/after diff, not global emptiness — independent of what
    // other suites left in the shared session (StorageHygieneSpec
    // convention)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val e = edges(Seq((0L, 1L), (1L, 2L)))
    val out = Graph.labelPropagation(e, iters = 2)
    out.count()
    graft.operators.Caches.releaseResult(out)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked RDD ids: ${leaked.toSeq.sorted}")
  }
}
