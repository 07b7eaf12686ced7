package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

/** Bradley–Terry MM ranking: exact local replay of the integer
  * recursion, order correctness on a dominance chain, symmetry on
  * equal records, and the all-loser floor. */
class BradleyTerrySpec extends AnyFunSuite {
  import SparkTestSession._

  /** Independent local replica of the operator's integer MM loop. */
  private def localBt(matches: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val n = matches.groupBy { case (w, l) => (math.min(w, l), math.max(w, l)) }
      .view.mapValues(_.size.toLong).toMap
    val items = matches.flatMap(m => Seq(m._1, m._2)).distinct.sorted
    val wins = matches.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var p = items.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val raw = items.map { i =>
        val denom = n.collect {
          case ((a, b), cnt) if a == i || b == i =>
            val j = if (a == i) b else a
            cnt * 1000000000L / (p(i) + p(j))
        }.sum
        i -> math.min(
          wins.getOrElse(i, 0L) * 1000000000L / math.max(denom, 1L),
          1000000000000L)
      }.toMap
      val mean = math.max(raw.values.sum / items.size, 1L)
      p = raw.map { case (i, v) => i -> math.max(v * 1000000L / mean, 1L) }
    }
    p
  }

  private def run(matches: Seq[(Long, Long)], iters: Int = 5) = {
    import spark.implicits._
    Graph.bradleyTerryQ6(matches.toDF("winner", "loser"),
        "winner", "loser", iters)
      .collect()
      .map(r => r.getAs[Long]("item") ->
        (r.getAs[Long]("wins"), r.getAs[Long]("n_matches"),
          r.getAs[Long]("strength_q6"))).toMap
  }

  test("every strength replays the local integer MM recursion") {
    // lopsided round-robin-ish fixture with repeats and upsets
    val ms = (for {
      i <- 0L until 12L; j <- (i + 1) until 12L
      if (i + j) % 3 != 0
    } yield if ((i * 7 + j) % 5 < 3) (i, j) else (j, i)) ++
      Seq((0L, 1L), (0L, 1L), (2L, 0L))
    val got = run(ms)
    val want = localBt(ms, 5)
    assert(got.keySet == want.keySet)
    got.foreach { case (i, (_, _, s)) =>
      assert(s == want(i), s"item $i: got $s want ${want(i)}")
    }
  }

  test("dominance chain orders strengths; equal records tie exactly") {
    // 0 beats 1 twice, 1 beats 2 twice, 2 beats 3 twice: strict chain
    val chain = Seq((0L, 1L), (0L, 1L), (1L, 2L), (1L, 2L),
      (2L, 3L), (2L, 3L))
    val s = run(chain).view.mapValues(_._3).toMap
    assert(s(0L) > s(1L) && s(1L) > s(2L) && s(2L) > s(3L), s.toString)
    // symmetric 2-cycle: identical records -> identical strengths
    val even = run(Seq((10L, 11L), (11L, 10L)))
    assert(even(10L)._3 == even(11L)._3)
    // the all-loser keeps the >= 1 floor, never 0 or negative
    assert(s(3L) >= 1L)
    val wins = run(chain)(0L)
    assert(wins == ((2L, 2L, s(0L))), "wins/n_matches bookkeeping")
  }
}
