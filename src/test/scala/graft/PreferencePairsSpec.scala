package graft

import graft.operators.DataPrep
import org.scalatest.funsuite.AnyFunSuite

/** DPO preference-pair construction: hand-computed pairing, the
  * no-reuse invariant (an id joins at most one pair), tie dropping,
  * odd-group middles left unpaired, and strictly positive margins. */
class PreferencePairsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("hand-computed group: i-th best pairs with i-th worst") {
    import spark.implicits._
    // one group, scores 50 > 40 > 30 > 20 > 10 on ids 1..5
    val df = Seq(("g", 1L, 50L), ("g", 2L, 40L), ("g", 3L, 30L),
        ("g", 4L, 20L), ("g", 5L, 10L))
      .toDF("k", "id", "s")
    val got = DataPrep.preferencePairs(df, "k", "id", "s")
      .collect().map(r => (r.getAs[Long]("pair_idx"),
        r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
        r.getAs[Long]("margin"))).sortBy(_._1)
    // n=5: pairs (rank1, rank5) and (rank2, rank4); rank-3 middle odd out
    assert(got.toSeq == Seq((1L, 1L, 5L, 40L), (2L, 2L, 4L, 20L)))
  }

  test("ties are dropped, ids are never reused, margins positive") {
    import spark.implicits._
    // group "t": all-equal scores -> zero pairs despite n=4
    val ties = (1L to 4L).map(i => ("t", i, 7L))
    // group "m": mixed with a tied middle pair (ranks 2,3 both 20)
    val mixed = Seq(("m", 1L, 90L), ("m", 2L, 20L), ("m", 3L, 20L),
      ("m", 4L, 5L))
    val df = (ties ++ mixed).toDF("k", "id", "s")
    val rows = DataPrep.preferencePairs(df, "k", "id", "s").collect()
    assert(!rows.exists(_.getAs[String]("pair_key") == "t"), "tie group")
    val m = rows.filter(_.getAs[String]("pair_key") == "m")
    // (90,5) survives; (20,20) is a tie -> dropped
    assert(m.map(r => (r.getAs[Long]("chosen_id"),
      r.getAs[Long]("rejected_id"))).toSeq == Seq((1L, 4L)))
    assert(rows.forall(_.getAs[Long]("margin") > 0))
    val used = rows.flatMap(r => Seq(r.getAs[Long]("chosen_id"),
      r.getAs[Long]("rejected_id")))
    assert(used.distinct.length == used.length, "id reused across pairs")
  }

  test("corpus-derived run is deterministic and k-row groups emit " +
      "at most k/2 pairs") {
    import spark.implicits._
    val df = (0L until 300L)
      .map(i => (s"g${i % 7}", i, (i * 37 % 101)))
      .toDF("k", "id", "s")
    val a = DataPrep.preferencePairs(df, "k", "id", "s").collect()
    val b = DataPrep.preferencePairs(df, "k", "id", "s").collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    val perKey = a.groupBy(_.getAs[String]("pair_key"))
      .view.mapValues(_.length)
    val sizes = (0L until 300L).groupBy(i => s"g${i % 7}")
      .view.mapValues(_.size)
    perKey.foreach { case (k, c) => assert(c <= sizes(k) / 2, s"key $k") }
  }
}
