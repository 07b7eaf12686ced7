package graft

import graft.operators.DataPrep
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curriculum ordering: fixed-threshold banding, round-robin source
  * interleave inside each band, negative-difficulty clamp, and the
  * one-exchange plan shape. */
class CurriculumSpec extends AnyFunSuite {
  import SparkTestSession._

  private def df(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "src", "diff")
  }

  test("banding is fixed-threshold integer division, capped at " +
      "maxBand, with negatives clamped to band 0") {
    val got = DataPrep.curriculumOrder(
        df(Seq((1L, "a", -5L), (2L, "a", 0L), (3L, "a", 9L),
          (4L, "a", 10L), (5L, "a", 99L))),
        "id", "src", col("diff"), bandWidth = 10L, maxBand = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("band"))
      .toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("within a band, the lexicographic (rank, source) order " +
      "round-robins the sources easy-first") {
    val rows = Seq(
      (1L, "a", 1L), (2L, "a", 3L), (3L, "b", 2L), (4L, "b", 4L),
      (5L, "a", 100L), (6L, "b", 101L))
    val got = DataPrep.curriculumOrder(df(rows), "id", "src",
        col("diff"), bandWidth = 10L, maxBand = 9)
      .orderBy("band", "interleave_rank", "src", "id")
      .collect().map(_.getAs[Long]("id")).toSeq
    // band 0: rank 1 of a (easiest: id 1), rank 1 of b (id 3), then
    // rank 2 of a (id 2), rank 2 of b (id 4); ids 5/6 (difficulty
    // 100/101) land in band 9 via the maxBand cap (100 div 10 = 10
    // clamps to 9) and trail the order
    assert(got == Seq(1L, 3L, 2L, 4L, 5L, 6L))
  }

  test("prefScore known answers — the independent leg for the " +
      "generated prefScoreSql oracles (q_curriculum/q_bt_rank/" +
      "q_dpo_pairs)") {
    import spark.implicits._
    val got = Seq(
      (1L, "The quick the fox"), // 2 stopword hits, 4 tokens
      (2L, ""),                  // empty: 0 hits, 0 tokens
      (3L, ("a " * 1200).trim))  // 1200 hits, token count caps at 999
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.TextFunctions.prefScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2004L, 2L -> 0L, 3L -> 1200999L), got)
  }

  test("plan: ONE exchange — the (band, source) window shuffle") {
    val plan = DataPrep.curriculumOrder(
        df(Seq((1L, "a", 1L))), "id", "src", col("diff"),
        bandWidth = 10L, maxBand = 3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"$exchanges exchanges in:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"global window in:\n$plan")
  }
}
