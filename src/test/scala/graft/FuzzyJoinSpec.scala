package graft

import graft.operators.FuzzyJoin
import org.scalatest.funsuite.AnyFunSuite

class FuzzyJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._

  test("finds planted typo pairs with exact distances, ordered ids, " +
      "no self-pairs") {
    import spark.implicits._
    val recs = Seq(
      (1L, "jonathan smith"),
      (2L, "jonathan smyth"),   // 1 substitution vs 1
      (3L, "jonathan smith jr"), // 3 insertions vs 1 — beyond maxDist
      (4L, "elizabeth jones"),
      (5L, "elizabeth jone"),   // 1 deletion vs 4
      (6L, "totally different")
    ).toDF("rec_id", "name")
    val pairs = FuzzyJoin.selfPairs(recs, "rec_id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(pairs == Set((1L, 2L, 1L), (4L, 5L, 1L)))
  }

  test("recall contract: an edit inside the block prefix is missed") {
    import spark.implicits._
    val recs = Seq((1L, "martha clark"), (2L, "Xartha clark"))
      .toDF("rec_id", "name")
    val found = FuzzyJoin.selfPairs(recs, "rec_id", "name").count()
    // distance is 1 but the first-character edit splits the blocks —
    // the documented LSH-banding-style trade, asserted so a future
    // "fix" that silently goes all-pairs gets caught here
    assert(found == 0)
  }
}
