package graft

import graft.operators.Skew
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // hot key: 'a' holds 90% of rows
    val big = ((1 to 900).map(i => ("a", i)) ++
      (1 to 50).map(i => ("b", i)) ++ (1 to 50).map(i => ("c", i)))
      .toDF("k", "v")
    val small = Seq(("a", 10), ("b", 20), ("c", 30), ("d", 40))
      .toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("k", "v", "w")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltFactor = 4)
      .select("k", "v", "w")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
  }

  test("two-phase salted sum equals plain groupBy sum") {
    import spark.implicits._
    val df = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      (1 to 20).map(i => ("cold", i.toLong))).toDF("k", "v")
    val got = Skew.twoPhaseSum(df, Seq("k"), "v", 8)
      .collect().map(r => (r.getString(0), r.getAs[Long]("sum_v"),
        r.getAs[Long]("count"))).toSet
    assert(got == Set(("hot", 500500L, 1000L), ("cold", 210L, 20L)))
  }
}
