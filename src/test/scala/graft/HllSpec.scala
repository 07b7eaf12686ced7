package graft

import graft.operators.Hll
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite {
  import SparkTestSession._

  test("estimate is within 3 sigma of exact and partitioning-invariant") {
    import spark.implicits._
    val n = 20000
    val df = (0 until n).map(i => s"key-$i").toDF("k")
    val est = Hll.estimate(df, col("k")).head()
    val e = est.getAs[Long]("est_q").toDouble
    // sigma = 1.04/sqrt(4096) ~ 1.6%; 3 sigma ~ 4.9%
    assert(math.abs(e - n) / n < 0.049, s"estimate $e vs exact $n")
    // registers are set algebra: any partitioning yields the same frame
    val again = Hll.estimate(df.repartition(13), col("k")).head()
    assert(again.getAs[Long]("s_scaled") == est.getAs[Long]("s_scaled"))
    assert(again.getAs[Long]("est_q") == est.getAs[Long]("est_q"))
  }

  test("duplicates do not move the estimate (distinct-count, not count)") {
    import spark.implicits._
    val base = (0 until 5000).map(i => s"k$i")
    val dup = (base ++ base ++ base.take(1000)).toDF("k")
    val a = Hll.estimate(base.toDF("k"), col("k")).head()
      .getAs[Long]("est_q")
    val b = Hll.estimate(dup, col("k")).head().getAs[Long]("est_q")
    assert(a == b)
  }

  test("register frames merge by min: sketch(A ∪ B) == merge of shards") {
    import spark.implicits._
    val a = (0 until 3000).map(i => s"x$i").toDF("k")
    val b = (1500 until 4500).map(i => s"x$i").toDF("k")
    val whole = Hll.registers(a.union(b), col("k"))
      .orderBy("bucket").collect().toSeq
    val merged = Hll.registers(a, col("k"))
      .unionByName(Hll.registers(b, col("k")))
      .groupBy("bucket").agg(min("min_len").as("min_len"))
      .orderBy("bucket").collect().toSeq
    assert(whole.map(r => (r.getLong(0), r.getLong(1))) ==
      merged.map(r => (r.getLong(0), r.getLong(1))))
  }

  test("small cardinality takes the linear-counting branch exactly") {
    import spark.implicits._
    val df = (0 until 40).map(i => s"v$i").toDF("k")
    val r = Hll.estimate(df, col("k")).head()
    // 40 keys, 4096 buckets: collisions vanishingly unlikely, LC is exact
    assert(r.getAs[Long]("n_present") == 40)
    assert(r.getAs[Long]("est_q") == 40)
  }

  test("keyed sketches: per-group estimate equals the global sketch of " +
      "each group; merge surface preserved") {
    import spark.implicits._
    val df = ((0 until 8000).map(i => ("big", s"k$i")) ++
      (0 until 50).map(i => ("small", s"s$i")) ++
      (0 until 50).map(i => ("small", s"s$i"))) // dups: distinct only
      .toDF("g", "k")
    val grouped = Hll.estimateByGroups(df, Seq("g"), col("k"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("s_scaled"), r.getAs[Long]("est_q"))).toMap
    Seq("big", "small").foreach { g =>
      val solo = Hll.estimate(df.where(col("g") === g), col("k")).head()
      assert(grouped(g) ==
        (solo.getAs[Long]("s_scaled"), solo.getAs[Long]("est_q")),
        s"group $g diverges from its own global sketch")
    }
    // the small group must take the linear-counting branch and be exact
    assert(grouped("small")._2 == 50L)
    // keyed shard merge: registersBy frames union + re-min == whole
    val a = df.where(col("k") < "k4")
    val b = df.where(!(col("k") < "k4"))
    val whole = Hll.registersBy(df, Seq("g"), col("k"))
      .orderBy("g", "bucket").collect().toSeq
    val merged = Hll.registersBy(a, Seq("g"), col("k"))
      .unionByName(Hll.registersBy(b, Seq("g"), col("k")))
      .groupBy("g", "bucket").agg(min("min_len").as("min_len"))
      .orderBy("g", "bucket").collect().toSeq
    assert(whole.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ==
      merged.map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
  }
}
