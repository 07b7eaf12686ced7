package graft

import graft.operators.Cms
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CmsSpec extends AnyFunSuite {
  import SparkTestSession._

  // skewed multiset: key i appears (i % 37) + 1 times
  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).flatMap(i => Seq.fill(i % 37 + 1)(s"key-$i")).toDF("k")
  }

  test("estimates are one-sided: est_n >= exact count for every key") {
    import spark.implicits._
    val df = corpus(2000)
    val regs = Cms.registers(df, col("k"))
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact_n"))
    val joined = Cms.estimates(regs, exact.select("k"), "k")
      .join(exact, Seq("k")).collect()
    assert(joined.length == 2000)
    joined.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("exact_n"),
        s"${r.getString(0)}: est ${r.getAs[Long]("est_n")} < " +
          s"exact ${r.getAs[Long]("exact_n")}")
    }
  }

  test("weighted build from pre-counted keys equals the unit build") {
    val df = corpus(1500)
    val counts = df.groupBy("k").agg(count(lit(1)).as("n_k"))
    val unit = Cms.registers(df, col("k"))
      .orderBy("depth", "bucket").collect().toSeq
    val weighted = Cms.registersWeighted(counts, col("k"), col("n_k"))
      .orderBy("depth", "bucket").collect().toSeq
    assert(unit.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))) ==
      weighted.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))))
  }

  test("shard sketches merge by register sum to the whole-input sketch") {
    import spark.implicits._
    val a = corpus(1200)
    val b = (800 until 2200).map(i => s"key-$i").toDF("k")
    val whole = Cms.registers(a.union(b), col("k"))
      .orderBy("depth", "bucket").collect().toSeq
    val merged = Cms.merged(Seq(
        Cms.registers(a, col("k")), Cms.registers(b, col("k"))))
      .orderBy("depth", "bucket").collect().toSeq
    assert(whole.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))) ==
      merged.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))))
  }

  test("register frame is bounded and conserves mass per depth") {
    val df = corpus(3000)
    val regs = Cms.registers(df, col("k")).collect()
    assert(regs.length <= Cms.D * Cms.W)
    val total = df.count()
    val perDepth = regs.groupBy(_.getInt(0)).view.mapValues(
      _.map(_.getLong(2)).sum)
    assert(perDepth.size == Cms.D)
    perDepth.foreach { case (d, s) =>
      assert(s == total, s"depth $d mass $s != $total")
    }
  }

  test("partitioning does not move the register frame") {
    val df = corpus(1000)
    val a = Cms.registers(df, col("k"))
      .orderBy("depth", "bucket").collect().toSeq
    val b = Cms.registers(df.repartition(17), col("k"))
      .orderBy("depth", "bucket").collect().toSeq
    assert(a.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))) ==
      b.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))))
  }
}
