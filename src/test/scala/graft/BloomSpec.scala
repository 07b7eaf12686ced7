package graft

import graft.operators.Bloom
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  import SparkTestSession._

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    val members = (0 until 5000).map(i => s"m$i").toDF("k")
    val filt = Bloom.build(members, col("k"))
    val probed = Bloom.mightContain(filt, members, "k").collect()
    assert(probed.length == 5000)
    probed.foreach(r => assert(r.getAs[Boolean]("in_bloom"),
      s"false negative for ${r.getString(0)}"))
  }

  test("false-positive rate is near the analytic bound") {
    import spark.implicits._
    val members = (0 until 5000).map(i => s"m$i").toDF("k")
    val filt = Bloom.build(members, col("k"))
    val nonMembers = (0 until 20000).map(i => s"x$i").toDF("k")
    val fp = Bloom.mightContain(filt, nonMembers, "k")
      .where(col("in_bloom")).count()
    // p = (1 - e^(-K n / m))^K ~ (1 - e^-0.305)^4 ~ 0.48% at these sizes;
    // allow 3x slack for hash clustering
    assert(fp < 20000 * 0.015, s"$fp false positives out of 20000")
  }

  test("a saturating small filter still never lies negative") {
    import spark.implicits._
    val members = (0 until 4000).map(i => s"s$i").toDF("k")
    val filt = Bloom.build(members, col("k"), k = 3, mBits = 1024)
    val probed = Bloom.mightContain(filt, members, "k", k = 3,
      mBits = 1024).collect()
    probed.foreach(r => assert(r.getAs[Boolean]("in_bloom")))
  }

  test("shard filters OR-merge to the whole-input filter") {
    import spark.implicits._
    val a = (0 until 3000).map(i => s"k$i").toDF("k")
    val b = (2000 until 6000).map(i => s"k$i").toDF("k")
    val whole = Bloom.build(a.union(b), col("k"))
      .orderBy("word_idx").collect().toSeq
    val merged = Bloom.merged(Seq(
        Bloom.build(a, col("k")), Bloom.build(b, col("k"))))
      .orderBy("word_idx").collect().toSeq
    assert(whole.map(r => (r.getLong(0), r.getLong(1))) ==
      merged.map(r => (r.getLong(0), r.getLong(1))))
  }

  test("insertion is idempotent and partitioning-invariant") {
    import spark.implicits._
    val base = (0 until 2000).map(i => s"d$i")
    val once = Bloom.build(base.toDF("k"), col("k"))
      .orderBy("word_idx").collect().toSeq
    val thrice = Bloom.build((base ++ base ++ base).toDF("k")
        .repartition(13), col("k"))
      .orderBy("word_idx").collect().toSeq
    assert(once.map(r => (r.getLong(0), r.getLong(1))) ==
      thrice.map(r => (r.getLong(0), r.getLong(1))))
  }
}
