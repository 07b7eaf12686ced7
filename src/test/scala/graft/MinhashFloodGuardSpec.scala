package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Caches, Dedup}

/** Hot-band flood guard: a planted template cluster (thousands of
  * near-identical copies) concentrates every band key; without the
  * guard the band self-join mints O(k²) candidate pairs from one key.
  * With it, hot keys degrade to hub–member stars (hub = min id) — O(k)
  * pairs, diameter 2 — while [[Dedup.connectedComponents]] still recovers the FULL
  * cluster transitively, and cold keys keep complete pair recall.
  */
class MinhashFloodGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val template =
    "the quick brown fox jumps over the lazy dog while seventeen " +
      "identical boilerplate sentences repeat across every copy of " +
      "this templated document body"

  test("planted 2k-copy template: linear candidate count, full cluster via CC") {
    val n = 2000
    // identical text → identical shingle set → every copy lands in the
    // same 8 band keys; all-pairs would be ~2M pairs per key
    val docs = spark.range(n)
      .select(col("id").as("doc_id"), lit(template).as("text"))
    val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
      threshold = 0.5, maxBandDf = 50)
    val cnt = pairs.count()
    // hub–member star: exactly n−1 unique pairs (each band emits the
    // same min-id star), never the ~n²/2 flood
    assert(cnt == (n - 1).toLong,
      s"expected ${n - 1} star pairs, got $cnt")
    assert(pairs.agg(min("jaccard")).head.getDouble(0) == 1.0)
    // the star keeps the cluster connected at diameter 2: CC recovers
    // ALL n copies in one component within its iteration budget
    val comp = Dedup.connectedComponents(
      docs.select("doc_id"), pairs.select("id_a", "id_b"), "doc_id")
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("k"))
      .collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(n.toLong))
    Caches.clear()
    Seq(pairs, comp).foreach(Caches.releaseResult)
  }

  test("cold keys below the cap keep complete all-pairs recall") {
    // 4 mutual near-dups (df=4 ≤ cap) must emit ALL 6 pairs, not a star
    val docs = (0 until 4)
      .map(i => (i.toLong, template))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
      threshold = 0.5, maxBandDf = 50)
    assert(pairs.count() == 6L)
    Caches.releaseResult(pairs)
  }

  test("guard does not disturb mixed corpora: distinct docs stay unpaired") {
    val filler = (0 until 60).map(i =>
      (1000L + i, s"unique document number $i talking about topic " +
        s"${i * 37} with its own vocabulary ${i * 13} and nothing shared"))
    val docs = ((0 until 200).map(i => (i.toLong, template)) ++ filler)
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
      threshold = 0.5, maxBandDf = 50)
    val ids = pairs.select(explode(array(col("id_a"), col("id_b"))))
      .distinct().as[Long].collect().toSet
    // every template copy joins the star; no filler doc is dragged in
    assert(ids == (0L until 200L).toSet)
    Caches.releaseResult(pairs)
  }
}
