package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** N-gram novelty ([[Dedup.gramNovelty]]): first-seen attribution by
  * doc id, exact-duplicate zero-novelty, integer ppm arithmetic, and
  * partition invariance.
  */
class GramNoveltySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha bravo charlie delta echo"),
    (2L, "alpha bravo charlie delta echo"),      // exact copy of 1
    (3L, "foxtrot golf hotel india juliet"),     // all new
    (4L, "charlie delta echo foxtrot golf hotel") // straddles 1 and 3
  ).toDF("doc_id", "text")

  test("first doc owns its grams; exact copy scores zero novelty") {
    val r = Dedup.gramNovelty(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_novel", "novelty_ppm")
      .as[(Long, Long, Long, Long)].collect()
    val byId = r.map(x => x._1 -> x).toMap
    assert(byId(1L) == ((1L, 3L, 3L, 1000000L)))
    assert(byId(2L) == ((2L, 3L, 0L, 0L)))
    assert(byId(3L) == ((3L, 3L, 3L, 1000000L)))
    // doc 4's trigrams: "charlie delta echo" (seen in 1),
    // "delta echo foxtrot" (new), "echo foxtrot golf" (new),
    // "foxtrot golf hotel" (seen in 3)
    assert(byId(4L) == ((4L, 4L, 2L, 500000L)))
  }

  test("short docs (< n words) are absent; partition invariance") {
    val withShort = docs.unionByName(
      Seq((5L, "two words")).toDF("doc_id", "text"))
    val a = Dedup.gramNovelty(withShort, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a.size == 4 && !a.exists(_.getLong(0) == 5L))
    val b = Dedup.gramNovelty(withShort.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
