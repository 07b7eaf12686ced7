package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** Content-defined chunking ([[Cdc]]): structural chunk invariants,
  * the shift-robustness property that motivates CDC over fixed-size
  * blocks, and partition invariance.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic pseudo-random printable text (no Random: repeatable
    * and seed-stable across JVMs). */
  private def synth(seed: Long, n: Int): String = {
    val sb = new StringBuilder
    var x = seed
    (0 until n).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append((' ' + ((x >>> 33) % 95).toInt).toChar)
    }
    sb.toString
  }

  test("chunks are contiguous, 1-based, and cover the doc exactly") {
    val docs = Seq((1L, synth(7, 2000)), (2L, synth(9, 500)))
      .toDF("doc_id", "text")
    val ch = Cdc.chunks(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start", "len")
      .as[(Long, Int, Int, Int)].collect()
    assert(ch.count(_._1 == 1L) > 5, "expected several chunks at n=2000")
    ch.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 1)
      sorted.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) => assert(s2 == s1 + l1)
        case _ => ()
      }
      val totalLen = sorted.map(_._4).sum
      val docLen = if (id == 1L) 2000 else 500
      assert(totalLen == docLen, s"doc $id covers $totalLen != $docLen")
    }
  }

  test("short doc (< window) and empty doc edge cases") {
    val docs = Seq((1L, "tiny"), (2L, "")).toDF("doc_id", "text")
    val ch = Cdc.chunks(docs, "doc_id", "text")
      .select("doc_id", "start", "len").as[(Long, Int, Int)].collect()
    assert(ch.toSeq == Seq((1L, 1, 4))) // single whole-doc chunk; empty dropped
  }

  test("prefix edit shifts content but preserves downstream chunk hashes") {
    val base = synth(42, 3000)
    val docs = Seq((1L, base), (2L, "inserted-prefix " + base))
      .toDF("doc_id", "text")
    val hs = Cdc.chunks(docs, "doc_id", "text")
      .select("doc_id", "chunk_hash").as[(Long, String)].collect()
    val h1 = hs.filter(_._1 == 1L).map(_._2).toSet
    val h2 = hs.filter(_._1 == 2L).map(_._2).toSet
    assert(h1.size > 10)
    val shared = (h1 intersect h2).size
    // only chunks at/before the edit point may differ; everything after
    // the first content-defined boundary past the edit re-aligns
    assert(shared >= h1.size - 2,
      s"CDC shift-robustness broken: only $shared of ${h1.size} shared")
    // a FIXED-size blocking at the same average grain shares ~nothing:
    // document the contrast that justifies the operator
    val fixed1 = base.grouped(64).map(s => s.hashCode).toSet
    val fixed2 = ("inserted-prefix " + base).grouped(64).map(_.hashCode).toSet
    assert((fixed1 intersect fixed2).size <= 2)
  }

  test("chunkStats rollup: len sum equals doc length; sharing detected") {
    val a = synth(1, 1500)
    val docs = Seq((1L, a), (2L, a), (3L, synth(2, 1500)))
      .toDF("doc_id", "text")
    val st = Cdc.chunkStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "chunk_len_sum", "n_shared_chunks")
      .as[(Long, Long, Long, Long)].collect()
    assert(st.forall(_._3 == 1500L))
    val byId = st.map(r => r._1 -> r).toMap
    // identical docs share every chunk; the independent doc shares none
    assert(byId(1L)._4 == byId(1L)._2 && byId(2L)._4 == byId(2L)._2)
    assert(byId(3L)._4 == 0L)
  }

  test("partition invariance") {
    val docs = (1L to 40L).map(i => (i, synth(i, 800))).toDF("doc_id", "text")
    val a = Cdc.chunkStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Cdc.chunkStats(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
