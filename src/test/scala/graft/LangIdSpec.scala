package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LangId

/** Rank-profile language ID ([[LangId.rankProfileLid]]): on a fixture
  * whose "languages" have genuinely distinct character distributions
  * the classifier must recover the label on held-out docs (the shared
  * word-soup corpus in the driver gate exercises only the arithmetic;
  * this spec proves the discrimination).
  */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic word soup from a per-language alphabet. */
  private def doc(seed: Long, alphabet: String, words: Int): String = {
    var x = seed
    def next(n: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % n).toInt
    }
    (0 until words).map { _ =>
      (0 until (3 + next(4))).map(_ => alphabet(next(alphabet.length)))
        .mkString
    }.mkString(" ")
  }

  private lazy val fixture = {
    // small disjoint alphabets + long docs so per-trigram counts are
    // well above 1 and the top-20 rank reflects frequency, not
    // lexicographic tie-breaks (a 12-letter alphabet at 60 words left
    // top-20 dominated by count-1 ties and all-miss 400/400 draws)
    val aa = "abcdef"   // "lang" aa
    val bb = "uvwxyz"   // "lang" bb — disjoint alphabet
    ((1L to 40L).map(i => (i, doc(i, aa, 120), "aa")) ++
      (41L to 80L).map(i => (i, doc(i, bb, 120), "bb")))
      .toDF("doc_id", "text", "lang")
  }

  test("held-out docs classified correctly on a separable fixture") {
    // train on even ids only; every doc (train + held-out) is scored
    val out = LangId.rankProfileLid(fixture, "doc_id", "text", "lang",
        col("doc_id") % 2 === 0, topN = 20)
      .join(fixture.select("doc_id", "lang"), "doc_id")
    assert(out.count() == 80)
    assert(out.where(col("pred_lang") =!= col("lang")).count() == 0)
  }

  test("out-of-place distance: total miss costs topN per trigram") {
    // a doc whose trigrams appear in NO profile scores
    // n_top_trigrams * topN against every language; tie -> first lang
    val fx = fixture.unionByName(
      Seq((999L, "zz0 zz1 zz2 zz3 zz4 zz5 zz6 zz7", "aa"))
        .toDF("doc_id", "text", "lang"))
    val r = LangId.rankProfileLid(fx, "doc_id", "text", "lang",
        col("doc_id") % 2 === 0, topN = 20)
      .where(col("doc_id") === 999L)
      .select("pred_lang", "dist").as[(String, Long)].head()
    val nTris = Seq(Tuple1("zz0 zz1 zz2 zz3 zz4 zz5 zz6 zz7")).toDF("t")
      .select(explode(transform(sequence(lit(1), length(col("t")) - 2),
        p => col("t").substr(p, lit(3)))).as("tri"))
      .distinct().count().min(20L)
    assert(r == (("aa", nTris * 20)))
  }

  test("partition invariance") {
    val a = LangId.rankProfileLid(fixture, "doc_id", "text", "lang",
      col("doc_id") % 2 === 0).orderBy("doc_id").collect().toSeq
    val b = LangId.rankProfileLid(fixture.repartition(17), "doc_id",
      "text", "lang", col("doc_id") % 2 === 0)
      .orderBy("doc_id").collect().toSeq
    assert(a == b && a.size == 80)
  }
}
