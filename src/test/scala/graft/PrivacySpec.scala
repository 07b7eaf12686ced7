package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity / l-diversity: group verdicts on a hand-built fixture,
  * row-level cell suppression semantics (row count preserved, QI cells
  * NULLed only in small groups), and NULL handling. */
class PrivacySpec extends AnyFunSuite {
  import SparkTestSession._

  // (zip, age_band, diagnosis): one group of 3, one of 2, one of 1;
  // the 3-group has only ONE distinct sensitive value (l-div fails)
  private lazy val fixture = {
    import spark.implicits._
    Seq(
      ("94110", "30s", "flu"), ("94110", "30s", "flu"),
      ("94110", "30s", "flu"),
      ("94117", "40s", "flu"), ("94117", "40s", "cold"),
      ("94121", "50s", "rare")
    ).toDF("zip", "age_band", "diag")
  }

  test("group stats: n, l_div, and the k>=2 AND l>=2 verdict") {
    val got = Privacy.kAnonymityStats(fixture, Seq("zip", "age_band"),
        "diag", k = 2L, l = 2L)
      .orderBy("zip")
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toSeq
    assert(got == Seq(
      ("94110", 3L, 1L, false), // big enough but sensitive is constant
      ("94117", 2L, 2L, true),
      ("94121", 1L, 1L, false)))
  }

  test("row-level suppression NULLs QI cells in small groups only; " +
      "row count and non-QI columns are preserved") {
    val got = Privacy.kAnonymize(fixture, Seq("zip", "age_band"), k = 3L)
    assert(got.count() == 6)
    assert(got.where(col("suppressed")).count() == 3)
    // suppressed rows: QI cells gone, sensitive column intact
    val s = got.where(col("suppressed"))
      .select("zip", "age_band", "diag").collect()
    assert(s.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(s.map(_.getString(2)).sorted.toSeq ==
      Seq("cold", "flu", "rare"))
    // kept rows unchanged
    val k = got.where(!col("suppressed")).select("zip").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(k == Seq("94110"))
  }

  test("NULL quasi-identifier values form their own group (not a " +
      "silent merge with every row)") {
    import spark.implicits._
    val df = Seq((Option.empty[String], "a"), (None, "b"),
      (Some("x"), "c")).toDF("qi", "v")
    val got = Privacy.kAnonymityStats(df, Seq("qi"), "v", k = 2L)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
      .toMap
    assert(got == Map(None -> 2L, Some("x") -> 1L))
  }
}
