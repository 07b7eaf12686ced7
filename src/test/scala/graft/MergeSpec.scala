package graft

import graft.operators.TelemetryTransform
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def frames = {
    import spark.implicits._
    val target = Seq(
      (1L, Option("a"), "old"),
      (2L, Option("b"), "old"),
      (3L, Option("c"), "old")
    ).toDF("k", "payload", "src")
    val source = Seq(
      (2L, None: Option[String], "new"),  // matched update with NULL col
      (3L, Option("x"), "new"),           // matched, delete-flagged below
      (4L, Option("d"), "new"),           // unmatched insert
      (5L, Option("e"), "new")            // unmatched tombstone → no-op
    ).toDF("k", "payload", "src")
    (target, source)
  }

  test("merge: update/delete/insert and CDC tombstone no-op") {
    val (target, source) = frames
    val out = TelemetryTransform
      .merge(target, source, "k", deleteWhen = col("k").isin(3L, 5L))
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    val srcByK = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(srcByK == Map(1L -> "old", 2L -> "new", 4L -> "new"))
  }

  test("merge: a NULL-keyed source row inserts, never an all-NULL row") {
    import spark.implicits._
    val target = Seq((1L, Option("a"), "old")).toDF("k", "payload", "src")
    val source = Seq((Option.empty[Long], Option("n"), "new"))
      .toDF("k", "payload", "src")
    val out = TelemetryTransform
      .merge(target, source, "k", deleteWhen = lit(false))
      .collect()
    assert(out.length == 2)
    val nullKeyed = out.filter(_.isNullAt(0))
    assert(nullKeyed.length == 1 && nullKeyed(0).getString(1) == "n",
      s"NULL-keyed source row must insert intact, got ${out.toSeq}")
  }

  test("merge: enforceUniqueSourceKeys fails on a duplicated source key") {
    import spark.implicits._
    val target = Seq((1L, Option("a"), "old")).toDF("k", "payload", "src")
    val source = Seq(
      (Option(1L), Option("x"), "new"),
      (Option(1L), Option("y"), "new"),
      (Option.empty[Long], Option("n"), "new") // NULL keys exempt
    ).toDF("k", "payload", "src")
    val ex = intercept[Exception] {
      TelemetryTransform.merge(target, source, "k",
        deleteWhen = lit(false), enforceUniqueSourceKeys = true)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("duplicate source key")),
      s"expected the uniqueness guard to fire, got $ex")
  }

  test("merge: enforceUniqueSourceKeys passes unique + NULL-keyed sources") {
    import spark.implicits._
    val target = Seq((1L, Option("a"), "old")).toDF("k", "payload", "src")
    val source = Seq(
      (Option(1L), Option("x"), "new"),
      (Option.empty[Long], Option("n"), "new"),
      (Option.empty[Long], Option("m"), "new") // two NULL keys: both insert
    ).toDF("k", "payload", "src")
    val out = TelemetryTransform.merge(target, source, "k",
      deleteWhen = lit(false), enforceUniqueSourceKeys = true)
      .collect()
    assert(out.length == 3, s"expected 3 rows, got ${out.toSeq}")
  }

  test("merge: a NULL source column wins over the stale target value") {
    val (target, source) = frames
    val out = TelemetryTransform
      .merge(target, source, "k", deleteWhen = lit(false))
      .where(col("k") === 2L).collect()
    assert(out.length == 1)
    // per-column coalesce would resurrect "b"; source-key presence must win
    assert(out(0).isNullAt(1), s"expected NULL payload, got ${out(0)}")
  }
}
