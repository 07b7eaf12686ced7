package graft

import java.sql.Timestamp

import graft.operators.IntervalJoin
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed big-big range join equals the naive range join") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val t0 = 1722297600L
    val events = (1 to 3000).map { i =>
      (s"k${rnd.nextInt(10)}", new Timestamp((t0 + rnd.nextInt(400000)) * 1000L), i)
    }.toDF("k", "ts", "event_id")
    val intervals = (1 to 300).map { i =>
      val s = t0 + rnd.nextInt(400000)
      // interval lengths straddling the bucket grain (some > 1h, some < 1h)
      (s"k${rnd.nextInt(10)}", new Timestamp(s * 1000L),
        new Timestamp((s + 600 + rnd.nextInt(7200)) * 1000L), i)
    }.toDF("k", "start_t", "end_t", "iv_id")

    val naive = events.join(intervals,
      events("k") === intervals("k") &&
        events("ts") >= intervals("start_t") &&
        events("ts") <= intervals("end_t"))
      .select("event_id", "iv_id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet

    val bucketed = IntervalJoin.joinEventsToIntervals(
        events, intervals, "k", "ts", "start_t", "end_t",
        grainSeconds = 3600)
      .select("event_id", "iv_id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet

    assert(naive.nonEmpty)
    assert(bucketed == naive,
      s"missing=${(naive -- bucketed).take(5)} extra=${(bucketed -- naive).take(5)}")
  }

  test("labelByIntervals: overlap precedence and boundary inclusivity") {
    import spark.implicits._
    val ev = Seq(
      ("k1", ts(100), 1), // inside load only
      ("k1", ts(250), 2), // inside dump only (load ended at 200)
      ("k1", ts(350), 3), // inside dump only
      ("k1", ts(200), 4), // load end boundary (inclusive) + dump overlap -> load wins
      ("k1", ts(999), 5), // outside
      ("k2", ts(100), 6)  // other key, no intervals
    ).toDF("k", "t", "event_id")
    val iv = Seq(
      ("k1", ts(50), ts(200), "load_event"),
      ("k1", ts(150), ts(400), "dump_event"))
      .toDF("k", "s", "e", "lbl")
    val out = IntervalJoin.labelByIntervals(ev, iv, "k", "t", "s", "e",
        "lbl", Seq("load_event", "dump_event"))
      .orderBy("event_id")
      .collect().map(_.getAs[String]("ml_event_label")).toSeq
    assert(out == Seq("load_event", "dump_event", "dump_event",
      "load_event", "background", "background"))
  }

  private def ts(s: Long) = new Timestamp(1722297600000L + s * 1000L)

  test("asofJoin: latest prior payload, equal-ts match, null before first") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq((1L, "a", 5L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 7L)).toDF("id", "k", "ts")
    val right = Seq(("a", 10L, "s10"), ("a", 15L, "s15"), ("b", 99L, "s99"))
      .toDF("k", "sts", "state")
    val out = graft.operators.IntervalJoin
      .asofJoin(left, right, "k", "ts", "sts", Seq("state"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("state")))
      .toMap
    assert(out(1L).isEmpty)          // before first state
    assert(out(2L).contains("s10"))  // equal timestamp matches
    assert(out(3L).contains("s15"))  // latest prior, not first
    assert(out(4L).isEmpty)          // other key's states invisible
  }

  test("asofJoin: null payload VALUES carry (latest row wins, no tearing)") {
    import spark.implicits._
    val left = Seq((1L, "a", 20L)).toDF("id", "k", "ts")
    // latest prior right row has a null second payload column — DuckDB
    // ASOF attaches THAT row (a=9, b=null), never a torn (a=9, b=3)
    val right = Seq(("a", 5L, Some(2), Some(3)), ("a", 10L, Some(9), None))
      .toDF("k", "sts", "a", "b")
    val row = graft.operators.IntervalJoin
      .asofJoin(left, right, "k", "ts", "sts", Seq("a", "b"))
      .collect().head
    assert(row.getInt(row.fieldIndex("a")) == 9)
    assert(row.isNullAt(row.fieldIndex("b")), s"torn row: $row")
  }
}
