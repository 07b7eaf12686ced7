package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAnalytics
import graft.streaming.StreamingAnalytics._

/** The analytics family's streaming twins must equal the BATCH DRIVER
  * QUERIES row-for-row: the fixture is written as a real events.parquet,
  * the batch side runs the actual SparkEntry queries on it, and the
  * stream side replays the same rows split across micro-batches
  * (per-key event-time order across batches — the documented
  * StreamingEwma arrival contract). */
class StreamingAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Deterministic mixed-depth fixture: 30 users × 3 days × up to 5
    * events, covering full funnels, view-only days, click-before-view
    * (must NOT count), same-timestamp view+click (strict > must reject),
    * and multi-week activity for retention. */
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    val day = 86400000000L
    val rows = for {
      u <- 1L to 30L
      k <- 0L until (u % 5 + 1)
    } yield {
      val d = (u + k) % 21 // spread over 3 weeks for retention
      val ts = base + d * day + k * 600000000L + (u % 7) * 1000000L
      val etype = (u + k) % 5 match {
        case 0 => "view"
        case 1 => "click"
        case 2 => "purchase"
        case 3 => "view"
        case _ => "other"
      }
      (u * 100 + k, ts, u, etype, (u * 7 + k).toDouble % 500, s"p$u")
    }
    // same-ts view+click pair: click at exactly t_view must not qualify
    // + PRE-ANCHOR events (negative retention weeks — the cohort-seed
    // sentinel regression the r11 review caught: a `< 0` unset check
    // re-seeded the cohort on every event)
    val edge = Seq(
      (9001L, base + 1000000L, 77L, "view", 1.0, "e"),
      (9002L, base + 1000000L, 77L, "click", 2.0, "e"),
      (9003L, base + 2000000L, 77L, "click", 3.0, "e"),
      (9004L, base + 3000000L, 77L, "purchase", 4.0, "e"),
      (9005L, base - 16L * day, 88L, "view", 5.0, "e"), // week -3
      (9006L, base - 9L * day, 88L, "click", 6.0, "e"), // week -2
      (9007L, base + 8L * day, 88L, "view", 7.0, "e"), // week +1
      (9008L, base - 2L * day, 89L, "view", 8.0, "e")) // week -1 only
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stream-analytics").toString
    (rows ++ edge).toDF("event_id", "ts", "user_id", "event_type",
        "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** All fixture events in global event-time order, as raw tuples. */
  private lazy val ordered: Seq[(Long, Long, Long, String)] = {
    import spark.implicits._
    Tables.events(spark, fixtureDir)
      .select(col("event_id"), unix_micros(col("ts")).as("tsu"),
        col("user_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .sortBy(t => (t._2, t._1)).toSeq
  }

  /** Split into 3 micro-batches along event time: per-key order is
    * preserved across batches (the arrival contract). */
  private def batches[T](xs: Seq[T]): Seq[Seq[T]] = {
    val n = xs.length
    Seq(xs.take(n / 3), xs.slice(n / 3, 2 * n / 3), xs.drop(2 * n / 3))
  }

  private def runAppendStream[I: org.apache.spark.sql.Encoder, O](
      name: String, wire: org.apache.spark.sql.Dataset[I] => DataFrame,
      feed: Seq[Seq[I]]): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[I]
    val q = wire(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      feed.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
  }

  test("funnel stream final states reproduce q_funnel exactly") {
    import spark.implicits._
    val evts = ordered.map { case (id, tsu, u, et) =>
      FunnelEvt(u, java.time.Instant.ofEpochSecond(tsu / 1000000L)
        .toString.take(10), et, tsu, id)
    }
    val out = runAppendStream("funnel_stream",
      (ds: org.apache.spark.sql.Dataset[FunnelEvt]) =>
        StreamingAnalytics.funnelStream(ds).toDF(), batches(evts))
    // final snapshot per key = max nDefined (monotone growth)
    val fin = out.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user", "day").orderBy(col("nDefined").desc)))
      .where(col("rk") === 1)
    val unset = Long.MinValue
    val streamed = fin.groupBy("day")
      .agg(count(lit(1)).as("n_user_days"),
        count(when(col("tView") =!= unset, 1)).as("n_view"),
        count(when(col("tClick") =!= unset, 1)).as("n_view_click"),
        count(when(col("tPurchase") =!= unset, 1))
          .as("n_view_click_purchase"))
      .orderBy("day")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val batch = SparkEntry.queries("q_funnel")(spark, fixtureDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batch)
    // the same-ts edge user converted via the LATER click only
    val u77 = fin.where(col("user") === 77).collect().head
    assert(u77.getAs[Long]("tClick") > u77.getAs[Long]("tView"))
  }

  test("retention stream cells reproduce q_retention exactly") {
    import spark.implicits._
    val anchor = java.time.LocalDate.parse("2024-01-01")
    val evts = ordered.map { case (id, tsu, u, _) =>
      val d = java.time.Instant.ofEpochSecond(tsu / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      val week = math.floorDiv(
        java.time.temporal.ChronoUnit.DAYS.between(anchor, d), 7L)
      WeekEvt(u, week, id)
    }
    val out = runAppendStream("retention_stream",
      (ds: org.apache.spark.sql.Dataset[WeekEvt]) =>
        StreamingAnalytics.retentionStream(ds).toDF(), batches(evts))
    val streamed = out.groupBy(col("cohortWeek").as("cohort_week"),
        col("weekOffset").as("week_offset"))
      .agg(countDistinct(col("user")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    val batch = SparkEntry.queries("q_retention")(spark, fixtureDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed == batch)
    // the pre-anchor users produced NEGATIVE cohorts and they match
    assert(batch.exists(_._1 < 0), "fixture lost its pre-anchor cohorts")
  }

  test("markov stream transitions reproduce q_markov exactly") {
    import spark.implicits._
    val evts = ordered.map { case (id, tsu, u, et) =>
      SeqEvt(u, tsu, id, et)
    }
    val out = runAppendStream("markov_stream",
      (ds: org.apache.spark.sql.Dataset[SeqEvt]) =>
        StreamingAnalytics.markovStream(ds).toDF(), batches(evts))
    // (joining the memory view to an aggregate of itself trips the
    // ambiguous-self-join check — normalize locally, the counts are tiny)
    val trRows = out.groupBy("prev", "cur").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSeq
    val rowN = trRows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val streamed = trRows
      .map { case (p, c, n) => (p, c, n, n * 1000000L / rowN(p)) }
      .sortBy(t => (t._1, t._2))
    val batch = SparkEntry.queries("q_markov")(spark, fixtureDir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(streamed == batch)
  }

  test("psi/ks sufficient-statistic streams snapshot to the batch " +
      "count tables bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same derivations as the batch queries
    val e = Tables.events(spark, fixtureDir).select(col("event_type"),
      least(lit(9L), greatest(lit(0L),
        floor(col("value") / 50).cast("long"))).as("bk"),
      floor(col("value") * 1000).cast("long").as("x_milli"),
      when(to_date(col("ts")) <= lit("2024-01-15"), 1L).otherwise(0L)
        .as("is_a"))
    val rows = e.as[(String, Long, Long, Long)].collect().toSeq
    val input = MemoryStream[(String, Long, Long, Long)]
    val counts = StreamingAnalytics.psiCounts(
      input.toDS().toDF("event_type", "bk", "x_milli", "is_a"))
    val q = counts.writeStream.format("memory").queryName("psi_stream")
      .outputMode("complete").start()
    val q2 = StreamingAnalytics.ksCounts(
        input.toDS().toDF("event_type", "bk", "x_milli", "is_a"))
      .writeStream.format("memory").queryName("ks_stream")
      .outputMode("complete").start()
    try {
      batches(rows).foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        q.processAllAvailable(); q2.processAllAvailable()
      }
    } finally { q.stop(); q2.stop() }
    def canon(df: DataFrame, key: String): Seq[(String, Long, Long, Long)] =
      df.select(col("event_type"), col(key), col("ca").cast("long"),
          col("cb").cast("long"))
        .as[(String, Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
        .toSeq
    val psiBatch = e.groupBy("event_type", "bk")
      .agg(sum("is_a").as("ca"), sum(expr("1 - is_a")).as("cb"))
    val ksBatch = e.groupBy("event_type", "x_milli")
      .agg(sum("is_a").as("ca"), sum(expr("1 - is_a")).as("cb"))
    assert(canon(spark.table("psi_stream"), "bk") == canon(psiBatch, "bk"))
    assert(canon(spark.table("ks_stream"), "x_milli") ==
      canon(ksBatch, "x_milli"))
    // the drift stats are deterministic expressions OVER these tables
    // (q_psi_drift's grid + nano-ln; q_ks_drift's integer cross-
    // multiplication), so count equality implies stat equality
  }

  test("GRPO group-stat stream: advantages computed off the snapshot " +
      "equal DataPrep.groupAdvantages across interleaved micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // rollouts: 12 groups x variable sample counts, incl. a singleton
    // and a zero-variance group
    val rows = (for {
      g <- 1L to 12L
      i <- 0L until (g % 5 + 1)
    } yield (g * 100 + i, s"g$g",
      if (g == 4L) 7L else (g * 13 + i * i * 5) % 97)).toSeq
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamingAnalytics.grpoStats(
        input.toDS().toDF("id", "grp", "x"))
      .writeStream.format("memory").queryName("grpo_stream")
      .outputMode("complete").start()
    try {
      batches(rows).foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // the closed form over the snapshot — identical arithmetic to the
    // batch operator's window projection
    val scored = rows.toDF("id", "grp", "x")
    val viaStream = scored
      .join(spark.table("grpo_stream"), Seq("grp"))
      .select(col("id"),
        when(col("n") * col("s2") === col("s1") * col("s1"), 0L)
          .otherwise(floor(
            (col("n") * col("x") - col("s1")).cast("double") * 1e6 /
              sqrt((col("n") * col("s2") - col("s1") * col("s1"))
                .cast("double"))).cast("long")).as("adv_q"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val viaBatch = graft.operators.DataPrep
      .groupAdvantages(scored, "id", "grp", "x")
      .select(col("id"), col("adv_q"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaStream == viaBatch)
  }

  test("ranking hit-table stream: rankingMetrics over the snapshot " +
      "equals the batch metrics over the full result stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 4 queries x ranked candidates, with a duplicate (query, id) at a
    // worse rank split across batches (best-rank dedup must span
    // batches) and an out-of-window rank that must be filtered
    val results = Seq(
      (1L, "a", 1), (1L, "x", 2), (1L, "b", 3), (1L, "b", 7),
      (2L, "m", 1), (2L, "n", 2),
      (3L, "p", 1), (3L, "q", 2), (3L, "p", 9),
      (4L, "z", 12)) // rank > k: outside the @k window
    val truth = Seq((1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "zz"), (3L, "p"), (3L, "q"), (4L, "z"))
      .toDF("query_id", "id")
    val input = MemoryStream[(Long, String, Int)]
    val q = StreamingAnalytics.rankingHits(
        input.toDS().toDF("query_id", "id", "rank"), truth, k = 10)
      .writeStream.format("memory").queryName("rank_stream")
      .outputMode("complete").start()
    try {
      batches(results).foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    def canon(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    val viaStream = graft.operators.Relevance.rankingMetrics(
      spark.table("rank_stream"), truth, "query_id", "id", "rank",
      k = 10)
    val viaBatch = graft.operators.Relevance.rankingMetrics(
      results.toDF("query_id", "id", "rank"), truth,
      "query_id", "id", "rank", k = 10)
    assert(canon(viaStream) == canon(viaBatch))
    // the cross-batch dedup really happened: one state row for (1, b)
    assert(spark.table("rank_stream")
      .where(col("query_id") === 1 && col("id") === "b")
      .collect().map(_.getAs[Int]("rank")).toSeq == Seq(3))
  }
}
