package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** STEP 3 EDA aggregation pack (SURVEY §2.4 A2/A3/A7/A8): describe-style
  * multi-aggregates, crosstab pivots, binning, per-day distributions, and
  * ordered array collection — each with a DuckDB oracle.
  */
object EdaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A2: per-day row distribution (the transform batch planner's
    // GROUP BY DATE, 02_raw_telemetry_transform.py:206-259) ----
    "q_daily_counts" -> ((s, d) => {
      events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("day")
    }),

    // ---- ordered-funnel analysis (beyond ref — the product-analytics
    // staple): per (user, day), view → first click AFTER the first
    // view → first purchase AFTER that click; per-day conversion
    // counts. The min-chain runs as three conditional aggregations
    // with join-backs on the (user, day) grain — each stage's frame is
    // user×day-sized (AQE broadcasts it), and ORDER lives in the
    // ts predicates, not in any window ----
    "q_funnel" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("ts"))
      val g1 = e.groupBy("user_id", "day")
        .agg(min(when(col("event_type") === "view", col("ts")))
          .as("t_view"))
      val g2 = e.join(g1, Seq("user_id", "day"))
        .where(col("event_type") === "click" && col("ts") > col("t_view"))
        .groupBy("user_id", "day").agg(min("ts").as("t_click"))
      val g3 = e.join(g2, Seq("user_id", "day"))
        .where(col("event_type") === "purchase" &&
          col("ts") > col("t_click"))
        .groupBy("user_id", "day").agg(min("ts").as("t_purchase"))
      g1.join(g2, Seq("user_id", "day"), "left")
        .join(g3, Seq("user_id", "day"), "left")
        .groupBy("day")
        .agg(count(lit(1)).as("n_user_days"),
          count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_view_click"),
          count(col("t_purchase")).as("n_view_click_purchase"))
        .orderBy("day")
    }),

    // ---- weekly retention cohorts (beyond ref): cohort = a user's
    // first active week, cell (cohort_week, week_offset) = distinct
    // users still active k weeks later. Two keyed aggs + one join on
    // the (user, week) distinct frame — no window, no self-join.
    // Week bucketing is FLOOR division on both engines (the oracle
    // floors explicitly — DuckDB's `//` truncates toward zero, which
    // would diverge for pre-anchor timestamps) ----
    "q_retention" -> ((s, d) => {
      val wk = events(s, d).select(col("user_id"),
          floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7.0)
            .cast("long").as("week"))
        .distinct()
      val cohort = wk.groupBy("user_id").agg(min("week").as("cohort_week"))
      wk.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // ---- event-sequence Markov transitions (beyond ref): per-user
    // lag over (ts, event_id) order → (prev, cur) counts → row-
    // normalized transition probabilities as exact integer ppm. ONE
    // user-keyed window shuffle; the matrix is |types|² rows ----
    "q_markov" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val tr = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("cur"))
        .withColumn("prev", lag(col("cur"), 1).over(w))
        .where(col("prev").isNotNull)
        .groupBy("prev", "cur").agg(count(lit(1)).as("n"))
      val tot = tr.groupBy("prev").agg(sum("n").as("row_n"))
      tr.join(tot, Seq("prev"))
        .select(col("prev"), col("cur"), col("n").cast("long").as("n"),
          expr("n * 1000000 div row_n").as("p_ppm"))
        .orderBy("prev", "cur")
    }),

    // ---- mergeable histogram quantiles (beyond ref — the 100 TB
    // sibling of q_percentiles' exact interpolation): per event type,
    // nearest-rank p50/p90/p99 off a milli-quantized histogram whose
    // state is the grid size, not the row count, and whose frames
    // merge across shards by addition. Integer-exact end to end; the
    // oracle replays histogram → cumulative window → ceil-rank pick ----
    "q_hist_quantiles" -> ((s, d) => {
      import graft.operators.Quantiles
      Quantiles.histogramQuantiles(events(s, d), Seq("event_type"),
          col("value"), scale = 1000L,
          quantiles = Seq(("p50_milli", 1L, 2L), ("p90_milli", 9L, 10L),
            ("p99_milli", 99L, 100L)))
        .orderBy("event_type")
    }),

    // ---- two-sample Kolmogorov–Smirnov drift statistic per event
    // type (beyond ref — the data-drift monitor a production pipeline
    // runs between snapshots): sample A = days 1–15, B = days 16–30;
    // D = max_x |F_A(x) − F_B(x)| computed EXACTLY by integer
    // cross-multiplication (|c_A·n_B − c_B·n_A|) over milli-quantized
    // values — no floats anywhere, so the oracle replays it bit-for-
    // bit. One (type, x) agg + one type-keyed cumulative window ----
    "q_ks_drift" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, d).select(col("event_type"),
        floor(col("value") * 1000).cast("long").as("x"),
        when(to_date(col("ts")) <= lit("2024-01-15"), 1L).otherwise(0L)
          .as("is_a"))
      val pts = e.groupBy("event_type", "x")
        .agg(sum("is_a").as("ca_pt"),
          sum(lit(1L) - col("is_a")).as("cb_pt"))
      val w = Window.partitionBy("event_type").orderBy("x")
      val tot = pts.groupBy("event_type")
        .agg(sum("ca_pt").as("n_a"), sum("cb_pt").as("n_b"))
      // ks_ppm is the max of PER-SIDE-quantized CDF gaps
      // (|cumA·10⁶ div n_a − cumB·10⁶ div n_b|): overflow-safe to
      // ~9·10¹² rows per sample, where d_num_max·10⁶ would wrap a
      // long already at n_a·n_b > 9·10¹² (review finding r10);
      // d_num_max itself stays the exact cross-multiplied statistic
      // (bound n_a·n_b < 2⁶³, documented)
      pts.join(tot, Seq("event_type"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          (abs(sum(col("ca_pt")).over(w) * col("n_b") -
            sum(col("cb_pt")).over(w) * col("n_a"))).as("d_num"),
          abs(expr("1000000 * sum(ca_pt) over " +
              "(partition by event_type order by x) div n_a") -
            expr("1000000 * sum(cb_pt) over " +
              "(partition by event_type order by x) div n_b"))
            .as("gap_ppm"))
        .groupBy("event_type")
        .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
          max("d_num").as("d_num_max"),
          max("gap_ppm").cast("long").as("ks_ppm"))
        .orderBy("event_type")
    }),

    // ---- population stability index (the banking/industry drift
    // score beside q_ks_drift's KS): 10 fixed-width value buckets,
    // Laplace-smoothed, PSI = Σ (p_A − p_B)·ln(p_A/p_B). Per-bucket
    // terms are floor-quantized to nanos THEN summed (the kn-logprob
    // quantize-then-sum discipline: integer sums commute, float sums
    // don't), and the ln argument is ONE ratio of integer products so
    // both engines evaluate the identical expression tree ----
    "q_psi_drift" -> ((s, d) => {
      val e = events(s, d).select(col("event_type"),
        least(lit(9L), greatest(lit(0L),
          floor(col("value") / 50).cast("long"))).as("bk"),
        when(to_date(col("ts")) <= lit("2024-01-15"), 1L).otherwise(0L)
          .as("is_a"))
      val g = e.groupBy("event_type", "bk")
        .agg(sum("is_a").as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
      val tot = g.groupBy("event_type")
        .agg(sum("ca").as("na"), sum("cb").as("nb"))
      // full 10-bucket grid per type: a globally-empty bucket must
      // still contribute its smoothed baseline term, or PSI deviates
      // from its own definition and jumps discontinuously across SFs
      // the moment one event lands in the bucket (review finding r10)
      val grid = tot.select(col("event_type"), col("na"), col("nb"),
          explode(sequence(lit(0L), lit(9L))).as("bk"))
        .join(g, Seq("event_type", "bk"), "left")
        .select(col("event_type"), col("na"), col("nb"),
          coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
      grid
        .select(col("event_type"),
          floor((((col("ca") + 1).cast("double") / (col("na") + 10) -
            (col("cb") + 1).cast("double") / (col("nb") + 10)) *
            log(((col("ca") + 1).cast("double") * (col("nb") + 10)) /
              ((col("cb") + 1).cast("double") * (col("na") + 10)))) *
            lit(1000000000.0)).cast("long").as("term_nano"))
        .groupBy("event_type")
        .agg(sum("term_nano").cast("long").as("psi_nano"))
        .orderBy("event_type")
    }),

    // ---- A8: describe()-style profile per group (run_advanced_eda
    // .py:83-96) with exact interpolated median ----
    "q_describe" -> ((s, d) => {
      events(s, d)
        .groupBy("event_type")
        .agg(
          count(col("value")).as("cnt"),
          (sum(round(col("value") * 100).cast("long")) / lit(100.0) /
            count(col("value"))).as("mean"),
          round(stddev_samp(col("value")), 4).as("std"),
          round(min(col("value")), 2).as("min"),
          round(percentile(col("value"), lit(0.5)), 4).as("median"),
          round(max(col("value")), 2).as("max"))
        .orderBy("event_type")
    }),

    // ---- A8 crosstab: groupBy().pivot().count() (run_advanced_eda
    // .py:113-114) — pivot columns fixed for schema stability ----
    "q_crosstab" -> ((s, d) => {
      events(s, d)
        .withColumn("bucket",
          when(col("value") < 25, "q1").when(col("value") < 50, "q2")
            .when(col("value") < 75, "q3").otherwise("q4"))
        .groupBy("event_type")
        .pivot("bucket", Seq("q1", "q2", "q3", "q4"))
        .count()
        .na.fill(0, Seq("q1", "q2", "q3", "q4"))
        .orderBy("event_type")
    }),

    // ---- P8/pd.cut-style binning (database_pipeline.py:386-393) ----
    "q_binning" -> ((s, d) => {
      lineitem(s, d)
        .withColumn("qty_bin",
          when(col("l_quantity") <= 10, "0-10")
            .when(col("l_quantity") <= 25, "10-25")
            .when(col("l_quantity") <= 40, "25-40")
            .otherwise("40+"))
        .groupBy("qty_bin")
        .agg(count(lit(1)).as("n"),
          round(avg("l_extendedprice"), 4).as("avg_price"))
        .orderBy("qty_bin")
    }),

    // ---- percentile winsorization (outlier clamping, the robust twin
    // of q_clamp_flags' fixed-sentinel cleaning): per-group p05/p95 on
    // integer cents (exact interpolated percentile — the q_percentiles
    // parity), bounds rounded back to the cent grid so the clamp and
    // the sum stay in exact integer arithmetic on both engines ----
    "q_winsorize" -> ((s, d) => {
      val e = events(s, d).select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val bounds = e.groupBy("event_type").agg(
        round(percentile(col("cents"), lit(0.05))).cast("long").as("lo_c"),
        round(percentile(col("cents"), lit(0.95))).cast("long").as("hi_c"))
      e.join(broadcast(bounds), Seq("event_type"))
        .groupBy("event_type", "lo_c", "hi_c")
        .agg(count(lit(1)).as("n"),
          sum(when(col("cents") < col("lo_c"), 1L).otherwise(0L))
            .as("n_lo"),
          sum(when(col("cents") > col("hi_c"), 1L).otherwise(0L))
            .as("n_hi"),
          sum(greatest(col("lo_c"), least(col("hi_c"), col("cents"))))
            .as("sum_winsor_cents"))
        .select(col("event_type"), col("n"), col("n_lo"), col("n_hi"),
          col("sum_winsor_cents"), col("lo_c"), col("hi_c"))
        .orderBy("event_type")
    }),

    // ---- robust scaling ((x − median) / IQR — sklearn RobustScaler):
    // per-group median/quartiles on integer cents, broadcast back, one
    // narrow per-row projection. Identical integer inputs → identical
    // interpolated quantile doubles → identical scaled doubles on both
    // engines (the q_percentiles parity, applied per row) ----
    "q_robust_scale" -> ((s, d) => {
      val e = events(s, d).select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val stats = e.groupBy("event_type").agg(
        percentile(col("cents"), lit(0.25)).as("p25"),
        percentile(col("cents"), lit(0.5)).as("med"),
        percentile(col("cents"), lit(0.75)).as("p75"))
      e.join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          round(when(col("p75") =!= col("p25"),
            (col("cents") - col("med")) / (col("p75") - col("p25"))), 6)
            .as("scaled"))
        .orderBy("event_id")
    }),

    // ---- pd.qcut-style quantile binning (database_pipeline.py:431-436):
    // equal-count quartiles via ntile over a total order; per-bin stats
    // with engine-exact math (scaled-integer avg, raw min/max) ----
    "q_quantile_bins" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      events(s, d)
        .withColumn("qbin", ntile(4).over(w))
        .groupBy("event_type", "qbin")
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 1000).cast("long")) / 1000.0 /
            count(lit(1))).as("avg_value"),
          min("value").as("min_value"),
          max("value").as("max_value"))
        .orderBy("event_type", "qbin")
    }),

    // ---- A3/P6: truck-class profile via LIKE-pattern CASE class
    // (EDA notebook cells 4/6; database_pipeline.py:121-127): per-class
    // round(avg)/stddev with engine-deterministic math (exact integer
    // sums; see q_json_extract note on avg boundary flakes) ----
    "q_truck_class" -> ((s, d) => {
      val e = events(s, d).withColumn("device_id",
        concat(lit("lake-"),
          when(col("user_id") % 3 === 0, "775g").otherwise("605"),
          lit("-"), (col("user_id") % 20).cast("string")))
      val cents = round(col("value") * 100).cast("long")
      e.withColumn("truck_class",
          when(col("device_id").like("%775g%"), "775G").otherwise("605"))
        .groupBy("truck_class")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("device_id")).as("n_devices"),
          (sum(cents) / lit(100.0) / count(lit(1))).as("avg_value"),
          sqrt(
            (count(lit(1)) * sum(cents * cents) - sum(cents) * sum(cents))
              .cast("double") /
              (count(lit(1)) * (count(lit(1)) - 1)).cast("double"))
            .divide(100.0).as("stddev_value"),
          round(min("value"), 2).as("min_value"),
          round(max("value"), 2).as("max_value"))
        .orderBy("truck_class")
    }),

    // ---- movement features (database_pipeline.py:498-516): per-device
    // euclidean position change via lag diffs + distance from the median
    // center — the EDA geo-math pack ----
    "q_movement" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, d).select(
        col("event_id"),
        concat(lit("t"), (col("user_id") % 20).cast("string")).as("device_id"),
        col("ts"),
        (col("value") / 1000 + 33.2).as("latitude"),
        ((col("user_id") % 100) / 10000.0 - 97.84).as("longitude"))
      val w = Window.partitionBy("device_id").orderBy("ts", "event_id")
      // the 1-row median aggregate stays IN the plan as a broadcast
      // cross-join — no driver collect, no second scan-triggering job
      val center = e.agg(
        percentile(col("longitude"), lit(0.5)).as("clon"),
        percentile(col("latitude"), lit(0.5)).as("clat"))
      e.crossJoin(broadcast(center))
        .withColumn("position_change", round(sqrt(
          pow(col("longitude") - lag("longitude", 1).over(w), 2) +
            pow(col("latitude") - lag("latitude", 1).over(w), 2)), 9))
        .withColumn("distance_from_center", round(sqrt(
          pow(col("longitude") - col("clon"), 2) +
            pow(col("latitude") - col("clat"), 2)), 9))
        .select("event_id", "device_id", "position_change",
          "distance_from_center")
        .orderBy("event_id")
    }),

    // ---- kinematic feature pack (database_pipeline.py:368-394):
    // TRAILING rolling mean/std (pandas min_periods=1 semantics), diff
    // chains (speed change + acceleration), speed-category binning ----
    "q_kinematic" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, d).select(
        col("event_id"),
        concat(lit("t"), (col("user_id") % 20).cast("string")).as("device_id"),
        col("ts"), (col("value") / 10).as("speed"))
      val w = Window.partitionBy("device_id").orderBy("ts", "event_id")
      val t5 = w.rowsBetween(-4, 0)
      val t10 = w.rowsBetween(-9, 0)
      e.withColumn("is_stationary", (col("speed") <= 0.5).cast("int"))
        .withColumn("speed_rolling_mean_5", round(avg("speed").over(t5), 6))
        .withColumn("speed_rolling_std_10",
          round(stddev_samp(col("speed")).over(t10), 6))
        // + 0.0 collapses IEEE negative zero: a diff that is algebraically
        // zero carries float residue that rounds to -0.0 in DuckDB but
        // +0.0 in Spark (observed at sf0.1)
        .withColumn("speed_change", round(
          col("speed") - lag("speed", 1).over(w), 6) + 0.0)
        .withColumn("speed_acceleration", round(
          (col("speed") - lag("speed", 1).over(w)) -
            (lag("speed", 1).over(w) - lag("speed", 2).over(w)), 6) + 0.0)
        .withColumn("speed_category",
          when(col("speed") <= 0.5, "stationary")
            .when(col("speed") <= 5, "slow")
            .when(col("speed") <= 15, "medium").otherwise("fast"))
        .select("event_id", "is_stationary", "speed_rolling_mean_5",
          "speed_rolling_std_10", "speed_change", "speed_acceleration",
          "speed_category")
        .orderBy("event_id")
    }),

    // ---- temporal + state-transition features (database_pipeline
    // .py:443-492): hour/day-of-week/weekend, shift binning (pd.cut
    // bins [-1,6,14,22,24] night/day/evening/night), previous-state
    // shift/changed flags, per-(device,state) cumulative persistence ----
    "q_temporal_features" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, d).select(
        col("event_id"),
        concat(lit("t"), (col("user_id") % 20).cast("string")).as("device_id"),
        col("ts"), col("event_type").as("state"))
      val w = Window.partitionBy("device_id").orderBy("ts", "event_id")
      val ws = Window.partitionBy("device_id", "state").orderBy("ts", "event_id")
      e.withColumn("hour", hour(col("ts")))
        .withColumn("dow_monday0", (dayofweek(col("ts")) + 5) % 7)
        .withColumn("is_weekend",
          ((dayofweek(col("ts")) + 5) % 7 >= 5).cast("int"))
        .withColumn("shift", when(col("hour") <= 6, "night")
          .when(col("hour") <= 14, "day")
          .when(col("hour") <= 22, "evening").otherwise("night"))
        .withColumn("state_prev", lag("state", 1).over(w))
        .withColumn("state_changed",
          (!(col("state") <=> col("state_prev"))).cast("int"))
        .withColumn("state_seq_2", lag("state", 2).over(w))
        .withColumn("state_persistence", row_number().over(ws))
        .select("event_id", "hour", "dow_monday0", "is_weekend", "shift",
          "state_prev", "state_changed", "state_seq_2", "state_persistence")
        .orderBy("event_id")
    }),

    // ---- A7: ordered array-collect aggregation (ARRAY_AGG ... ORDER BY,
    // _archive/05_cpd_pipeline.sql:28-44), compared as an ordered
    // string join with HAVING count >= 10 ----
    "q_collect_series" -> ((s, d) => {
      events(s, d)
        .where(col("user_id") < 30)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id")))),
              x => x.getField("event_id").cast("string")), ",")
            .as("event_series"))
        .where(col("n") >= 10)
        .orderBy("user_id")
    }))

  val oracle: Map[String, String] = Map(
    "q_daily_counts" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // the same min-chain: each stage's "after the previous step" is a
    // ts predicate against the joined prior-stage time
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
        |    AS day, event_type, ts
        |  FROM events
        |), g1 AS (
        |  SELECT user_id, day,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM e GROUP BY 1, 2
        |), g2 AS (
        |  SELECT e.user_id, e.day, min(e.ts) AS t_click
        |  FROM e JOIN g1 USING (user_id, day)
        |  WHERE e.event_type = 'click' AND e.ts > g1.t_view
        |  GROUP BY 1, 2
        |), g3 AS (
        |  SELECT e.user_id, e.day, min(e.ts) AS t_purchase
        |  FROM e JOIN g2 USING (user_id, day)
        |  WHERE e.event_type = 'purchase' AND e.ts > g2.t_click
        |  GROUP BY 1, 2
        |)
        |SELECT g1.day, CAST(count(*) AS BIGINT) AS n_user_days,
        |  CAST(count(g1.t_view) AS BIGINT) AS n_view,
        |  CAST(count(g2.t_click) AS BIGINT) AS n_view_click,
        |  CAST(count(g3.t_purchase) AS BIGINT) AS n_view_click_purchase
        |FROM g1
        |LEFT JOIN g2 USING (user_id, day)
        |LEFT JOIN g3 USING (user_id, day)
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q_retention" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(
        |      date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0)
        |      AS BIGINT) AS week
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1
        |)
        |SELECT cohort.cohort_week, wk.week - cohort.cohort_week
        |  AS week_offset,
        |  CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_users
        |FROM wk JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "q_hist_quantiles" ->
      """WITH hist AS (
        |  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, bucket,
        |    sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
        |    sum(n) OVER (PARTITION BY event_type) AS total
        |  FROM hist
        |)
        |SELECT event_type,
        |  CAST(min(CASE WHEN cum >= (total * 1 + 1) // 2
        |    THEN bucket END) AS BIGINT) AS p50_milli,
        |  CAST(min(CASE WHEN cum >= (total * 9 + 9) // 10
        |    THEN bucket END) AS BIGINT) AS p90_milli,
        |  CAST(min(CASE WHEN cum >= (total * 99 + 99) // 100
        |    THEN bucket END) AS BIGINT) AS p99_milli
        |FROM cum GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_psi_drift" ->
      """WITH e AS (
        |  SELECT event_type,
        |    least(9, greatest(0, CAST(floor(value / 50) AS BIGINT))) AS bk,
        |    CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
        |      THEN 1 ELSE 0 END AS is_a
        |  FROM events
        |), g AS (
        |  SELECT event_type, bk, CAST(sum(is_a) AS BIGINT) AS ca,
        |    CAST(sum(1 - is_a) AS BIGINT) AS cb
        |  FROM e GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb
        |  FROM g GROUP BY 1
        |), grid AS (
        |  SELECT tot.event_type, tot.na, tot.nb, r.bk,
        |    CAST(coalesce(g.ca, 0) AS BIGINT) AS ca,
        |    CAST(coalesce(g.cb, 0) AS BIGINT) AS cb
        |  FROM tot
        |  CROSS JOIN (SELECT unnest(range(0, 10)) AS bk) r
        |  LEFT JOIN g ON g.event_type = tot.event_type AND g.bk = r.bk
        |), t AS (
        |  SELECT event_type,
        |    CAST(floor((
        |      (CAST(ca + 1 AS DOUBLE) / (na + 10) -
        |       CAST(cb + 1 AS DOUBLE) / (nb + 10)) *
        |      ln((CAST(ca + 1 AS DOUBLE) * (nb + 10)) /
        |         (CAST(cb + 1 AS DOUBLE) * (na + 10)))
        |    ) * 1000000000.0) AS BIGINT) AS term_nano
        |  FROM grid
        |)
        |SELECT event_type, CAST(sum(term_nano) AS BIGINT) AS psi_nano
        |FROM t GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_ks_drift" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor(value * 1000) AS BIGINT) AS x,
        |    CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
        |      THEN 1 ELSE 0 END AS is_a
        |  FROM events
        |), pts AS (
        |  SELECT event_type, x,
        |    CAST(sum(is_a) AS BIGINT) AS ca_pt,
        |    CAST(sum(1 - is_a) AS BIGINT) AS cb_pt
        |  FROM e GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, CAST(sum(ca_pt) AS BIGINT) AS n_a,
        |    CAST(sum(cb_pt) AS BIGINT) AS n_b
        |  FROM pts GROUP BY 1
        |), c AS (
        |  SELECT pts.event_type, tot.n_a, tot.n_b,
        |    abs(CAST(sum(pts.ca_pt) OVER (PARTITION BY pts.event_type
        |        ORDER BY pts.x) AS BIGINT) * tot.n_b -
        |      CAST(sum(pts.cb_pt) OVER (PARTITION BY pts.event_type
        |        ORDER BY pts.x) AS BIGINT) * tot.n_a) AS d_num,
        |    abs(1000000 * CAST(sum(pts.ca_pt) OVER (
        |        PARTITION BY pts.event_type ORDER BY pts.x) AS BIGINT)
        |        // tot.n_a -
        |      1000000 * CAST(sum(pts.cb_pt) OVER (
        |        PARTITION BY pts.event_type ORDER BY pts.x) AS BIGINT)
        |        // tot.n_b) AS gap_ppm
        |  FROM pts JOIN tot USING (event_type)
        |)
        |SELECT event_type, max(n_a) AS n_a, max(n_b) AS n_b,
        |  CAST(max(d_num) AS BIGINT) AS d_num_max,
        |  CAST(max(gap_ppm) AS BIGINT) AS ks_ppm
        |FROM c GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_markov" ->
      """WITH s AS (
        |  SELECT user_id, event_type AS cur,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events
        |), tr AS (
        |  SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
        |), tot AS (
        |  SELECT prev, CAST(sum(n) AS BIGINT) AS row_n FROM tr GROUP BY 1
        |)
        |SELECT tr.prev, tr.cur, tr.n,
        |  CAST(tr.n * 1000000 // tot.row_n AS BIGINT) AS p_ppm
        |FROM tr JOIN tot USING (prev)
        |ORDER BY prev, cur""".stripMargin,

    "q_describe" ->
      """SELECT event_type,
        |  count(value) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |    / count(value) AS mean,
        |  round(stddev_samp(value), 4) AS std,
        |  round(min(value), 2) AS min,
        |  round(quantile_cont(value, 0.5), 4) AS median,
        |  round(max(value), 2) AS max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_crosstab" ->
      """SELECT event_type,
        |  count(CASE WHEN value < 25 THEN 1 END) AS q1,
        |  count(CASE WHEN value >= 25 AND value < 50 THEN 1 END) AS q2,
        |  count(CASE WHEN value >= 50 AND value < 75 THEN 1 END) AS q3,
        |  count(CASE WHEN value >= 75 THEN 1 END) AS q4
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_binning" ->
      """SELECT CASE WHEN l_quantity <= 10 THEN '0-10'
        |            WHEN l_quantity <= 25 THEN '10-25'
        |            WHEN l_quantity <= 40 THEN '25-40'
        |            ELSE '40+' END AS qty_bin,
        |  count(*) AS n, round(avg(l_extendedprice), 4) AS avg_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_winsorize" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), b AS (
        |  SELECT event_type,
        |    CAST(round(quantile_cont(cents, 0.05)) AS BIGINT) AS lo_c,
        |    CAST(round(quantile_cont(cents, 0.95)) AS BIGINT) AS hi_c
        |  FROM e GROUP BY event_type
        |)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN e.cents < b.lo_c THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lo,
        |  CAST(sum(CASE WHEN e.cents > b.hi_c THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hi,
        |  CAST(sum(greatest(b.lo_c, least(b.hi_c, e.cents))) AS BIGINT)
        |    AS sum_winsor_cents,
        |  max(b.lo_c) AS lo_c, max(b.hi_c) AS hi_c
        |FROM e JOIN b USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_robust_scale" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), s AS (
        |  SELECT event_type,
        |    quantile_cont(cents, 0.25) AS p25,
        |    quantile_cont(cents, 0.5) AS med,
        |    quantile_cont(cents, 0.75) AS p75
        |  FROM e GROUP BY event_type
        |)
        |SELECT e.event_id, e.event_type,
        |  round(CASE WHEN s.p75 <> s.p25
        |    THEN (e.cents - s.med) / (s.p75 - s.p25) END, 6) AS scaled
        |FROM e JOIN s USING (event_type)
        |ORDER BY e.event_id""".stripMargin,

    "q_quantile_bins" ->
      """WITH b AS (
        |  SELECT event_type, value,
        |    ntile(4) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS qbin
        |  FROM events
        |)
        |SELECT event_type, qbin, count(*) AS n,
        |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS DOUBLE) / 1000.0
        |    / count(*) AS avg_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_kinematic" ->
      """WITH e AS (
        |  SELECT event_id,
        |    't' || CAST(user_id % 20 AS VARCHAR) AS device_id,
        |    ts, value / 10 AS speed
        |  FROM events
        |)
        |SELECT event_id,
        |  CAST(CASE WHEN speed <= 0.5 THEN 1 ELSE 0 END AS INT)
        |    AS is_stationary,
        |  round(avg(speed) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
        |    AS speed_rolling_mean_5,
        |  round(stddev_samp(speed) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6)
        |    AS speed_rolling_std_10,
        |  round(speed - lag(speed) OVER w, 6) + 0.0 AS speed_change,
        |  round((speed - lag(speed) OVER w) -
        |    (lag(speed) OVER w - lag(speed, 2) OVER w), 6) + 0.0
        |    AS speed_acceleration,
        |  CASE WHEN speed <= 0.5 THEN 'stationary'
        |       WHEN speed <= 5 THEN 'slow'
        |       WHEN speed <= 15 THEN 'medium'
        |       ELSE 'fast' END AS speed_category
        |FROM e
        |WINDOW w AS (PARTITION BY device_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_temporal_features" ->
      """WITH e AS (
        |  SELECT event_id,
        |    't' || CAST(user_id % 20 AS VARCHAR) AS device_id,
        |    CAST(ts AS TIMESTAMP) AS ts, event_type AS state
        |  FROM events
        |)
        |SELECT event_id,
        |  CAST(hour(ts) AS INT) AS hour,
        |  CAST(isodow(ts) - 1 AS INT) AS dow_monday0,
        |  CAST(CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END AS INT)
        |    AS is_weekend,
        |  CASE WHEN hour(ts) <= 6 THEN 'night'
        |       WHEN hour(ts) <= 14 THEN 'day'
        |       WHEN hour(ts) <= 22 THEN 'evening'
        |       ELSE 'night' END AS shift,
        |  lag(state) OVER w AS state_prev,
        |  CAST(CASE WHEN state IS DISTINCT FROM lag(state) OVER w
        |    THEN 1 ELSE 0 END AS INT) AS state_changed,
        |  lag(state, 2) OVER w AS state_seq_2,
        |  CAST(row_number() OVER (PARTITION BY device_id, state
        |    ORDER BY ts, event_id) AS INT) AS state_persistence
        |FROM e
        |WINDOW w AS (PARTITION BY device_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_movement" ->
      """WITH e AS (
        |  SELECT event_id,
        |    't' || CAST(user_id % 20 AS VARCHAR) AS device_id,
        |    ts, value / 1000 + 33.2 AS latitude,
        |    (user_id % 100) / 10000.0 - 97.84 AS longitude
        |  FROM events
        |), c AS (
        |  SELECT quantile_cont(longitude, 0.5) AS clon,
        |         quantile_cont(latitude, 0.5) AS clat
        |  FROM e
        |)
        |SELECT event_id, device_id,
        |  round(sqrt(
        |    pow(longitude - lag(longitude) OVER w, 2) +
        |    pow(latitude - lag(latitude) OVER w, 2)), 9) AS position_change,
        |  round(sqrt(pow(longitude - (SELECT clon FROM c), 2) +
        |             pow(latitude - (SELECT clat FROM c), 2)), 9)
        |    AS distance_from_center
        |FROM e
        |WINDOW w AS (PARTITION BY device_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_truck_class" ->
      """WITH e AS (
        |  SELECT *,
        |    'lake-' || CASE WHEN user_id % 3 = 0 THEN '775g' ELSE '605' END
        |      || '-' || CAST(user_id % 20 AS VARCHAR) AS device_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), c AS (
        |  SELECT *, CASE WHEN device_id LIKE '%775g%' THEN '775G'
        |                 ELSE '605' END AS truck_class
        |  FROM e
        |)
        |SELECT truck_class, count(*) AS n,
        |  count(DISTINCT device_id) AS n_devices,
        |  CAST(sum(cents) AS DOUBLE) / 100.0 / count(*) AS avg_value,
        |  sqrt(CAST(count(*) * sum(cents * cents) - sum(cents) * sum(cents)
        |      AS DOUBLE) /
        |    CAST(count(*) * (count(*) - 1) AS DOUBLE)) / 100.0
        |    AS stddev_value,
        |  round(min(value), 2) AS min_value,
        |  round(max(value), 2) AS max_value
        |FROM c GROUP BY truck_class ORDER BY truck_class""".stripMargin,

    "q_collect_series" ->
      """SELECT user_id, count(*) AS n,
        |  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)
        |    AS event_series
        |FROM events WHERE user_id < 30
        |GROUP BY user_id HAVING count(*) >= 10
        |ORDER BY user_id""".stripMargin)
}
