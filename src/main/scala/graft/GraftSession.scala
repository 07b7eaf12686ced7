package graft

import org.apache.spark.sql.SparkSession

/** Front door for library users: a SparkSession wired with graft's
  * extensions (native SQL functions) and the configuration this engine is
  * designed around (AQE on, UTC, sane local shuffle parallelism).
  *
  * {{{
  * val spark = GraftSession.local(cores = 32)
  * val silver = operators.TelemetryTransform.transform(
  *   sources.TelemetryCsv.read(spark, path))
  * }}}
  *
  * On a cluster, apply [[configure]] to your own builder instead of
  * [[local]] — every operator in this library is deployment-agnostic.
  */
object GraftSession {

  /** Silence the benign `WindowExec: No Partition Defined` warning flood.
    * Every unpartitioned window in this library sits behind the bounded
    * three-site whitelist that GlobalWindowGateSpec enforces (provably
    * ≤50 k-row frames) — the spec, not this log line, is the protection.
    * The driver records only the stdout TAIL of bench/verify runs, and
    * thousands of repeats of this known-benign line would bury any NEW
    * warning class in that window (r10 verdict #3). */
  def quietKnownWarnings(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // "RDD was locally checkpointed ... cannot be recomputed after
    // unpersisting": emitted once per released checkpoint by the
    // release-after-consume discipline (Caches.releaseResult on
    // localCheckpoint-backed results — BT/MMR/LPA and every iterative
    // operator). Benign BY CONSTRUCTION: a result is only released
    // after everything derived from it is itself materialized, so the
    // truncated lineage is never re-executed; the hygiene specs
    // (StorageHygiene/Soak), not this log line, are the protection.
    // A MESSAGE-level filter, deliberately not a logger-level cut:
    // RDD warnings key by concrete class, so silencing the whole
    // MapPartitionsRDD logger would also hide any FUTURE warning that
    // signals the release discipline actually broke — exactly the
    // bury-new-warnings failure this method exists to prevent.
    denyMessage("org.apache.spark.rdd.MapPartitionsRDD",
      "locally checkpointed")
  }

  /** Attach a DENY filter for messages containing `needle` to the
    * named logger, leaving every other message at its normal level. */
  private def denyMessage(loggerName: String, needle: String): Unit = {
    import org.apache.logging.log4j.core.{Filter, LogEvent}
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.filter.AbstractFilter
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val cfg = ctx.getConfiguration
    val existing = cfg.getLoggerConfig(loggerName)
    val lc =
      if (existing.getName == loggerName) existing
      else {
        // additive pass-through config: no level override, no own
        // appenders — everything except the denied message reaches the
        // root appenders unchanged
        val created = new LoggerConfig(loggerName, null, true)
        cfg.addLogger(loggerName, created)
        created
      }
    lc.addFilter(new AbstractFilter(
        Filter.Result.DENY, Filter.Result.NEUTRAL) {
      override def filter(event: LogEvent): Filter.Result =
        if (event.getMessage.getFormattedMessage.contains(needle))
          Filter.Result.DENY
        else Filter.Result.NEUTRAL
    })
    ctx.updateLoggers()
  }

  /** Shared tuning: adaptive execution (coalescing + skew-join split),
    * UTC timestamps (oracle/Postgres parity), extensions registered. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // timezone-less parquet timestamps read as TimestampType (UTC), not
    // NTZ — keeps unix_micros/oracle parity independent of writer quirks
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")

  /** Local-mode session with shuffle parallelism matched to cores (the
    * 200-partition default is wrong for one machine). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val s = configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    // getOrCreate may return a pre-existing session whose builder-time
    // extensions never applied — make function registration unconditional
    graft.plans.GraftExtensions.register(s)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
