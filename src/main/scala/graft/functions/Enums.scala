package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The three telemetry enum normalizations of the silver transform.
  *
  * Semantics lifted from the CASE chains in
  * `STEP 2 - Transform Raw Telemetry/02_raw_telemetry_transform.py:282-327`
  * (enum DDL `02_raw_telemetry_transform.sql:8-36`): input is lower(trim(x)),
  * unknown/null values map to 'unknown' and never fail — total functions.
  */
object Enums {

  /** telemetry_state_enum: 8 canonical values, 16 WHEN arms
    * (`02_raw_telemetry_transform.py:282-300`). */
  val stateMap: Map[String, String] = Map(
    "idle" -> "idle",
    "loading" -> "loading",
    "loadingmaneuver" -> "loading",
    "dumping" -> "dumping",
    "dumpingmaneuver" -> "dumping",
    "loadtodump" -> "hauling",
    "dumptoload" -> "hauling",
    "leadqueueddumptoload" -> "hauling",
    "leadqueuedloadtodump" -> "hauling",
    "zonequeueddumptoload" -> "hauling",
    "zonequeuedloadtodump" -> "hauling",
    "waitingtodump" -> "stopped",
    "active" -> "active",
    "maintenance" -> "maintenance",
    "stopped" -> "stopped",
    "hauling" -> "hauling")

  /** software_state_enum: 7 canonical values
    * (`02_raw_telemetry_transform.py:301-314`). */
  val softwareStateMap: Map[String, String] = Map(
    "fault" -> "fault",
    "start" -> "autonomous",
    "stop" -> "manual",
    "dump" -> "autonomous",
    "slow" -> "intervention",
    "wait" -> "autonomous",
    "manual" -> "manual",
    "autonomous" -> "autonomous",
    "intervention" -> "intervention",
    "disabled" -> "disabled",
    "calibrating" -> "calibrating")

  /** prndl_enum: 6 values, single-letter aliases accepted. */
  val prndlMap: Map[String, String] = Map(
    "park" -> "park", "p" -> "park",
    "reverse" -> "reverse", "r" -> "reverse",
    "neutral" -> "neutral", "n" -> "neutral",
    "drive" -> "drive", "d" -> "drive",
    "low" -> "low", "l" -> "low")

  /** Normalize via a literal-map lookup: `element_at(<map literal>,
    * lower(trim(c)))`, null (unmatched or null input) → 'unknown'.
    *
    * NOT a `when` chain: folding the map into nested CASE WHEN arms
    * re-evaluates `lower(trim(c))` once per arm (no CSE across CASE
    * branches), which measured ~3× the whole transform's runtime. The map
    * literal is a single hash probe with the key evaluated once.
    */
  def mapEnum(c: Column, m: Map[String, String]): Column =
    coalesce(element_at(typedLit(m), lower(trim(c))), lit("unknown"))

  def mapState(c: Column): Column = mapEnum(c, stateMap)
  def mapSoftwareState(c: Column): Column = mapEnum(c, softwareStateMap)
  def mapPrndl(c: Column): Column = mapEnum(c, prndlMap)

  /** Permissive boolean parse: t/f/true/false/1/0/yes/no (any case) → bool,
    * else null — the orchestrator's robust re-parse
    * (`05_cpd_orchestrator_polars.py:204-206`, TICKET-146 semantics).
    */
  def parseBool(c: Column): Column = {
    val k = lower(trim(c))
    when(k.isin("t", "true", "1", "yes", "y"), lit(true))
      .when(k.isin("f", "false", "0", "no", "n"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }
}
