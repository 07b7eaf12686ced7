package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SHA-256 row identity, byte-compatible with the reference's
  * `generate_raw_event_hash_id(device_id, ts) =
  * encode(digest(device_id || '|' || ts::TEXT, 'sha256'), 'hex')`
  * (`02_raw_telemetry_transform.sql:39-47`).
  *
  * The subtle part is Postgres's `timestamptz::TEXT` rendering under UTC
  * (`2025-07-30 00:00:05.734539+00`): fractional seconds are printed to
  * microsecond precision with trailing zeros trimmed, and omitted entirely
  * when zero; the zone suffix is `+00`. [[pgTimestampText]] reproduces that
  * byte-for-byte so hashes match the oracle (SURVEY §7.4 risk #1).
  *
  * Everything here is built-in `functions._` composition — `sha2` is a
  * codegen'd Catalyst expression, so hashing 100 TB of rows stays inside
  * whole-stage codegen with no UDF boundary.
  */
object Hashing {

  /** Postgres `timestamptz::TEXT` rendering of a UTC timestamp column. */
  def pgTimestampText(ts: Column): Column = {
    val base = date_format(ts, "yyyy-MM-dd HH:mm:ss")
    val micros = unix_micros(ts) % 1000000L
    val frac = regexp_replace(lpad(micros.cast("string"), 6, "0"), "0+$", "")
    concat(base, when(micros > 0, concat(lit("."), frac)).otherwise(lit("")),
      lit("+00"))
  }

  /** `sha256(device_id || '|' || pg_text(ts))` as lower-case hex. */
  def rawEventHashId(deviceId: Column, ts: Column): Column =
    sha2(concat(deviceId, lit("|"), pgTimestampText(ts)), 256)
}
