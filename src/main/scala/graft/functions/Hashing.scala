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

  /** First 7 bytes of MD5(UTF-8), little-endian, as a non-negative long:
    * the exact bits of DuckDB's `md5_number_upper(s) % 2^56`, so any plan
    * built over this hash has a SQL-recomputable oracle twin. This is the
    * codegen'd expression sibling of `Dedup.hash64Md5` (which covers the
    * full 64 bits but needs a UDF to keep the signed top byte exact —
    * 56 bits always fit a signed long, so `md5`/`substring`/`conv`
    * builtins suffice and the hash stays inside whole-stage codegen).
    * The hex pairs are concatenated in reverse byte order because
    * `md5_number_upper` reads the first 8 digest bytes little-endian. */
  def md5Long56(c: Column): Column = {
    val hex = md5(c)
    val le = concat(Seq(13, 11, 9, 7, 5, 3, 1)
      .map(i => substring(hex, i, 2)): _*)
    conv(le, 16, 10).cast("long")
  }

  /** Driver-side twin of [[md5Long56]] — the same 56 bits from the same
    * digest, for building DETERMINISTIC constants (e.g. the JL sign
    * matrix) once on the driver instead of per row in the plan.
    * HashingSpec pins bit-equality with the Column form. */
  def md5Long56Local(s: String): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    // first 7 digest bytes little-endian (byte 6 most significant) —
    // exactly the hex-pair order the Column form concatenates
    (6 to 0 by -1).foldLeft(0L)((acc, i) => (acc << 8) | (digest(i) & 0xffL))
  }
}
