package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar coercion functions from SURVEY §2.2 (P4–P10), expressed as pure
  * Column compositions — no UDFs, so every one stays inside whole-stage
  * codegen and can constant-fold / push down.
  *
  * The reference implements these as per-row Python helpers; citations on
  * each function point at the semantics being reproduced.
  */
object Coercions {

  /** P6 — lap-time parse `"M:SS.mmm"` or plain seconds → seconds as double.
    * Reference: /root/reference/transformer.py:434-456 (`_parse_lap_time`):
    * float passthrough, else `(\d+):(\d+\.\d+)` → min*60+sec, else null.
    * The regex mirrors the reference's `re.match` exactly: anchored at the
    * start only (trailing garbage tolerated, as in Python), fractional
    * seconds REQUIRED (`1:23` is null in both engines).
    *
    * The `M:SS.mmm` arithmetic runs in exact DECIMAL and rounds to double
    * ONCE, so `"1:32.633"` and `"92.633"` produce the bit-identical
    * double. With FP accumulation (`m*60.0 + s`) they differ in the last
    * ulp, and when a stream carries the same lap in both wire shapes the
    * coalescing upsert's survivor — hence the table's bytes — would depend
    * on micro-batch boundary timing.
    */
  def lapSeconds(c: Column): Column = {
    val direct = c.try_cast("double")
    val m = regexp_extract(c, "^(\\d+):(\\d+\\.\\d+)", 1)
    val s = regexp_extract(c, "^(\\d+):(\\d+\\.\\d+)", 2)
    when(c.isNull || c === "", lit(null).cast("double"))
      .when(direct.isNotNull, direct)
      .when(m =!= "",
        (m.try_cast("decimal(10,0)") * 60 + s.try_cast("decimal(16,6)"))
          .cast("double"))
      .otherwise(lit(null).cast("double"))
  }

  /** P7 — numeric coercion: ''→null, 'true'/True→1.0, 'false'/False→0.0,
    * parseable→double, junk→null.
    * Reference: /root/reference/main.py:179-193, /root/reference/monitor_weather.py:149-163.
    */
  def toNumeric(c: Column): Column = {
    val t = lower(trim(c.cast("string")))
    when(c.isNull || t === "", lit(null).cast("double"))
      .when(t === "true", lit(1.0))
      .when(t === "false", lit(0.0))
      .otherwise(t.try_cast("double"))
  }

  /** P8 — int coercion: ''→null, non-integer→null.
    * Reference: /root/reference/transformer.py:468-476.
    */
  def toInt(c: Column): Column =
    trim(c.cast("string")).try_cast("int")

  /** P9 (bool flavor) — rainfall as boolean: EXACTLY the reference's
    * `value.lower() == 'true'` test (/root/reference/transformer.py:403) —
    * note `'1'` is false here; the numeric flavor (monitor_weather.py:113,
    * [[toNumeric]]) is where `'1'` registers as rain. The engine exposes
    * both columns (SURVEY note R1).
    */
  def rainfallBool(c: Column): Column =
    when(c.isNull, lit(null).cast("boolean"))
      .otherwise(lower(trim(c.cast("string"))) === "true")

  /** P4 — ISO-8601 timestamp parse with `Z` handling; the reference's
    * fallback-to-`datetime.now()` (/root/reference/transformer.py:422-432) is
    * nondeterministic, so the fallback is injectable: pass a literal
    * timestamp column (or null) as `fallback`.
    *
    * The wire format carries 7-digit fractional seconds
    * (`2025-05-17T13:59:20.6797217Z`); `try_to_timestamp` with default
    * parsing handles ISO-8601 with up to 9 fractional digits, truncating to
    * micros.
    */
  def parseTs(c: Column, fallback: Column = lit(null).cast("timestamp")): Column =
    coalesce(try_to_timestamp(c), fallback)

  /** P5 — tz-aware → naive (the reference strips tzinfo before NTZ columns:
    * /root/reference/main.py:140, /root/reference/supabase_loader.py:262).
    * With session tz pinned UTC this is a plain NTZ cast.
    */
  def toNtz(c: Column): Column = c.cast("timestamp_ntz")

  /** P10 — strip wrapping quotes before base64-decoding `.z` payloads.
    * Reference: /root/reference/monitor_car_telemetry.py:38-39.
    */
  def stripQuotes(c: Column): Column =
    regexp_replace(c, "^[\"']|[\"']$", "")

  /** P3 — full `.z` payload decode: base64 → raw-inflate → UTF-8 JSON text.
    * Reference: /root/reference/monitor_car_telemetry.py:32-48.
    * Invalid base64 → null (unbase64 throws under ANSI, so gate it with a
    * validity test; corrupt-but-valid base64 → null from inflate itself).
    */
  def inflateZ(c: Column): Column = {
    val stripped = stripQuotes(c)
    val valid = stripped.rlike("^[A-Za-z0-9+/]*={0,2}$") &&
      length(stripped) % 4 === 0 && length(stripped) > 0
    // binary→string CAST, not decode(): under ANSI, decode() throws
    // MALFORMED_CHARACTER_CODING on non-UTF-8 bytes, killing the task on a
    // corrupt-but-inflatable payload; the cast carries the bytes through
    // and the downstream from_json yields null (T13 skip semantics).
    InflateRaw.inflate_raw(unbase64(when(valid, stripped))).cast("string")
  }
}
