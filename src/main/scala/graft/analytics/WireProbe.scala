package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Coercions, InflateRaw}

/** Wire-format introspection (the reference's debugging tool
  * /root/reference/analyze_f1_data.py:8-91, re-expressed as one relational
  * pass): for the first `numSamples` lines of each topic, classify the
  * payload (dict vs string), attempt base64 → raw-deflate decode, and
  * emit lengths, decode-success flags, a plaintext head, and a hexdump of
  * the raw bytes — the analyzer's printout as a queryable DataFrame.
  *
  * The reference streams the file once per investigation in Python; here
  * the probe is a single window pass (rank-per-topic, then map-only
  * decode on the ≤ numSamples·topics surviving rows — decode runs AFTER
  * sampling, so probing a 100 TB capture decodes a few dozen lines, not
  * the corpus).
  */
object WireProbe {

  def analyze(events: DataFrame, numSamples: Int = 5): DataFrame = {
    val w = Window.partitionBy("topic").orderBy("line_id")
    val sampled = events.filter(col("topic").isNotNull)
      .withColumn("sample_no", row_number().over(w))
      .filter(col("sample_no") <= numSamples)

    val stripped = Coercions.stripQuotes(col("payload"))
    val isDict = col("payload").startsWith("{") || col("payload").startsWith("[")
    val b64ok = !isDict && stripped.rlike("^[A-Za-z0-9+/]*={0,2}$") &&
      length(stripped) % 4 === 0 && length(stripped) > 0
    val raw = unbase64(when(b64ok, stripped))
    val inflated = InflateRaw.inflate_raw(raw).cast("string")

    sampled.select(
      col("topic"),
      col("sample_no"),
      col("ts"),
      when(isDict, lit("dict")).otherwise(lit("string")).as("payload_kind"),
      length(col("payload")).as("payload_len"),
      b64ok.as("base64_ok"),
      inflated.isNotNull.as("inflate_ok"),
      length(inflated).as("inflated_len"),
      // analyzer's "primeiros 50 chars" of the best decoded view
      substring(coalesce(inflated, col("payload")), 1, 50).as("head"),
      // analyzer's 20-byte hexdump of the base64-decoded payload
      substring(hex(raw), 1, 40).as("hexdump20"))
  }
}
