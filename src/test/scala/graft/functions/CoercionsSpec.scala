package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** FIXTURES.md §A.6 scalar-function edge-case vectors. */
class CoercionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("lapSeconds: float passthrough, M:SS.mmm, MM:SS, junk, empty") {
    val in = Seq("92.5", "1:32.500", "12:03.250", "", "abc", null).toDF("v")
    val out = in.select(Coercions.lapSeconds(col("v"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) == 92.5)
    assert(out(1) == 92.5)
    assert(out(2) == 723.25)
    assert(out(3) == null)
    assert(out(4) == null)
    assert(out(5) == null)
  }

  test("lapSeconds: M:SS.mmm and plain-seconds wire shapes are bit-identical") {
    // regression for the streaming-laps nondeterminism: when a stream
    // carries the same lap in both shapes, the coalescing upsert's
    // survivor must not depend on which shape arrived in which batch
    val pairs = Seq(("1:32.633", "92.633"), ("0:59.999", "59.999"),
      ("2:05.001", "125.001"), ("12:03.250", "723.250"), ("1:00.100", "60.100"))
    val out = pairs.toDF("m", "s").select(
      Coercions.lapSeconds(col("m")).as("a"),
      Coercions.lapSeconds(col("s")).as("b")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)} bitwise")
    }
  }

  test("toNumeric: '', true/false strings and booleans, floats, junk") {
    val in = Seq("", "true", "False", "22.2", "x", "0").toDF("v")
    val out = in.select(Coercions.toNumeric(col("v"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out.toSeq == Seq(null, 1.0, 0.0, 22.2, null, 0.0))
  }

  test("toInt: '' → null, int strings, non-int → null") {
    val in = Seq("", "301", "3.5", "  7 ").toDF("v")
    val out = in.select(Coercions.toInt(col("v"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getInt(0))
    assert(out.toSeq == Seq(null, 301, null, 7))
  }

  test("rainfall fork (R1): bool flavor is exactly lower()=='true'; numeric sees 1") {
    val in = Seq("0", "true", "1").toDF("v")
    val out = in.select(
      Coercions.rainfallBool(col("v")).as("b"),
      Coercions.toNumeric(col("v")).as("n")).collect()
    assert(out(0).getBoolean(0) == false && out(0).getDouble(1) == 0.0)
    assert(out(1).getBoolean(0) == true && out(1).getDouble(1) == 1.0)
    // reference transformer.py:403: '1'.lower() != 'true' → False; the
    // NUMERIC flavor is where '1' registers as rain (monitor_weather.py:113)
    assert(out(2).getBoolean(0) == false && out(2).getDouble(1) == 1.0)
  }

  test("lapSeconds mirrors the reference regex: no-fraction null, trailing garbage tolerated") {
    val in = Seq("1:23", "1:23.45xyz").toDF("v")
    val out = in.select(Coercions.lapSeconds(col("v"))).collect()
    assert(out(0).isNullAt(0))            // re.match needs (\d+):(\d+\.\d+)
    assert(out(1).getDouble(0) == 83.45)  // unanchored tail, like re.match
  }

  test("parseTs: ISO-8601 with Z and 7-digit fractions; injectable fallback") {
    val in = Seq("2025-05-17T14:00:04.128Z", "2025-05-17T13:59:20.6797217Z", "garbage").toDF("v")
    val out = in.select(Coercions.parseTs(col("v"))).collect()
    assert(out(0).getTimestamp(0).toInstant.toString == "2025-05-17T14:00:04.128Z")
    // 7 fractional digits truncate to micros
    assert(out(1).getTimestamp(0).toInstant.toString == "2025-05-17T13:59:20.679721Z")
    assert(out(2).isNullAt(0))
  }
}
