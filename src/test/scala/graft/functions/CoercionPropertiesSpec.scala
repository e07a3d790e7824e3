package graft.functions

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based coverage (SURVEY §5 plan #4) using plain ScalaCheck
  * generators with a fixed seed (the scalatest-scalacheck bridge is not in
  * the offline cache): coercion totality and P6 round-trip.
  */
class CoercionPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("P6/P7/P8 coercions are total: arbitrary strings never throw") {
    val junk: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.oneOf("", " ", ":", "1:", ":5", "1:2:3", "NaN", "Infinity", "-",
        "true", "False", "1e308", "-0.0", "٣٤", "1:99.999"))
    val inputs = sample(junk, 300)
    val out = inputs.toDF("v").select(
      Coercions.lapSeconds(col("v")),
      Coercions.toNumeric(col("v")),
      Coercions.toInt(col("v")),
      Coercions.rainfallBool(col("v"))).collect()
    assert(out.length == inputs.length) // reached without throwing
  }

  test("P6 round-trip: M:SS.mmm formatting of valid lap times parses back") {
    val lapGen = for {
      min <- Gen.choose(0, 59)
      sec <- Gen.choose(0, 59)
      ms <- Gen.choose(0, 999)
    } yield (min, sec, ms)
    val laps = sample(lapGen, 200)
    val strs = laps.map { case (m, s, ms) => f"$m:$s%02d.$ms%03d" }
    val parsed = strs.toDF("v").select(Coercions.lapSeconds(col("v"))).collect()
    parsed.zip(laps).foreach { case (row, (m, s, ms)) =>
      val expected = m * 60 + s + ms / 1000.0
      assert(math.abs(row.getDouble(0) - expected) < 1e-9, s"$m:$s.$ms")
    }
  }

  test("P6 wire-shape equivalence property: M:SS.mmm == plain seconds, bitwise") {
    // both representations of the same lap time must parse to the SAME
    // double bit pattern, or streaming batch boundaries would decide the
    // stored bytes (the round-2 streaming-laps nondeterminism)
    val lapGen = for {
      min <- Gen.choose(0, 59)
      sec <- Gen.choose(0, 59)
      ms <- Gen.choose(0, 999)
    } yield (min, sec, ms)
    val laps = sample(lapGen, 200)
    val pairs = laps.map { case (m, s, ms) =>
      val totalMs = (m * 60L + s) * 1000 + ms
      (f"$m:$s%02d.$ms%03d", s"${totalMs / 1000}.${f"${totalMs % 1000}%03d"}")
    }
    val out = pairs.toDF("a", "b").select(
      Coercions.lapSeconds(col("a")), Coercions.lapSeconds(col("b"))).collect()
    out.zip(pairs).foreach { case (r, (a, b)) =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"'$a' -> ${r.getDouble(0)} but '$b' -> ${r.getDouble(1)}")
    }
  }

  test("pyliteral parser is total over arbitrary ascii lines") {
    val lineGen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.asciiPrintableStr.map(s => s"['T', {'a': '$s'}, 'ts']"),
      Gen.asciiPrintableStr.map(s => s"[$s"))
    sample(lineGen, 500).foreach { line =>
      PyLiteral.parseLine(line) // must never throw
    }
  }

  test("consolidation is order-insensitive for disjoint non-null fields (A3)") {
    import graft.operators.F1Transforms
    val f1 = Seq((1, 1, Some(90.0), None: Option[Double], 1L, 10L))
    val f2 = Seq((1, 1, None: Option[Double], Some(28.0), 1L, 20L))
    def mk(rows: Seq[(Int, Int, Option[Double], Option[Double], Long, Long)]) =
      rows.toDF("driver_number", "lap_number", "lap_time", "sector_1_time", "x", "line_id")
        .withColumn("sector_2_time", org.apache.spark.sql.functions.lit(null).cast("double"))
        .withColumn("sector_3_time", org.apache.spark.sql.functions.lit(null).cast("double"))
        .withColumn("speed_trap", org.apache.spark.sql.functions.lit(null).cast("int"))
        .withColumn("timestamp", org.apache.spark.sql.functions.lit(null).cast("timestamp"))
        .drop("x")
    val a = F1Transforms.consolidateLaps(mk(f1) unionByName mk(f2)).collect().head
    val b = F1Transforms.consolidateLaps(mk(f2) unionByName mk(f1)).collect().head
    assert(a.getAs[Double]("lap_time") == b.getAs[Double]("lap_time"))
    assert(a.getAs[Double]("sector_1_time") == b.getAs[Double]("sector_1_time"))
  }
}
