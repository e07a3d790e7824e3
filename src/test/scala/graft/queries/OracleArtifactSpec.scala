package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Guards the correctness-artifact pipeline itself. Round 8 shipped a
  * `Some(null)` oracle (object-init-order capture) that NPE'd the verifier
  * after the parquet dumps but before oracle_sql.json — the driver's gate
  * saw an empty artifact and every green query went formally untested.
  * These checks make that class of failure a unit-test failure instead.
  * No SparkSession needed: this is pure registry/JSON hygiene.
  */
class OracleArtifactSpec extends AnyFunSuite {

  test("every oracleSql value is non-null, non-empty, and SELECT-shaped") {
    val oracles = SparkEntry.oracleSql
    assert(oracles.nonEmpty)
    oracles.foreach { case (name, sql) =>
      assert(sql != null, s"$name: null oracle")
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      val head = sql.trim.toUpperCase.takeWhile(!_.isWhitespace)
      assert(head == "SELECT" || head == "WITH",
        s"$name: oracle does not start with SELECT/WITH: ${sql.take(60)}")
    }
  }

  test("every registry entry is oracle-gated — a frozen-oracle key miss is loud") {
    // frozen-oracle entries wire up as F1OracleSql.sql.get(name): if the
    // VALUES literal was never regenerated (round 13's x85 shipped exactly
    // this), the Option is silently None and the entry runs ungated —
    // the driver records err "no_oracle" and the round closes with an
    // unverified query. Every entry in this registry is SQL-expressible
    // by construction, so None is always a freeze-step omission, never a
    // design choice: fail here, at unit-test time.
    val ungated = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      .toSeq.sorted
    assert(ungated.isEmpty,
      "registry entries running without a DuckDB oracle (frozen VALUES " +
        "literal missing from F1OracleSql — run scripts/gen_values_oracles" +
        s".py and commit): ${ungated.mkString(", ")}")
  }

  test("no oracle leaves a sum() uncast (DuckDB HUGEINT df-fetch trap)") {
    // DuckDB types sum(<integer>) — plain or windowed — as HUGEINT
    // (INT128). The driver's checker fetches the oracle result as a
    // dataframe, and HUGEINT degrades to float64 there, so Spark's "42"
    // hashes against "42.0" and the query goes red with values identical
    // (round 9's x55, ExtensionQueries x55 oracle). Repo convention is
    // CAST(sum(...) [OVER (...)] AS BIGINT/DOUBLE) everywhere; this sweep
    // makes the convention a unit-test failure instead of a judge round.
    val sumRe = "(?i)\\bsum\\s*\\(".r
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        sumRe.findAllMatchIn(sql).flatMap { m =>
          val before = sql.substring(0, m.start).replaceAll("\\s+", "")
            .toLowerCase
          if (before.endsWith("cast(")) None
          else Some(s"$name@${m.start}: ..." +
            sql.slice(math.max(0, m.start - 30), m.start + 40) + "...")
        }
    }
    assert(bad.isEmpty,
      s"uncast sum( in oracle SQL — DuckDB types it HUGEINT and the " +
        s"driver's dataframe fetch degrades it to float64; wrap as " +
        s"CAST(sum(...) AS BIGINT/DOUBLE):\n  " + bad.mkString("\n  "))
  }

  test("every query name has either an oracle or is a known weak entry") {
    // weak (rows-only) entries are allowed, but must be deliberate:
    // keep this list in sync when adding non-SQL-expressible operators
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
  }

  test("emitted oracle_sql.json is parseable JSON with one key per oracle") {
    // reproduce Verify's exact escaping, then parse with the JDK's only
    // built-in JSON-ish reader: javax.script is gone, so hand-roll a
    // strict validator for the {"k":"v",...} shape Verify emits
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString("{", ",", "}")

    // strict walk of the emitted string: must be {"str":"str",...} with
    // every escape valid — i.e. exactly what python json.load accepts
    var i = 0
    def fail(msg: String): Nothing =
      throw new AssertionError(s"$msg at offset $i: ...${json.slice(i - 20, i + 20)}...")
    def skipWs(): Unit = while (i < json.length && json(i) == ' ') i += 1
    def expect(c: Char): Unit = {
      skipWs()
      if (i >= json.length || json(i) != c) fail(s"expected '$c'")
      i += 1; skipWs()
    }
    def parseString(): String = {
      expect('"'); val sb = new StringBuilder
      while (i < json.length && json(i) != '"') {
        json(i) match {
          case '\\' =>
            i += 1
            if (i >= json.length) fail("dangling backslash")
            json(i) match {
              case '"' | '\\' | '/' => sb += json(i); i += 1
              case 'n' => sb += '\n'; i += 1
              case 'r' => sb += '\r'; i += 1
              case 't' => sb += '\t'; i += 1
              case 'b' => sb += '\b'; i += 1
              case 'f' => sb += '\f'; i += 1
              case 'u' =>
                if (i + 4 >= json.length) fail("truncated \\u escape")
                val hex = json.slice(i + 1, i + 5).toString
                if (!hex.forall(c => c.isDigit || ('a' to 'f').contains(c.toLower)))
                  fail(s"bad \\u escape $hex")
                sb += Integer.parseInt(hex, 16).toChar; i += 5
              case c => fail(s"invalid escape \\$c")
            }
          case c if c < ' ' => fail(s"raw control char ${c.toInt}")
          case c => sb += c; i += 1
        }
      }
      expect('"'); sb.result()
    }
    expect('{')
    val parsed = scala.collection.mutable.Map[String, String]()
    var first = true
    while (i < json.length && json(i) != '}') {
      if (!first) expect(',')
      first = false
      val k = parseString(); expect(':')
      val v = parseString()
      parsed(k) = v
    }
    expect('}')
    assert(i == json.length, "trailing garbage after closing brace")
    assert(parsed.keySet == SparkEntry.oracleSql.keySet)
    // round-trip: unescaped values equal the originals
    SparkEntry.oracleSql.foreach { case (k, v) => assert(parsed(k) == v, s"$k round-trip") }
  }
}
