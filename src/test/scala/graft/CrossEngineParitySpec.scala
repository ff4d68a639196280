package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine parity pins (round-15 audit): every oracle in this
  * repo asserts Spark-result == DuckDB-result, so any SEMANTIC
  * difference between the engines' scalar functions is a latent
  * correctness bug that the ASCII/benign driver corpus can mask —
  * the chars-vs-bytes (length vs strlen) class was caught exactly
  * this way in round 14.
  *
  * Each test drives a HOSTILE fixture through the Spark side and pins
  * the exact value DuckDB also produces. The DuckDB half runs LIVE
  * every round as the `q_engine_parity` oracle (operators/Core.scala)
  * — the driver gate hash-compares both engines on these same
  * fixtures, so semantic drift in either engine fails there; this
  * suite additionally pins today's agreed values as committed
  * constants (so a drift is attributable to a specific engine, not
  * just detected). Classes where the engines genuinely diverge are
  * pinned to Spark's behavior with the non-exposure argument in the
  * comment; the class-by-class table lives in BASELINE.md
  * ("Cross-engine parity").
  */
class CrossEngineParitySpec extends AnyFunSuite {
  private def spark = SparkSpec.spark
  private def row1(exprs: String*) = {
    val s = spark
    s.sql(s"SELECT ${exprs.mkString(", ")}").collect().head
  }

  test("integer division and modulo at negative operands (div vs //)") {
    // both engines TRUNCATE toward zero ((-7)//2 = -3 in DuckDB, not
    // floor's -4) and give % the dividend's sign — so oracle `//`
    // mirrors Spark `div` even on negatives. The pmod idiom the
    // hash oracles use (((x % n) + n) % n) is then exact by identity.
    val r = row1("-7 div 2", "7 div -2", "-7 % 2", "7 % -2",
      "pmod(-7, 511)")
    assert(r.getLong(0) == -3L) // DuckDB (-7) // 2 = -3
    assert(r.getLong(1) == -3L) // DuckDB 7 // (-2) = -3
    assert(r.getInt(2) == -1)   // DuckDB (-7) % 2 = -1
    assert(r.getInt(3) == 1)    // DuckDB 7 % (-2) = 1
    assert(r.getInt(4) == 504)  // DuckDB ((-7 % 511) + 511) % 511
  }

  test("split edge cases: empty input, adjacent separators, full match") {
    // Spark split(str, re) uses Java's limit=-1 semantics (trailing
    // empties kept); DuckDB string_split matches all three shapes
    val r = row1("split('', ' ')", "split('a  b', ' ')", "split('a', 'a')")
    assert(r.getSeq[String](0) == Seq(""))          // DuckDB [''], len 1
    assert(r.getSeq[String](1) == Seq("a", "", "b")) // DuckDB ['a','','b']
    assert(r.getSeq[String](2) == Seq("", ""))       // DuckDB ['','']
  }

  test("md5 over non-ASCII: cast-to-binary equals DuckDB's varchar md5") {
    // Spark md5(CAST(s AS BINARY)) hashes the UTF-8 bytes; DuckDB
    // md5(VARCHAR) hashes the string's bytes, which ARE UTF-8 —
    // equal for every valid string. Invalid UTF-8 cannot exist in a
    // Spark string column (the source decode replaces it), so the
    // remaining divergence class (md5 of invalid bytes) is
    // non-exposed by construction; binary columns hash raw bytes on
    // both engines.
    val r = row1("md5(CAST('héé' AS BINARY))", "md5(CAST('' AS BINARY))")
    assert(r.getString(0) == "c2508ce308ae1c9d9d5d1ec023a342d8")
    assert(r.getString(1) == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("codepoint lengths agree; char splitting is codepoint-aware in both") {
    // length(): both engines count CODEPOINTS (emoji = 1), so the
    // chars-intended oracles (length <-> length) hold beyond the BMP.
    // split(s, '') was the SUSPECTED divergence (a Java String.split
    // would yield UTF-16 surrogate halves) — measured here as
    // refuted: Spark 4's split walks codepoints like DuckDB's substr,
    // so the char-level tokenizer oracles (Bpe.scala) hold beyond the
    // BMP too. The pin keeps the measurement: a regression to
    // code-unit splitting in either engine fails this test.
    val r = row1("length('a😀b')", "split('😀', '')",
      "split('a😀b', '')", "length('héé')")
    assert(r.getInt(0) == 3)  // DuckDB length('a😀b') = 3
    assert(r.getSeq[String](1) == Seq("😀"))         // one codepoint, not
    assert(r.getSeq[String](2) == Seq("a", "😀", "b")) // two surrogates
    assert(r.getInt(3) == 3)  // DuckDB length('héé') = 3
  }

  test("round on DOUBLE: shortest-decimal then half-away, both engines") {
    // the 9-decimal rank keys (q_pref_pairs/q_dedup_embed) and every
    // round()-published metric rely on identical tie behavior. Both
    // engines round the double's SHORTEST DECIMAL representation
    // (2.675d prints as "2.675" and rounds to 2.68 even though the
    // nearest double is 2.67499…), and halves go away from zero
    // including at negative inputs and exact binary halves (0.125).
    val r = row1("round(CAST(2.5 AS DOUBLE))", "round(CAST(-2.5 AS DOUBLE))",
      "round(CAST(2.675 AS DOUBLE), 2)", "round(CAST(0.125 AS DOUBLE), 2)")
    assert(r.getDouble(0) == 3.0)   // DuckDB 3.0
    assert(r.getDouble(1) == -3.0)  // DuckDB -3.0
    assert(r.getDouble(2) == 2.68)  // DuckDB 2.68
    assert(r.getDouble(3) == 0.13)  // DuckDB 0.13
  }

  test("regex: the Java-vs-RE2 agreeing core (round-16 audit)") {
    // both engines default \d and \w to ASCII (Unicode digit '٣' and
    // letter 'é' match in NEITHER; '_' is \w in both), support lazy
    // quantifiers, $ inside alternation, 1-based capture groups,
    // inline (?i), and count/replace all matches identically (Spark's
    // replace-all default = DuckDB's 'g' flag). The \s agreeing core
    // is [ \t\n\f\r]. The two MEASURED divergences are pinned to
    // Spark behavior here with the non-exposure argument in
    // operators/Core.scala's q_engine_parity comment: Java '$' also
    // matches before a FINAL newline (RE2: end of text only), and
    // Java \s additionally contains \x0B.
    val r = row1("'٣' rlike '\\\\d'", "'é' rlike '\\\\w'",
      "'_' rlike '\\\\w'", "regexp_extract('aaa', 'a+?', 0)",
      "regexp_extract('xaby', 'a(b|$)', 1)",
      "regexp_extract('a1b22c', '(\\\\d)(\\\\d)', 2)",
      "'abc' rlike '(?i)ABC'",
      "regexp_replace('a1b22c', '\\\\d+', '#')",
      "size(regexp_extract_all('x1y22z333', '[0-9]+', 0))",
      // the two documented divergences, pinned to the Spark side so a
      // JAVA behavior change is also attributable
      "regexp_extract('ab\\n', 'b$', 0)",
      "'' rlike '\\\\s'")
    assert(!r.getBoolean(0))            // DuckDB false
    assert(!r.getBoolean(1))            // DuckDB false
    assert(r.getBoolean(2))             // DuckDB true
    assert(r.getString(3) == "a")       // DuckDB 'a'
    assert(r.getString(4) == "b")       // DuckDB 'b'
    assert(r.getString(5) == "2")       // DuckDB '2'
    assert(r.getBoolean(6))             // DuckDB true
    assert(r.getString(7) == "a#b#c")   // DuckDB (with 'g') 'a#b#c'
    assert(r.getInt(8) == 3)            // DuckDB len(...) = 3
    assert(r.getString(9) == "b")       // DuckDB: '' — divergent, non-exposed
    assert(r.getBoolean(10))            // DuckDB: false — divergent, non-exposed
  }

  test("timestamps: invalid dates, pre-epoch micros, week/iso-dow laws (round-16 audit)") {
    // UTC sessions on both engines. try_cast of impossible calendar
    // dates is NULL in both (DuckDB TRY_CAST); epoch micros are exact
    // at negative (pre-epoch) values down to the int64-ns deep end;
    // date_trunc('week') is Monday-start on both below the epoch; the
    // ISO day-of-week LAW is Spark weekday()+1 == DuckDB isodow —
    // raw dayofweek() is off by one between engines (Spark Thu=5,
    // DuckDB Thu=4) and must never appear unmapped in an oracle.
    val r = row1("try_cast('2024-02-30' as date)",
      "try_cast('2024-13-01' as date)",
      "unix_micros(timestamp'1969-12-31 23:59:59.000001')",
      "unix_micros(timestamp'1677-09-21 00:12:43.145224')",
      "cast(cast(date_trunc('week', date'1969-12-28') as date) as string)",
      "weekday(date'1970-01-01') + 1",
      "cast(to_date('29-Feb-2024', 'dd-MMM-yyyy') as string)",
      "cast(timestamp_micros(-1) as string)",
      "date_format(timestamp'1969-12-31 23:59:59', 'yyyy-MM-dd HH:mm:ss')",
      "cast(cast(timestamp'1969-12-31 12:00:00' as date) as string)",
      "dayofweek(date'1970-01-01')")
    assert(r.isNullAt(0))                          // DuckDB NULL
    assert(r.isNullAt(1))                          // DuckDB NULL
    assert(r.getLong(2) == -999999L)               // DuckDB -999999
    assert(r.getLong(3) == -9223372036854776L)     // DuckDB equal
    assert(r.getString(4) == "1969-12-22")         // DuckDB '1969-12-22'
    assert(r.getInt(5) == 4)                       // DuckDB isodow = 4
    assert(r.getString(6) == "2024-02-29")         // DuckDB strptime %d-%b-%Y
    assert(r.getString(7) == "1969-12-31 23:59:59.999999") // make_timestamp(-1)
    assert(r.getString(8) == "1969-12-31 23:59:59") // strftime equal
    assert(r.getString(9) == "1969-12-31")         // DuckDB equal
    assert(r.getInt(10) == 5)                      // DuckDB dayofweek = 4 — OFF
                                                   // BY ONE, the unmapped trap
  }

  test("timezone/DST: named-zone conversion agreeing core (round-17 audit)") {
    // java.time (Spark) vs ICU (DuckDB), both on the IANA tzdb. The
    // agreeing core measured this round: conversion both directions,
    // the spring-forward boundary (the 02:xx hour never appears as
    // output), both fall-back UTC instants collapsing onto the same
    // 01:30 wall time, the NONEXISTENT local 02:30 shifting forward by
    // the gap in both engines, instant-exact zone roundtrips, and
    // sub-hour offsets (+10:30 Adelaide, +5:45 Kathmandu). The ONE
    // measured divergence is pinned at the bottom to Spark's side: an
    // AMBIGUOUS wall time (fall-back 01:30) resolves to the EARLIER
    // offset in java.time (EDT → 05:30Z) and the LATER in ICU (EST →
    // 06:30Z). Non-exposure: both engines run UTC sessions and every
    // ts column is naive UTC — no oracle converts local wall-clock
    // data in a DST zone, so only q_engine_parity's pinned core may
    // use these functions (the md5-invalid-bytes precedent).
    val r = row1(
      "cast(from_utc_timestamp(timestamp'2024-01-15 12:00:00', 'America/New_York') as string)",
      "cast(from_utc_timestamp(timestamp'2024-07-15 12:00:00', 'America/New_York') as string)",
      "cast(from_utc_timestamp(timestamp'2024-03-10 06:59:59', 'America/New_York') as string)",
      "cast(from_utc_timestamp(timestamp'2024-03-10 07:00:00', 'America/New_York') as string)",
      "cast(from_utc_timestamp(timestamp'2024-11-03 05:30:00', 'America/New_York') as string)",
      "cast(from_utc_timestamp(timestamp'2024-11-03 06:30:00', 'America/New_York') as string)",
      "cast(to_utc_timestamp(timestamp'2024-01-15 07:00:00', 'America/New_York') as string)",
      "cast(to_utc_timestamp(timestamp'2024-03-10 02:30:00', 'America/New_York') as string)",
      "unix_micros(to_utc_timestamp(from_utc_timestamp(timestamp'2024-03-10 07:00:00', 'America/New_York'), 'America/New_York'))",
      "cast(cast(from_utc_timestamp(timestamp'2024-01-15 20:00:00', 'Asia/Tokyo') as date) as string)",
      "cast(from_utc_timestamp(timestamp'2024-01-15 12:00:00', 'Australia/Adelaide') as string)",
      "cast(from_utc_timestamp(timestamp'2024-01-15 12:00:00', 'Asia/Kathmandu') as string)",
      // the documented divergence, pinned to the Spark side
      "cast(to_utc_timestamp(timestamp'2024-11-03 01:30:00', 'America/New_York') as string)")
    assert(r.getString(0) == "2024-01-15 07:00:00")  // DuckDB equal (EST −5)
    assert(r.getString(1) == "2024-07-15 08:00:00")  // DuckDB equal (EDT −4)
    assert(r.getString(2) == "2024-03-10 01:59:59")  // DuckDB equal
    assert(r.getString(3) == "2024-03-10 03:00:00")  // DuckDB equal — 02:xx skipped
    assert(r.getString(4) == "2024-11-03 01:30:00")  // DuckDB equal (EDT side)
    assert(r.getString(5) == "2024-11-03 01:30:00")  // DuckDB equal (EST side)
    assert(r.getString(6) == "2024-01-15 12:00:00")  // DuckDB equal
    assert(r.getString(7) == "2024-03-10 07:30:00")  // DuckDB equal — gap shifts fwd
    assert(r.getLong(8) == 1710054000000000L)        // DuckDB equal — exact instant
    assert(r.getString(9) == "2024-01-16")           // DuckDB equal — next day in JST
    assert(r.getString(10) == "2024-01-15 22:30:00") // DuckDB equal (+10:30)
    assert(r.getString(11) == "2024-01-15 17:45:00") // DuckDB equal (+5:45)
    assert(r.getString(12) == "2024-11-03 05:30:00") // DuckDB: 06:30:00 — DIVERGENT,
                                                     // non-exposed (UTC sessions)
  }
}
