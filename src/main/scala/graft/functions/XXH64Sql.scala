package graft.functions

/** DuckDB SQL generators for Spark's XXH64 over VARIABLE-LENGTH byte
  * strings — the oracle-side mirror of `XXH64.hashUnsafeBytes` (and
  * `hashLong`), extending the round-12 fixed-8-byte chain
  * (operators/Core.scala `xxh64Sql`) to arbitrary input: little-endian
  * 8-byte words via `ord(substr(...))` (the corpus is ASCII, the same
  * byte≡char identity every byte-level oracle here relies on), the
  * 32-byte v1..v4 accumulator stage as four independent `list_reduce`
  * folds over every-4th-word sublists, the word/4-byte/byte tails, and
  * the final avalanche — all unsigned-64 wrap arithmetic over HUGEINT
  * (multiplications split the left operand in 32-bit halves so no
  * intermediate exceeds 2^97). Validated bit-exact against the JVM on
  * 105 strings of length 0..128 spanning every branch (empty, tail-only,
  * word-only, one and many 32-byte blocks).
  *
  * One Spark-specific quirk matters and is mirrored deliberately:
  * Spark's `hashUnsafeBytes` runs the word stage over the 8-aligned
  * prefix but adds the FULL length into the hash (reference xxHash adds
  * it in the same place; a naive "aligned length" mirror mismatches
  * every non-multiple-of-8 input).
  *
  * On top of the base hash: the 16-lane MinHash signature
  * (`HashFunctions.minhashSig` — lane j = hashLong(base, j), minima
  * over SIGNED longs) and the banded signature fold (Spark's
  * multi-argument `xxhash64`, seed 42, each argument rehashed with the
  * running hash as seed). These compose into full oracle pipelines for
  * the MinHash/SimHash dedup family.
  */
object XXH64Sql {

  private val M64 = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  private def mul(a: String, b: String): String =
    s"((($a) % 4294967296) * ($b) + ((($a) // 4294967296) * ($b) " +
      s"% 4294967296) * 4294967296) % $M64"

  private def rotl(x: String, r: Int): String =
    s"((($x) * ${BigInt(1) << r} + ($x) // ${BigInt(1) << (64 - r)}) % $M64)"

  private def add(xs: String*): String =
    xs.map(x => s"($x)").mkString("((", " + ", s") % $M64)")

  /** Little-endian byte-position multipliers 256^0..256^7. */
  private val WordMult =
    "[1,256,65536,16777216,4294967296,1099511627776,281474976710656," +
      "72057594037927936]::HUGEINT[]"

  private def wordExpr(p: String, k: String): String =
    s"list_sum(list_transform(generate_series(1, 8), t -> " +
      s"ord(substr($p, (8*($k) - 8 + t)::INT, 1))::HUGEINT * ($WordMult)[t]))"

  private def xxhRound(v: String, w: String): String =
    mul(rotl(add(v, mul(w, P2)), 31), P1)

  private def wordStep(h: String, w: String): String = {
    val k1 = mul(rotl(mul(w, P2), 31), P1)
    add(mul(rotl(s"xor($h, $k1)", 27), P1), P4)
  }

  private def mergeRound(h: String, v: String): String = {
    val vv = mul(rotl(mul(v, P2), 31), P1)
    add(mul(s"xor($h, $vv)", P1), P4)
  }

  /** Select layers computing hashUnsafeBytes(`p`, 42) into column
    * `base` (HUGEINT in [0, 2^64)); each layer may reference all
    * previous aliases.
    */
  private def hashBytesLayers(p: String): Seq[(String, String)] = Seq(
    // BYTES-intended strlen: hashUnsafeBytes folds UTF-8 bytes and
    // adds the BYTE length into the hash (see header for the ASCII
    // byte≡char identity the ord(substr) byte reads rely on)
    "hl" -> s"strlen($p)::HUGEINT",
    "hw" -> "hl // 8",
    "hla" -> "hw * 8",
    "hnb" -> "CASE WHEN hla >= 32 THEN (hw - 4) // 4 + 1 ELSE 0 END",
    "hws" -> s"list_transform(generate_series(1, hw::BIGINT), k -> ${wordExpr(p, "k")})") ++
    Seq((1, add("42", P1, P2)), (2, add("42", P2)), (3, "42"),
        (4, s"(42 - $P1 + $M64) % $M64")).map { case (i, init) =>
      s"hv$i" ->
        (s"CASE WHEN hla >= 32 THEN list_reduce(list_prepend(($init)::HUGEINT, " +
          s"list_transform(generate_series(0, hnb::BIGINT - 1), " +
          s"i -> hws[4*i + $i])), (v, w) -> ${xxhRound("v", "w")}) " +
          "ELSE 0::HUGEINT END")
    } ++ Seq(
    "hm0" -> add(rotl("hv1", 1), rotl("hv2", 7), rotl("hv3", 12), rotl("hv4", 18)),
    "hm1" -> mergeRound("hm0", "hv1"),
    "hm2" -> mergeRound("hm1", "hv2"),
    "hm3" -> mergeRound("hm2", "hv3"),
    "hm4" -> mergeRound("hm3", "hv4"),
    // the Spark quirk: full length added, word stage ran on the prefix
    "hh0" -> add(s"CASE WHEN hla >= 32 THEN hm4 ELSE (42 + $P5) % $M64 END", "hl"),
    "hh1" -> ("list_reduce(list_prepend(hh0, hws[(4*hnb + 1)::BIGINT : hw::BIGINT]), " +
      s"(h, w) -> ${wordStep("h", "w")})"),
    "hh2" -> {
      val tail4 = s"list_sum(list_transform(generate_series(1, 4), t -> " +
        s"ord(substr($p, (hla + t)::INT, 1))::HUGEINT * ($WordMult)[t]))"
      s"CASE WHEN hl - hla >= 4 THEN " +
        add(mul(rotl(s"xor(hh1, ${mul(tail4, P1)})", 23), P2), P3) +
        " ELSE hh1 END"
    },
    "hoff" -> "hla + CASE WHEN hl - hla >= 4 THEN 4 ELSE 0 END",
    "hh3" -> ("list_reduce(list_prepend(hh2, list_transform(" +
      s"generate_series((hoff + 1)::BIGINT, hl::BIGINT), " +
      s"t -> ord(substr($p, t::INT, 1))::HUGEINT)), " +
      s"(h, b) -> ${add(mul(rotl(s"xor(h, ${mul("b", P5)})", 11), P1))})"),
    "hf1" -> "xor(hh3, hh3 // 8589934592)", // >> 33
    "hf2" -> mul("hf1", P2),
    "hf3" -> s"xor(hf2, hf2 // ${BigInt(1) << 29})",
    "hf4" -> mul("hf3", P3),
    "base" -> s"xor(hf4, hf4 // ${BigInt(1) << 32})")

  /** The 16 MinHash lanes (hashLong(base, j), j = 0..15) as a HUGEINT
    * list column `lanes` — the expensive value-only k1 stage is shared
    * across lanes, and each avalanche step is a linear list layer (no
    * expression-tree blowup).
    */
  private def laneLayers: Seq[(String, String)] = {
    val h0 = s"((j + $P5 + 8) % $M64)"
    val h3 = add(mul(rotl(s"xor($h0, lk1)", 27), P1), P4)
    Seq(
      "lk1" -> mul(rotl(mul("base", P2), 31), P1),
      "ln0" -> s"list_transform(generate_series(0, 15), j -> $h3)",
      "ln1" -> s"list_transform(ln0, x -> xor(x, x // ${BigInt(1) << 33}))",
      "ln2" -> s"list_transform(ln1, x -> ${mul("x", P2)})",
      "ln3" -> s"list_transform(ln2, x -> xor(x, x // ${BigInt(1) << 29}))",
      "ln4" -> s"list_transform(ln3, x -> ${mul("x", P3)})",
      "lanes" -> s"list_transform(ln4, x -> xor(x, x // ${BigInt(1) << 32}))")
  }

  private def layersSelect(layers: Seq[(String, String)],
      baseSelect: String, from: String): String =
    layers.foldLeft(s"SELECT $baseSelect FROM $from") { case (sql, (a, e)) =>
      s"SELECT *, ($e) AS $a FROM ($sql) t_$a"
    }

  /** SELECT `id`, base FROM `from` — one base hash per row of `from`
    * (which must expose columns `id` and `p`).
    */
  def baseSelect(id: String, p: String, from: String): String =
    s"SELECT $id, base FROM (" +
      layersSelect(hashBytesLayers(p), s"$id, $p", from) + ") zb"

  /** SELECT `id`, lanes FROM `from` — the 16-lane signature per row. */
  def lanesSelect(id: String, p: String, from: String): String =
    s"SELECT $id, lanes FROM (" +
      layersSelect(hashBytesLayers(p) ++ laneLayers, s"$id, $p", from) + ") zl"

  /** Spark `hashLong(v, h)` fully inlined (for short folds only — the
    * avalanche doubles the expression per step).
    */
  def hashLongInline(v: String, h: String): String = {
    val h0 = s"(($h + $P5 + 8) % $M64)"
    val k1 = mul(rotl(mul(v, P2), 31), P1)
    val h3 = add(mul(rotl(s"xor($h0, $k1)", 27), P1), P4)
    val f1 = s"xor(($h3), ($h3) // ${BigInt(1) << 33})"
    val f2 = mul(f1, P2)
    val f3 = s"xor(($f2), ($f2) // ${BigInt(1) << 29})"
    val f4 = mul(f3, P3)
    s"xor(($f4), ($f4) // ${BigInt(1) << 32})"
  }

  /** CTE chain `<x>lh, <x>lv, <x>msig, <x>bv, <x>bsig` computing the
    * banded MinHash signatures of a (id, sh LIST<VARCHAR>) sets CTE:
    * per-element base hash + 16 lanes, per-id SIGNED lane minima (the
    * JVM kernel compares signed longs), then per band the chained
    * multi-argument xxhash64 fold (seed 42) over the band's lanes.
    */
  def bandSigCtes(x: String, setsCte: String, id: String,
      bands: Int, rowsPerBand: Int): String = {
    val unsig = s"(CASE WHEN v < 0 THEN v::HUGEINT + $M64 ELSE v::HUGEINT END)"
    s"""${x}sh AS (SELECT $id, unnest(sh) AS sh FROM $setsCte),
       |${x}lh AS MATERIALIZED (${lanesSelect(id, "sh", s"${x}sh")}),
       |${x}lv AS (
       |  SELECT $id, j, v FROM (
       |    SELECT $id, unnest(list_transform(generate_series(1, 16),
       |      i -> {'j': i, 'v': CASE WHEN lanes[i] >= 9223372036854775808::HUGEINT
       |             THEN (lanes[i] - $M64)::BIGINT ELSE (lanes[i])::BIGINT END}),
       |      recursive := true)
       |    FROM ${x}lh) q),
       |${x}msig AS MATERIALIZED (
       |  SELECT $id, j, min(v) AS v FROM ${x}lv GROUP BY $id, j),
       |${x}bv AS (
       |  SELECT $id, (j - 1) // $rowsPerBand AS band,
       |    list($unsig ORDER BY j) AS lv
       |  FROM ${x}msig GROUP BY $id, (j - 1) // $rowsPerBand),
       |${x}bsig AS MATERIALIZED (
       |  SELECT $id, band,
       |    list_reduce(list_prepend(42::HUGEINT, lv),
       |      (h, v) -> ${hashLongInline("v", "h")}) AS sig
       |  FROM ${x}bv)""".stripMargin
  }

  /** Re-banding CTEs `<x>bv, <x>bsig` over an EXISTING `<from>msig`
    * lane table (the lsh_tune sweep: one signature, many bandings).
    */
  def rebandCtes(x: String, msigCte: String, id: String,
      rowsPerBand: Int): String = {
    val unsig = s"(CASE WHEN v < 0 THEN v::HUGEINT + $M64 ELSE v::HUGEINT END)"
    s"""${x}bv AS (
       |  SELECT $id, (j - 1) // $rowsPerBand AS band,
       |    list($unsig ORDER BY j) AS lv
       |  FROM $msigCte GROUP BY $id, (j - 1) // $rowsPerBand),
       |${x}bsig AS MATERIALIZED (
       |  SELECT $id, band,
       |    list_reduce(list_prepend(42::HUGEINT, lv),
       |      (h, v) -> ${hashLongInline("v", "h")}) AS sig
       |  FROM ${x}bv)""".stripMargin
  }
}
