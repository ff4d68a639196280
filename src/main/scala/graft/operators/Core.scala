package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core row operations — potpot's intended key/value semantics
  * re-expressed as declarative Spark plans.
  *
  * Reference surface (see SURVEY.md §2.1):
  *  - `query::get(i32) -> Row` (reference `src/query.rs:7-9`): point
  *    lookup by key → an equality filter that Catalyst pushes into the
  *    Parquet scan (`PushedFilters: [EqualTo(l_orderkey,42)]`), so at
  *    cluster scale only row groups whose min/max straddle the key are
  *    read.
  *  - `query::insert(&Row)` (reference `src/query.rs:3-5`): append of
  *    typed rows → `UNION ALL` of the table with new tuples (the write
  *    path itself is `df.write.mode("append")`; the query shows the
  *    post-insert read view).
  *  - Seeded xxHash64 (`src/hashtable.rs:65-80`) and CRC32
  *    (`src/aligned.rs:61-64`) are Spark built-ins (`xxhash64`,
  *    `crc32`) — codegen'd, no UDF.
  *  - `Text` ≤1024-byte validation (`src/types.rs:16,33`) → an
  *    `octet_length` predicate.
  */
object Core {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // potpot get(key): point lookup. Filter reaches the Parquet scan.
    "q_point_get" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") === 42L)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_returnflag")
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"))),

    // Key-range scan: BETWEEN predicate, pushed down + row-group pruned.
    "q_key_range" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey").between(100L, 120L))
        .orderBy(col("o_orderkey"))),

    // potpot insert(row): the read view after appending typed rows.
    "q_insert_append" -> ((s, d) => {
      import s.implicits._
      val inserted = Seq((5, "VIRTUAL_A"), (6, "VIRTUAL_B"))
        .toDF("r_regionkey", "r_name")
      Tables.region(s, d).select("r_regionkey", "r_name")
        .unionByName(inserted)
        .orderBy(col("r_regionkey"), col("r_name"))
    }),

    // potpot Text<=1024-byte constraint as a validation predicate.
    "q_text_cap" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          octet_length(col("text")).cast("long").as("text_bytes"),
          (octet_length(col("text")) <= 1024).as("fits_potpot_text"))
        .orderBy(col("doc_id"))),

    // potpot's seeded xxHash64: the builtin (fixed seed 42) plus the
    // xxh64_seeded kernel with an explicit per-index seed — the
    // reference's hasher design (src/hashtable.rs:95-96); the slot is
    // the seeded hash mod the 511-slot capacity. No DuckDB oracle (no
    // xxhash64 there) → rows-only check.
    "q_hash_xxh64" -> ((s, d) => {
      graft.functions.HashFunctions.register(s)
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          xxhash64(col("o_orderkey")).as("key_hash"),
          lit(7L).as("seed"),
          expr("xxh64_seeded(o_orderkey, 7)").as("key_hash_seeded"),
          pmod(expr("xxh64_seeded(o_orderkey, 7)"), lit(511L)).as("slot"))
        .orderBy(col("o_orderkey"))
    }),

    // potpot's CRC32 page checksum — Spark built-in over record bytes.
    "q_hash_crc32" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          crc32(col("p_name").cast("binary")).as("name_crc"))
        .orderBy(col("p_partkey")))
  )

  val oracle: Map[String, String] = Map(
    "q_point_get" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
        |       l_extendedprice, l_returnflag
        |FROM lineitem WHERE l_orderkey = 42
        |ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice""".stripMargin,
    "q_key_range" ->
      "SELECT * FROM orders WHERE o_orderkey BETWEEN 100 AND 120 ORDER BY o_orderkey",
    "q_insert_append" ->
      """SELECT r_regionkey, r_name FROM region
        |UNION ALL SELECT * FROM (VALUES (5, 'VIRTUAL_A'), (6, 'VIRTUAL_B')) v(r_regionkey, r_name)
        |ORDER BY r_regionkey, r_name""".stripMargin,
    "q_text_cap" ->
      """SELECT doc_id, n_chars, CAST(strlen(text) AS BIGINT) AS text_bytes,
        |       strlen(text) <= 1024 AS fits_potpot_text
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
