package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Additional oracle-checked families beyond SURVEY §2.B: cryptographic
  * hashes, bitwise ops, extended string functions, distribution window
  * functions, and the custom Generator (UDTF) — all Spark built-ins except
  * graft_shingles.
  */
object ExtraQueries {

  /** Custom UDTF: 3-token shingles via the graft_shingles Generator. */
  val textShingles = QueryDef(
    "q_text_shingles",
    (s, dir) =>
      Tables.documents(s, dir)
        .selectExpr("doc_id", "graft_shingles(split(text, ' '), 3) AS shingle")
        .orderBy("doc_id", "shingle"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      SELECT doc_id,
             unnest(list_transform(range(len(toks) - 2),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
      FROM t
      ORDER BY doc_id, shingle
    """.trim),
  )

  /** Cryptographic hash family (hex-string outputs are engine-independent). */
  val fnHash = QueryDef(
    "q_fn_hash",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("text_md5"),
          sha2(col("text").cast("binary"), 256).as("text_sha256"),
          length(md5(col("text").cast("binary"))).as("md5_len"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             md5(text) AS text_md5,
             sha256(text) AS text_sha256,
             CAST(length(md5(text)) AS INTEGER) AS md5_len
      FROM documents ORDER BY doc_id
    """.trim),
  )

  /** Bitwise family over integer keys. */
  val fnBitwise = QueryDef(
    "q_fn_bitwise",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("l_orderkey & 255").as("and_255"),
          expr("l_orderkey | 15").as("or_15"),
          expr("l_orderkey ^ l_partkey").as("xor_part"),
          expr("shiftleft(l_linenumber, 3)").as("shl_3"),
          expr("shiftright(l_orderkey, 2)").as("shr_2"),
          expr("CAST(bit_count(l_orderkey) AS INTEGER)").as("popcount"))
        // duplicate (l_orderkey, l_linenumber) keys exist — xor_part breaks ties
        .orderBy("l_orderkey", "l_linenumber", "xor_part"),
    Some("""
      SELECT l_orderkey, l_linenumber,
             l_orderkey & 255 AS and_255,
             l_orderkey | 15 AS or_15,
             xor(l_orderkey, l_partkey) AS xor_part,
             CAST(l_linenumber << 3 AS INTEGER) AS shl_3,
             l_orderkey >> 2 AS shr_2,
             CAST(bit_count(l_orderkey) AS INTEGER) AS popcount
      FROM lineitem ORDER BY l_orderkey, l_linenumber, xor_part
    """.trim),
  )

  /** Extended string family: initcap/lpad/rpad/translate/reverse/repeat/
    * split_part/levenshtein.
    */
  val fnString2 = QueryDef(
    "q_fn_string2",
    (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          initcap(col("p_name")).as("name_title"),
          lpad(col("p_brand"), 12, "*").as("brand_lpad"),
          rpad(col("p_type"), 10, ".").as("type_rpad"),
          translate(col("p_name"), "aeiou", "AEIOU").as("name_vowels"),
          reverse(col("p_name")).as("name_rev"),
          repeat(col("p_brand"), 2).as("brand_x2"),
          expr("split_part(p_name, ' ', 1)").as("first_word"),
          levenshtein(col("p_name"), col("p_type")).as("name_type_lev"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
             -- DuckDB initcap is not a builtin; title-case the two-word names manually
             upper(p_name[1]) || p_name[2:strpos(p_name, ' ')] ||
               upper(p_name[strpos(p_name, ' ')+1]) || p_name[strpos(p_name, ' ')+2:] AS name_title,
             lpad(p_brand, 12, '*') AS brand_lpad,
             rpad(p_type, 10, '.') AS type_rpad,
             translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
             reverse(p_name) AS name_rev,
             repeat(p_brand, 2) AS brand_x2,
             split_part(p_name, ' ', 1) AS first_word,
             CAST(levenshtein(p_name, p_type) AS INTEGER) AS name_type_lev
      FROM part ORDER BY p_partkey
    """.trim),
  )

  /** Distribution window functions: ntile / percent_rank / cume_dist (all
    * exact integer ratios → identical doubles).
    */
  val winDist = QueryDef(
    "q_win_dist",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority").orderBy(asc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderpriority,
             CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
             PERCENT_RANK() OVER w AS pct_rank,
             CUME_DIST() OVER w AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
      ORDER BY o_orderkey
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(textShingles, fnHash, fnBitwise, fnString2, winDist)
}
