package graft.functions

/** Canonical DuckDB CTE fragments for the FNV-replay oracles. One copy
  * of the byte fold exists here; every sketch oracle (SimHash, MinHash,
  * the hashing-trick embedder — and the multimodal checksum is the same
  * arithmetic) composes these, so a fix to the fold (e.g. byte handling
  * for non-ASCII text) cannot leave the oracles disagreeing with each
  * other.
  *
  * Contract: an ITEMS relation has columns (doc_id, i, t) — one string
  * `t` to fold per (doc_id, i). [[fnvFold]] appends the recursive fold
  * and yields `done(doc_id, i, h UBIGINT)` where h = FNV-1a(t) mod 2^64
  * (the repo's constants; see TextSketches.FnvBasis/FnvPrime).
  */
object OracleSql {

  /** Space-split tokens of `src`(doc_id, text) as an items relation
    * named `tok` — empty tokens from consecutive/leading separators are
    * kept, matching Spark's `split(text, " ")`.
    */
  def tokenItems(src: String): String =
    s"""dd AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       |ti AS (SELECT doc_id, w, unnest(range(len(w))) AS i FROM dd),
       |tok AS (SELECT doc_id, i, w[i+1] AS t FROM ti)""".stripMargin

  /** Word 3-shingles of `src`(doc_id, text) as an items relation named
    * `sg` — array_to_string slice semantics, identical to
    * TextSketches.buildShingle (empty words keep their separator, words
    * past the end are skipped).
    */
  def shingleItems(src: String): String =
    s"""dd AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       |sl AS (SELECT doc_id,
       |         list_transform(range(greatest(len(w) - 2, 1)),
       |                        i -> array_to_string(w[i+1:i+3], ' ')) AS sh
       |       FROM dd),
       |si AS (SELECT doc_id, sh, unnest(range(len(sh))) AS i FROM sl),
       |sg AS (SELECT doc_id, i, sh[i+1] AS t FROM si)""".stripMargin

  /** The FNV-1a fold: one byte per recursion step, checksum carried as
    * HUGEINT mod 2^64 (ck < 2^64 and the prime < 2^41, so the product
    * fits int128); the xor touches only the low byte.
    *
    * The fold is over TRUE UTF-8 BYTES, exactly like the JVM side
    * (TextSketches.fnv1a64): each item's bytes arrive as `hex(encode(t))`
    * and the recursion decodes two hex digits per step — so the sketch
    * oracles are byte-exact on ANY corpus, not just ASCII (validated by
    * the `t_fingerprint_fnv_unicode` canary row).
    */
  def fnvFold(items: String): String =
    s"""hx AS (
       |  SELECT doc_id, i, hex(encode(t)) AS hxs,
       |         octet_length(encode(t)) AS nb
       |  FROM $items),
       |f(doc_id, i, ci, ck) AS (
       |  SELECT doc_id, i, 0, CAST('1469598103934665603' AS HUGEINT)
       |  FROM hx
       |  UNION ALL
       |  SELECT f.doc_id, f.i, f.ci + 1,
       |    ((f.ck // 256) * 256
       |      + xor(CAST(f.ck % 256 AS BIGINT),
       |            (strpos('0123456789ABCDEF',
       |               substr(t.hxs, 2 * f.ci + 1, 1)) - 1) * 16
       |            + strpos('0123456789ABCDEF',
       |               substr(t.hxs, 2 * f.ci + 2, 1)) - 1))
       |    * 1099511628211 % CAST('18446744073709551616' AS HUGEINT)
       |  FROM f JOIN hx t ON f.doc_id = t.doc_id AND f.i = t.i
       |  WHERE f.ci < t.nb),
       |done AS (
       |  SELECT f.doc_id, f.i, CAST(f.ck AS UBIGINT) AS h
       |  FROM f JOIN hx t ON f.doc_id = t.doc_id AND f.i = t.i
       |  WHERE f.ci = t.nb)""".stripMargin

  // 2^64 and 2^63: MUST go through a string cast — a bare integer
  // literal this size parses as DOUBLE and silently degrades the whole
  // expression to float arithmetic
  private val U64 = "CAST('18446744073709551616' AS HUGEINT)"
  private val S63 = "9223372036854775808"

  /** `u xor (u >> 33)` over an unsigned-64 HUGEINT column `u`: the xor
    * runs on the signed-BIGINT two's-complement view (bit-identical to
    * unsigned xor; the shifted operand is < 2^31 so its views agree),
    * then converts back to the unsigned HUGEINT range.
    */
  private def xorShift33(src: String): String =
    s"""(SELECT doc_id, i,
       |   CASE WHEN x < 0 THEN CAST(x AS HUGEINT) + $U64
       |        ELSE CAST(x AS HUGEINT) END AS u
       | FROM (SELECT doc_id, i,
       |   xor(CAST(CASE WHEN u >= CAST('$S63' AS HUGEINT) THEN u - $U64
       |            ELSE u END AS BIGINT),
       |       CAST(u // 8589934592 AS BIGINT)) AS x FROM $src AS s) AS x1)"""
      .stripMargin

  /** `(u * C) mod 2^64` in 32-bit halves, so no intermediate exceeds
    * int128: u·C ≡ b·d + ((a·d + b·c) mod 2^32)·2^32 with u = a·2^32+b,
    * C = c·2^32+d.
    */
  private def mulMod64(src: String, c: Long, d: Long): String =
    s"""(SELECT doc_id, i,
       |   (u % 4294967296 * $d
       |    + (u // 4294967296 * $d + u % 4294967296 * $c) % 4294967296
       |      * 4294967296) % $U64 AS u
       | FROM $src AS s)""".stripMargin

  /** MurmurHash3 fmix64 finalizer over `done(doc_id, i, h)`, replayed
    * step-for-step: yields `mixed(doc_id, i, u)` with u = fmix64(h) as
    * unsigned-64 HUGEINT (the item index i rides along, so multi-item
    * folds — e.g. the Count-Min per-row hashes — stay addressable). The
    * JVM twin is TextSketches.fmix64; constants 0xff51afd7ed558ccd and
    * 0xc4ceb9fe1a85ec53 appear as their 32-bit halves.
    */
  def fmix64: String = {
    val m0 = "(SELECT doc_id, i, CAST(h AS HUGEINT) AS u FROM done)"
    val m1 = xorShift33(m0)
    val m2 = mulMod64(m1, 4283543511L, 3981806797L) // 0xff51afd7, 0xed558ccd
    val m3 = xorShift33(m2)
    val m4 = mulMod64(m3, 3301882366L, 444984403L) // 0xc4ceb9fe, 0x1a85ec53
    val m5 = xorShift33(m4)
    s"mixed AS (SELECT doc_id, i, u FROM $m5 t)"
  }
}
