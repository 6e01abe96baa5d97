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
    * fits int128); the xor touches only the low byte. `ord` equals the
    * folded byte ONLY for ASCII (the JVM side folds UTF-8 bytes; `ord`
    * yields code points), so the base case GUARDS the assumption: any
    * item where the char count differs from the UTF-8 byte count —
    * i.e. any non-ASCII item — makes the oracle fail loudly with
    * `error(...)` instead of silently reporting a false hash mismatch.
    */
  def fnvFold(items: String): String =
    s"""f(doc_id, i, ci, ck) AS (
       |  SELECT doc_id, i, 0, CAST('1469598103934665603' AS HUGEINT)
       |  FROM $items
       |  WHERE CASE WHEN strlen(t) <> octet_length(encode(t))
       |        THEN error('non-ASCII item: FNV oracle fold is char-based')
       |        ELSE true END
       |  UNION ALL
       |  SELECT f.doc_id, f.i, f.ci + 1,
       |    ((f.ck // 256) * 256
       |      + xor(CAST(f.ck % 256 AS BIGINT),
       |            CAST(ord(substr(t.t, f.ci + 1, 1)) AS BIGINT)))
       |    * 1099511628211 % CAST('18446744073709551616' AS HUGEINT)
       |  FROM f JOIN $items t ON f.doc_id = t.doc_id AND f.i = t.i
       |  WHERE f.ci < strlen(t.t)),
       |done AS (
       |  SELECT f.doc_id, f.i, CAST(f.ck AS UBIGINT) AS h
       |  FROM f JOIN $items t ON f.doc_id = t.doc_id AND f.i = t.i
       |  WHERE f.ci = strlen(t.t))""".stripMargin
}
