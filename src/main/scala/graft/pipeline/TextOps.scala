package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingles, cross-engine hashing, MinHash signatures,
  * SimHash, language-ID heuristics, quality scoring, fingerprints.
  *
  * Everything here is a composition of Spark's codegen'd built-ins (no UDFs,
  * no JVM-side loops): higher-order array functions keep the hot path inside
  * whole-stage codegen and scale linearly with tokens per row. Each op has a
  * DuckDB-SQL twin used by the oracle queries — hashing is md5-prefix based
  * so both engines agree bit-for-bit.
  */
object TextOps {

  /** Lowercased whitespace tokens. DuckDB twin:
    * string_split_regex(lower(x), '\s+') */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** GPT-2-style pre-tokenizer pieces: contraction suffixes, optionally
    * space-prefixed letter / digit / punctuation runs, whitespace runs —
    * the boundary pass every BPE tokenizer applies before merges, so
    * piece counts are the scale-stable token-budget estimator. The
    * pattern is RE2-compatible (leftmost-first alternation, \p classes)
    * so the DuckDB oracle runs it verbatim. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
  def bpePieces(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** PII-redaction regexes, ordered (emails first so an IP-shaped mail
    * domain is consumed by [EMAIL] before the IP pass — order changes
    * output, both engines must apply the same sequence). Patterns are
    * restricted to the syntax subset Java regex and DuckDB's RE2 parse
    * identically: character classes, bounded repetition, \d, \b. */
  final val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val PiiIpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  final val PiiPhoneRe = "\\+\\d{1,3}-\\d{2,4}-\\d{3,4}-\\d{4}"

  /** CCNet/Dolma-style PII scrub: emails -> [EMAIL], IPv4 -> [IP],
    * international phone numbers -> [PHONE]. Map-only, codegen'd
    * regexp_replace chain. DuckDB twin: the same three
    * regexp_replace(..., 'g') calls in the same order. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmailRe, "[EMAIL]"),
        PiiIpRe, "[IP]"),
      PiiPhoneRe, "[PHONE]")

  /** 32-bit cross-engine hash: first 8 hex chars of md5 as unsigned —
    * native digest kernel (SdHash32), bit-identical to the composed form
    * conv(substr(md5(x),1,8),16,10).
    * DuckDB twin: ('0x' || substr(md5(x), 1, 8))::UBIGINT::BIGINT */
  def hash32(c: Column): Column = call_function("sd_hash32", c)

  /** Word k-shingles as space-joined strings (1-based positions).
    * DuckDB twin: [array_to_string(t[i:i+k-1], ' ')
    *               for i in range(1, greatest(len(t)-k+2, 2))] */
  def shingles(toks: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k))))

  /** Hashed k-shingles in one fused kernel — bit-identical to
    * transform(shingles(toks,k), hash32) (see SdShingleHash32); k=1 is
    * per-token hashing. DuckDB twin: [hash32 comprehension over shingles].
    */
  def shingleHashes(toks: Column, k: Int): Column =
    call_function("sd_shingle_hash32", toks, lit(k))

  /** MinHash permutation constants: a_j in [1, 2^20], b_j in [0, 2^32),
    * prime p slightly over 2^32 — products stay under 2^53 so the affine
    * permutation is exact in BOTH engines' 64-bit integer arithmetic
    * (DuckDB errors on BIGINT overflow; Spark silently wraps — neither
    * happens below 2^63). */
  final val MinhashP = 4294967311L
  def mhA(j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"a$j".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % 1048573L) + 1
  }
  def mhB(j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"b$j".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** MinHash signature over PRE-HASHED shingles: each shingle is md5-hashed
    * once, then h affine permutations (a_j*x + b_j) mod p are minimized in
    * a single JVM pass (MinHashSig expression — the HOF formulation gets
    * its hash child inlined 12x by CollapseProject).
    * DuckDB twin (hs = [hash32(s) for s in sh]):
    * [list_min([(A_j*x + B_j) % 4294967311 for x in hs]) for each j] */
  def minhashSignature(sh: Column, h: Int): Column =
    call_function("sd_minhash", transform(sh, s => hash32(s)), lit(h))

  /** MinHash signature straight from the token array (fused shingle
    * hashing; same bits as minhashSignature(shingles(toks,k), h)). */
  def minhashSignatureTok(toks: Column, k: Int, h: Int): Column =
    call_function("sd_minhash", shingleHashes(toks, k), lit(h))

  /** LSH band keys from a minhash signature: md5 of each rows-per-band
    * slice. DuckDB twin:
    * [md5(array_to_string(mh[b*r+1:b*r+r], ',')) for b in range(0, bands)] */
  def bandKeys(mh: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",", slice(mh, b * rowsPerBand + 1, lit(rowsPerBand))).cast("binary")))

  /** 32-bit SimHash over a PRE-HASHED long array column — single-pass
    * SimHash32 expression. DuckDB twin in simhashSqlDuck. */
  def simhash32(hashesCol: String): Column =
    call_function("sd_simhash32", org.apache.spark.sql.functions.col(hashesCol))

  /** DuckDB twin of simhash32: `hashesExpr` is a BIGINT list expression. */
  def simhashSqlDuck(hashesExpr: String): String =
    s"""list_sum([CASE WHEN list_sum([CASE WHEN ((h >> b) & 1) = 1
       |  THEN 1 ELSE -1 END for h in $hashesExpr]) >= 0
       |  THEN (1::BIGINT << b) ELSE 0 END for b in range(0, 32)])""".stripMargin

  /** Marker-token language scores; deterministic argmax with fixed
    * preference order. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "fast"),
    "de" -> Seq("der", "die", "und", "schnell", "batch"),
    "es" -> Seq("el", "la", "de", "rapido", "join"),
    "fr" -> Seq("le", "la", "et", "vite", "scan"),
    "zh" -> Seq("de", "shi", "zai", "stream", "merge"))

  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Stopword ratio / punctuation ratio / length-based quality score.
    * DuckDB twins inline in the oracle SQL. */
  def stopwordRatio(toks: Column): Column =
    markerCount(toks, Seq("the", "a", "of", "and")).cast("double") / size(toks)

  /** Winnowing-lite fingerprint: 4 smallest shingle hashes, dash-joined.
    * DuckDB twin: array_to_string(list_sort(hs)[1:4], '-') */
  def fingerprint4(sh: Column): Column =
    concat_ws("-", slice(array_sort(transform(sh, s => hash32(s))), 1, 4))

  /** fingerprint4 over pre-hashed shingles (fused kernel path). */
  def fingerprint4Hashed(hs: Column): Column =
    concat_ws("-", slice(array_sort(hs), 1, 4))
}
