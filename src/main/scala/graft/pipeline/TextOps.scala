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

  /** 32-bit cross-engine hash: first 8 hex chars of md5 as unsigned.
    * DuckDB twin: ('0x' || substr(md5(x), 1, 8))::UBIGINT::BIGINT */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Word k-shingles as space-joined strings (1-based positions).
    * DuckDB twin: [array_to_string(t[i:i+k-1], ' ')
    *               for i in range(1, greatest(len(t)-k+2, 2))] */
  def shingles(toks: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k))))

  /** MinHash signature: h distinct salted hash32 minima over shingles.
    * DuckDB twin:
    * [list_min([hash32(s || '#' || j) for s in sh]) for j in range(0, h)] */
  def minhashSignature(sh: Column, h: Int): Column =
    transform(sequence(lit(0), lit(h - 1)),
      j => array_min(transform(sh, s => hash32(concat(s, lit("#"), j)))))

  /** LSH band keys from a minhash signature: md5 of each rows-per-band
    * slice. DuckDB twin:
    * [md5(array_to_string(mh[b*r+1:b*r+r], ',')) for b in range(0, bands)] */
  def bandKeys(mh: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",", slice(mh, b * rowsPerBand + 1, lit(rowsPerBand))).cast("binary")))

  /** 32-bit SimHash over token hashes (expr because shiftleft needs column
    * args). DuckDB twin in SimHash SQL below. */
  def simhash32(tokensCol: String): Column = expr(
    s"""aggregate(sequence(0, 31), 0L, (acc, b) ->
       |  acc + if(aggregate($tokensCol, 0L,
       |            (a, t) -> a + if(((cast(conv(substring(md5(cast(t as binary)), 1, 8), 16, 10) as bigint) >> b) & 1) = 1, 1L, -1L)
       |          ) >= 0, shiftleft(1L, b), 0L))""".stripMargin)

  /** DuckDB twin of simhash32 for oracle SQL (same bit/threshold rules). */
  def simhashSqlDuck(tokensExpr: String): String =
    s"""list_sum([CASE WHEN list_sum([CASE WHEN ((('0x' || substr(md5(t), 1, 8))::UBIGINT >> b) & 1) = 1
       |  THEN 1 ELSE -1 END for t in $tokensExpr]) >= 0
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
}
