package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline tier:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything here is a pure `Column` expression over built-in functions —
  * whole-stage-codegen'd, no UDFs in the hot path (the reference's
  * per-row pandas `.apply` lexical features, e.g.
  * /root/reference/code/features/content.py:21-127, become one projection).
  * Each builder has an exact ANSI-SQL mirror in [[graft.QueriesText]] so the
  * driver's DuckDB oracle checks the math, not just row counts.
  */
object TextStats {

  /** Whitespace tokens. The corpus contract is single-space separation;
    * `split` on a literal space keeps Spark and SQL oracles byte-aligned. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-alphanumeric marks — the standard pre-tokenizer shape. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Mean token length without re-scanning: (chars − separators) / tokens. */
  def meanTokenLen(text: Column): Column =
    (length(text) - tokenCount(text) + lit(1)).cast("double") /
      tokenCount(text).cast("double")

  /** Fraction of tokens found in `words` (e.g. stopwords). */
  def wordRatio(text: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t))).cast("double") /
      tokenCount(text).cast("double")
  }

  /** Fraction of characters that are not lowercase-alpha or space —
    * punctuation/digit/uppercase density, a standard quality signal. */
  def nonAlphaRatio(text: Column): Column =
    length(regexp_replace(text, "[a-z ]", "")).cast("double") /
      length(text).cast("double")

  // Language marker profiles (public-knowledge stopword lists, top function
  // words per language). Kept tiny: the heuristic needs separation, not
  // coverage. Order of `langs` is the deterministic tie-break (first wins).
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "auf"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "you", "that", "for"),
    "es" -> Seq("el", "los", "las", "una", "es", "en", "por", "con", "del", "para"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "que", "pour", "qui", "pas")
  )

  /** Count of marker-word hits for one language profile. */
  def markerHits(text: Column, lang: String): Column = {
    val set = array(markers.toMap.apply(lang).map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t)))
  }

  /** Heuristic language ID:
    *  - CJK codepoint share > 0.3 → "zh";
    *  - else argmax marker hits over [[markers]] (strictly-greater chain in
    *    profile order → deterministic tie-break, first profile wins);
    *  - zero hits everywhere → "und".
    * SQL-mirrorable: a CASE over pairwise comparisons, no argmax needed. */
  def langId(text: Column): Column = {
    val cjkShare =
      length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")).cast("double") /
        length(text).cast("double")
    val Seq(de, en, es, fr) = markers.map { case (l, _) => markerHits(text, l) }
    val total = de + en + es + fr
    when(cjkShare > 0.3, lit("zh"))
      .when(total === 0, lit("und"))
      .when(de >= en && de >= es && de >= fr, lit("de"))
      .when(en >= es && en >= fr, lit("en"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Composite quality score in [0,1] — length/stopword/punct signals
    * (cf. Gopher/C4-style heuristics): longer docs, ordinary punctuation
    * density and some stopwords score higher. Pure arithmetic — identical
    * IEEE results in any engine. */
  def qualityScore(text: Column, stopLangs: Seq[String] = Seq("en")): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(n / lit(64.0), lit(1.0))
    val stop = stopLangs.map(l => markerHits(text, l).cast("double"))
      .reduce(_ + _) / n
    val stopScore = least(stop * lit(8.0), lit(1.0))
    val punct = nonAlphaRatio(text)
    val punctScore = lit(1.0) - least(punct * lit(4.0), lit(1.0))
    (lenScore + stopScore + punctScore) / lit(3.0)
  }

  /** Normalized content fingerprint (lowercase, collapsed whitespace → md5):
    * the exact-dedup key. Oracle-able (md5 in every engine). */
  def fingerprintMd5(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Scalar kernel of [[rollingFp]] (shared with the native expression's
    * eval and generated code); null → 0L. */
  def rollingFp64(s: String): Long = {
    if (s == null) 0L
    else {
      val t = s.toLowerCase.replaceAll("\\s+", " ")
      var h = 1469598103934665603L
      var i = 0
      while (i < t.length) { h = h * 1000003L + t.charAt(i); i += 1 }
      h
    }
  }

  /** 64-bit polynomial rolling hash (Karp–Rabin, base 1000003) of the
    * normalized text — the document-fingerprint primitive used where an
    * 8-byte key must replace a 16-byte digest (shuffle-key-size matters at
    * 10^12 rows). Plans the native codegen'd `rolling_fp` expression
    * (requires [[graft.ext.GraftExtensions]] on the session — every engine
    * entry point registers it). Not SQL-mirrorable; covered by ScalaTest. */
  def rollingFp(text: Column): Column = call_function("rolling_fp", text)
}
