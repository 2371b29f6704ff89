package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data-pipeline surface: token
  * counting, quality scoring, language-ID heuristics, fingerprinting, and
  * shingling for the dedup family. All Column-level (codegen-able built-ins
  * or higher-order functions) — no UDFs on the hot path.
  */
object TextFunctions {

  /** Whitespace tokens; empty/blank text gives an empty array (Spark's
    * `split("", ws)` would give `[""]`, which we filter). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word runs and individual punctuation marks,
    * approximating a subword tokenizer's pre-tokenization pass. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Ratio of punctuation characters to all characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val n = length(text).cast("double")
    when(n === 0, 0.0).otherwise(
      length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") / n)
  }

  /** Default English-ish stopword list used by quality scoring. */
  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords (quality signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val sw = array(stopwords.map(lit): _*)
    when(n === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, lower(t)))).cast("double") / n)
  }

  /** Mean token length in characters (0 for empty). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    when(n === 0, 0.0).otherwise(
      aggregate(toks, lit(0.0), (acc, t) => acc + length(t).cast("double")) / n)
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation,
    * moderate stopword density — the standard cheap pre-filter for LLM
    * training corpora. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthOk = when(nTok >= 10 && nTok <= 100000, 1.0).otherwise(nTok / 10.0)
    val punctOk = lit(1.0) - least(punctRatio(text) * 2.0, lit(1.0))
    val swr = stopwordRatio(text)
    val swOk = lit(1.0) - abs(swr - 0.4)
    least(lengthOk, lit(1.0)) * 0.4 + punctOk * 0.3 + greatest(swOk, lit(0.0)) * 0.3
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Public-knowledge function words only. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pas"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "que", "no"),
    "it" -> Seq("il", "la", "che", "e", "di", "un", "per", "non"),
    "pt" -> Seq("o", "a", "os", "e", "de", "um", "para", "nao"))

  /** Language-ID heuristic: argmax over per-language stopword hit counts,
    * "und" (undetermined) when nothing matches. Deterministic tie-break by
    * language code. */
  def langId(text: Column): Column = {
    // let-bind the lowered token array (one-element-array transform, the
    // wordShingles trick): the 6 per-language filters below all reference
    // it, and HOF lambdas get no common-subexpression elimination — an
    // inline `toks` expression re-tokenized the text once PER LANGUAGE
    element_at(
      transform(array(transform(tokens(text), lower _)), toks => {
        val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
          val wl = array(words.map(lit): _*)
          struct((-size(filter(toks, t => array_contains(wl, t)))).as("neghits"),
            lit(lang).as("lang"))
        }
        val best = sort_array(array(scored: _*)).getItem(0)
        when(best.getField("neghits") < 0, best.getField("lang"))
          .otherwise("und")
      }), 1)
  }

  /** Stable 128-bit content fingerprint (hex) for exact dedup; md5 keeps the
    * DuckDB oracle bit-identical. */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** Canonical text normalization for fuzzy-exact dedup — the CCNet-style
    * normalize-then-hash step that catches documents differing only in
    * case, punctuation, or whitespace, which byte-exact [[fingerprintMd5]]
    * treats as distinct: lowercase, strip every character outside
    * `[a-z0-9]` and whitespace, collapse whitespace runs to one space,
    * trim. Map-only Column math (two codegen'd regex rewrites), so it
    * rides the scan like the other fingerprints. The character classes
    * are spelled as explicit ASCII sets (not `\p{Punct}`/`\s`) so any
    * RE2-family engine reproduces the bytes exactly — which is what makes
    * the normalized digest oracle-checkable and portable across engines
    * sharing a corpus. Non-ASCII letters are stripped, not folded —
    * normalization for matching, not for display. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 \\t\\n\\r]", ""),
      "[ \\t\\n\\r]+", " "))

  /** 64-bit rolling polynomial fingerprint over characters — base-31 mod
    * 2^40 left fold, matching [[RollingHash.fingerprint]] exactly. */
  def fingerprintRolling(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, ch) => pmod(acc * 31L + ascii(ch).cast("long"), lit(1099511627776L)))

  /** Word n-gram shingles ("a b c" for n=3), for MinHash / Jaccard dedup.
    *
    * The token array is LET-BOUND via a one-element-array transform so the
    * tokenizing regex runs once per row: referencing `tokens(text)` from
    * inside the per-window lambda would re-split the text for every output
    * shingle (no common-subexpression elimination inside HOF lambdas —
    * measured 40x slower on the fixture corpus). n=1 short-circuits to the
    * token array itself. */
  def wordShingles(text: Column, n: Int): Column = {
    if (n == 1) tokens(text)
    else element_at(
      transform(array(tokens(text)), toks =>
        when(size(toks) < n, array().cast("array<string>")).otherwise(
          transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n)))))), 1)
  }

  /** Character n-gram shingles, for near-dup on short/no-whitespace text. */
  def charShingles(text: Column, n: Int): Column = {
    val len = length(text)
    when(len < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), len - n + 1),
        i => substring(text, i, lit(n))))
  }

  /** PII patterns kept to the regex subset shared by Java's engine and
    * RE2-family engines (no lookarounds, no backrefs) so scrubbing is
    * oracle-mirrorable and portable. Deliberately precision-leaning:
    * training-data scrubbing wants few false redactions. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Count of email-shaped substrings. */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailPattern), lit(0)))

  /** Count of IPv4-shaped substrings. */
  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(ipv4Pattern), lit(0)))

  /** Redact emails then IPv4s with typed placeholder tags. Email first:
    * an address can embed an IP-shaped host, and the reverse order would
    * split it. Pure `regexp_replace` chain — codegen'd, map-only. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      ipv4Pattern, "<IP>")

  /** Markup-stripping patterns, kept to the Java/RE2 shared regex subset
    * (notably: NO backreference for the script/style close tag — RE2 has
    * none, so each gets its own literal pattern). `(?s)` lets blocks span
    * lines; tag/entity matches are case-insensitive via `(?i)`. */
  val scriptBlockPattern = "(?is)<script[^>]*>.*?</script>"
  val styleBlockPattern = "(?is)<style[^>]*>.*?</style>"
  val tagPattern = "(?s)<[^>]*>"
  val entityPattern = "(?i)&[a-z]+;|&#[0-9]+;"

  /** HTML/markup -> text: drop script/style blocks WITH their content,
    * replace remaining tags and character entities with spaces, collapse
    * whitespace — the CommonCrawl-style extraction step before any text
    * analysis. Pure `regexp_replace` chain (codegen'd, map-only), and
    * every pattern runs identically under Java regex and RE2, so the
    * whole transformation is oracle-mirrorable like [[redactPii]].
    * Replacement is a SPACE, not empty: `a<br>b` must not fuse into one
    * token. */
  def stripMarkup(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, scriptBlockPattern, " "),
      styleBlockPattern, " ")
    val noTags = regexp_replace(noBlocks, tagPattern, " ")
    val noEntities = regexp_replace(noTags, entityPattern, " ")
    trim(regexp_replace(noEntities, "\\s+", " "))
  }

  /** Within-document repetition ratio over word n-grams: the fraction of
    * n-gram occurrences that repeat an earlier occurrence,
    * `1 - distinct/total` (0 for docs too short to have a gram). The
    * Gopher-style "duplicate n-gram fraction" quality signal — high values
    * flag boilerplate/spam. Map-only column math; the shingle array is
    * let-bound (one-element-array transform) because `size(g)` and
    * `size(array_distinct(g))` both reference it and HOF lambdas get no
    * common-subexpression elimination. */
  def repetitionRatio(text: Column, n: Int): Column =
    element_at(
      transform(array(wordShingles(text, n)), g =>
        when(size(g) <= 0, 0.0).otherwise(
          lit(1.0) - size(array_distinct(g)).cast("double")
            / size(g).cast("double"))), 1)

  /** All requested repetition ratios from ONE tokenization: the token array
    * is let-bound once and each n's shingle array is derived from it in
    * place, so a multi-signal quality pass reads and splits the text a
    * single time (three separate [[repetitionRatio]] calls re-run the
    * tokenizing regex per n). Returns a struct with fields `rep<n>`. */
  def repetitionRatios(text: Column, ns: Seq[Int]): Column = {
    require(ns.nonEmpty, "repetitionRatios: need at least one n")
    def ratio(g: Column): Column =
      when(size(g) <= 0, 0.0).otherwise(
        lit(1.0) - size(array_distinct(g)).cast("double")
          / size(g).cast("double"))
    def shingles(toks: Column, n: Int): Column =
      if (n == 1) toks
      else when(size(toks) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    element_at(
      transform(array(tokens(text)), toks =>
        struct(ns.map(n => ratio(shingles(toks, n)).as(s"rep$n")): _*)), 1)
  }

  /** Overlapping token windows — the chunking step of an embedding/RAG
    * ingestion pipeline (documents exceed the embedder's context, so each
    * becomes several `size`-token chunks striding by `size - overlap`;
    * the overlap keeps boundary-straddling passages retrievable). Returns
    * the array of chunk strings in document order (`posexplode` it for
    * chunk ids); the final chunk may be shorter, an empty document gets no
    * chunks. Map-only column math; the token array is let-bound via the
    * one-element-array transform (the [[wordShingles]] rule — HOF lambdas
    * get no common-subexpression elimination). */
  def tokenChunks(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val stride = size - overlap
    element_at(
      transform(array(tokens(text)), toks =>
        when(size_(toks) === 0, array().cast("array<string>")).otherwise(
          transform(sequence(lit(0), size_(toks) - 1, lit(stride)),
            s => concat_ws(" ", slice(toks, s + 1, lit(size)))))), 1)
  }

  // `size` the Int parameter shadows functions.size inside tokenChunks
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Jaccard similarity of the distinct-element sets of two array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }
}

/** Executor-side rolling-hash mirror of [[TextFunctions.fingerprintRolling]]
  * (unit-tested for agreement). */
object RollingHash {
  val Mod: Long = 1L << 40

  def fingerprint(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = java.lang.Math.floorMod(acc * 31L + s.charAt(i).toLong, Mod)
      i += 1
    }
    acc
  }
}
