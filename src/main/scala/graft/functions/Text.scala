package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for LLM-data pipelines (SURVEY §2 L8–L11): language ID,
  * quality scoring, token counting, document fingerprinting. Everything
  * is composed from `org.apache.spark.sql.functions` (codegen'd or
  * higher-order expressions) — no UDFs, so the operators scale with the
  * scan and stay inside whole-stage codegen where possible.
  */
object Text {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles (requires ≥ n tokens; callers filter). */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
  }

  /** Tiny per-language stopword lists for the language-ID heuristic. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "se"),
    "fr" -> Seq("le", "les", "des", "de", "et", "est", "dans", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"),
  )

  /** Language-ID: distinct-stopword overlap per language, argmax with
    * alphabetical tie-break, 'und' when nothing matches. One pass, no
    * shuffle — a pure per-row expression. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val counts = Stopwords.map { case (lang, words) =>
      lang -> size(array_intersect(toks, typedLit(words)))
    }
    val anyHit = counts.map(_._2).reduce(_ + _) > 0
    // alphabetical evaluation order implements the tie-break
    val pick = counts.foldRight(lit("und")) { case ((lang, cnt), els) =>
      when(counts.filter(_._1 != lang).map { case (_, other) => cnt >= other }
        .reduce(_ && _), lit(lang)).otherwise(els)
    }
    when(anyHit, pick).otherwise(lit("und"))
  }

  /** Quality stats: word count, mean word length, stopword ratio, and a
    * boolean gate — the length/ratio heuristics data pipelines use for
    * pretraining filtering. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nWords = size(toks)
    val sumLen = aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
    val avgLen = round(sumLen.cast("double") / nWords, 6)
    val en = typedLit(Stopwords.toMap.apply("en"))
    val stopHits = size(filter(toks, t => array_contains(en, t)))
    val stopRatio = round(stopHits.cast("double") / nWords, 6)
    Seq(
      "n_words" -> nWords,
      "avg_word_len" -> avgLen,
      "stopword_ratio" -> stopRatio,
      "quality" -> (nWords >= 10 && nWords <= 1000 && avgLen >= 2.0 && avgLen <= 12.0))
  }

  /** Whitespace token count + a BPE-ish regex token count (runs of
    * letters, runs of digits, single other non-space chars — the
    * disjoint character classes keep Java and RE2 regex semantics
    * identical). */
  def tokenCounts(text: Column): Seq[(String, Column)] = Seq(
    "ws_tokens" -> size(tokens(text)),
    "bpe_tokens" -> regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]")))

  /** Corpus-prep normalization: mask URLs and emails, collapse runs of
    * whitespace, trim, lowercase — the standard cleanup pass before
    * dedup/tokenization in a training-data pipeline. Patterns stick to
    * constructs with identical Java/RE2 semantics so the operator is
    * engine-portable (oracle-verified). */
  def clean(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, "https?://[^ ]+", "<url>"),
        "[^ ]+@[^ ]+\\.[^ ]+", "<email>"),
      "  +", " ")))

  /** Intra-document repetition metrics (the Gopher/MassiveText-style
    * repetition filters): duplicate-token fraction plus duplicate 2-gram
    * and 3-gram fractions, with a combined gate. Word-level rather than
    * line/paragraph-level because the corpus is single-line text; the
    * same construction applies to lines by swapping the tokenizer. Pure
    * per-row array expressions — the filter rides the scan with no
    * shuffle, so at 100 TB it costs one pass like any other row filter. */
  def repetitionColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val n = size(toks)
    def grams(k: Int): Column =
      when(n >= k,
        transform(sequence(lit(0), n - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    def dupFrac(arr: Column): Column = {
      val total = size(arr)
      when(total > 0,
        round((total - size(array_distinct(arr))).cast("double") / total, 6))
    }
    val dw = dupFrac(toks)
    val d2 = dupFrac(grams(2))
    val d3 = dupFrac(grams(3))
    Seq(
      "n_tokens" -> n,
      "dup_word_frac" -> dw,
      "dup_2gram_frac" -> d2,
      "dup_3gram_frac" -> d3,
      "repetitive" -> (coalesce(dw, lit(0.0)) > 0.3 ||
        coalesce(d2, lit(0.0)) > 0.18 || coalesce(d3, lit(0.0)) > 0.12))
  }

  /** PII scrubbing: email and phone redaction + per-document match
    * counts. Patterns use only simple character classes so Java and RE2
    * regex semantics coincide (oracle-portable); real deployments swap in
    * their compliance patterns. Redaction order is fixed (emails first)
    * and mirrored in the oracle. */
  val EmailRe = "[a-z0-9._]+@[a-z0-9.]+"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"
  def piiColumns(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailRe)),
    "n_phones" -> regexp_count(text, lit(PhoneRe)),
    "redacted" -> regexp_replace(
      regexp_replace(text, EmailRe, "<email>"), PhoneRe, "<phone>"))

  /** Polynomial rolling hash over codepoints: h = fold(h*257 + cp) mod
    * 2^31-1 — graft's native codegen'd Expression (plans/RollingHash):
    * zero per-row allocation, deterministic everywhere. */
  def fingerprint(text: Column): Column =
    graft.plans.GraftFunctions.rollingHash(text)
}
