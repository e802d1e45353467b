package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * language-ID heuristic, quality scoring, token counting, normalization.
  * All pure `Column` compositions (codegen'd, shuffle-free, pushdown-safe) —
  * no UDFs, so they stay inside WholeStageCodegen at 100 TB.
  *
  * Determinism note: the counting primitives are built on `length`/`replace`
  * integer arithmetic (not floating point), so they are exactly reproducible
  * in any SQL engine for oracle comparison.
  */
object TextFunctions {

  /** Whitespace-collapse + trim + lowercase: the canonical text key for
    * near-exact dedup. */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Normalized whitespace tokens, BLANK-SAFE: empty/whitespace-only text
    * yields an empty array (a bare `split` would yield `[""]` — a phantom
    * token that corrupts counts). The one tokenization contract shared by
    * the LM/retrieval/overlap operators and mirrored by the DuckDB
    * oracles' `string_split` + empty-guard CTEs. */
  def tokensWs(c: Column): Column = {
    val norm = normalizeText(c)
    when(length(norm) === 0, array().cast("array<string>"))
      .otherwise(split(norm, " "))
  }

  /** Number of non-overlapping occurrences of `marker` (integer-exact). */
  def occurrences(c: Column, marker: String): Column =
    ((length(c) - length(expr_replace(c, marker))) / marker.length).cast("int")

  private def expr_replace(c: Column, search: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(search), "")

  /** Whitespace token count: split size on the single-space-normalized text
    * (0 for blank input). One split pass — no per-marker regex scans. */
  def tokenCountWs(c: Column): Column = {
    val norm = normalizeText(c)
    when(length(norm) === 0, 0).otherwise(size(split(norm, " ")))
  }

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (a standard pre-tokenizer shape). */
  def tokenCountBpe(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("int")

  /** Stopword-marker hit count for one language: tokens ∈ word set, counted
    * in a single split + array filter (vs one full-text scan per marker —
    * ~20× fewer passes over the text at corpus scale). */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    size(filter(split(normalizeText(c), " "),
      t => t.isin(words.map(_.asInstanceOf[Any]): _*)))

  /** Language-marker table for the heuristic classifier. Tiny on purpose:
    * the point is the operator shape (argmax over per-language scores), not
    * linguistic accuracy. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Heuristic language-ID: argmax of per-language stopword hits with a
    * deterministic tie rule (first language in table order wins ties);
    * "und" (undetermined) when no marker hits at all. */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (lang, words) => lang -> stopwordHits(c, words) }
    val anyHit = scores.map(_._2).reduce(_ + _) > 0
    val best = scores.tail.foldLeft(
      (lit(scores.head._1), scores.head._2)) { case ((bl, bs), (l, s)) =>
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }._1
    when(anyHit, best).otherwise(lit("und"))
  }

  /** PII patterns kept deliberately simple (char classes + bounded
    * quantifiers only) so Java regex and RE2-family engines agree exactly —
    * the redaction is oracle-checkable cross-engine. */
  val EmailPattern = "[A-Za-z0-9][A-Za-z0-9.#_-]*@[A-Za-z0-9][A-Za-z0-9.-]*\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Scrub emails/phones from a text column: struct(clean_text, n_emails,
    * n_phones). Pure regexp composition — codegen'd, shuffle-free; the
    * counts come from `regexp_count`, the scrub from two `regexp_replace`
    * passes (phones first: a phone can't contain an email, so the order
    * only matters for overlap bookkeeping and this one is unambiguous). */
  def piiScrub(c: Column): Column = {
    val nEmails = regexp_count(c, lit(EmailPattern)).cast("int")
    val nPhones = regexp_count(c, lit(PhonePattern)).cast("int")
    val clean = regexp_replace(
      regexp_replace(c, PhonePattern, "<PHONE>"), EmailPattern, "<EMAIL>")
    struct(clean.as("clean_text"), nEmails.as("n_emails"), nPhones.as("n_phones"))
  }

  /** Quality metrics struct over a text column: token count, average token
    * length, punctuation count, stopword ratio, and an accept flag
    * (length/punct/stopword heuristics like production corpus filters). */
  def qualityMetrics(c: Column): Column = {
    val norm = normalizeText(c)
    val nTokens = tokenCountWs(c)
    val nChars = length(norm)
    // chars excluding separators, exactly divided over tokens
    val avgTokLen = when(nTokens > 0,
      (nChars - (nTokens - 1)).cast("double") / nTokens.cast("double"))
      .otherwise(0.0)
    // one translate pass counts all four punctuation marks
    val punct = length(norm) - length(translate(norm, ".,!?", ""))
    val stopHits = stopwordHits(c, langMarkers.flatMap(_._2))
    val stopRatio = when(nTokens > 0,
      stopHits.cast("double") / nTokens.cast("double")).otherwise(0.0)
    val ok = nTokens.between(5, 100000) && avgTokLen.between(1.0, 20.0)
    struct(
      nTokens.as("n_tokens"), avgTokLen.as("avg_token_len"),
      punct.as("punct_count"), stopRatio.as("stopword_ratio"),
      ok.as("quality_ok"))
  }
}
