package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for corpus curation: language ID, quality
  * stats, token counts, fingerprints. All pure column expressions —
  * partition-local, zero shuffle, whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace token count (split keeps empties; both engines agree). */
  def tokenCountWhitespace(textCol: Column): Column = size(split(textCol, " "))

  /** BPE-ish token count: runs of [a-z0-9]+ (word pieces). */
  def tokenCountRegex(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("[a-z0-9]+"), lit(0)))

  /** Stopword-based language ID heuristic. Checks the most frequent
    * function word per language as an n-gram of the padded text.
    * (Reference-free heuristic; a real pipeline would score full
    * stopword sets the same way — this keeps the oracle portable.)
    */
  def langIdHeuristic(textCol: Column): Column = {
    val padded = concat(lit(" "), textCol, lit(" "))
    when(padded.contains(" the "), "en")
      .when(padded.contains(" le ") || padded.contains(" la "), "fr")
      .when(padded.contains(" der ") || padded.contains(" und "), "de")
      .when(padded.contains(" el ") || padded.contains(" los "), "es")
      .otherwise("unk")
  }

  /** Per-language stopword sets for the scored language ID (kept
    * small and oracle-portable; a production list would be larger but
    * the plan shape is identical — one array_intersect per language).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"))

  /** Scored language ID: count distinct-token hits against each
    * language's stopword set, pick the max (ties break in declared
    * language order; zero hits → "unk").
    *
    * Round 19: one codegen pass over the text bytes
    * ([[graft.plans.TextHash.langIdScore]]) — the expression tree form
    * ([[langIdScoredExpr]], value-pinned equal by TextHashSpec) built a
    * token array, distinct-hashed it and ran one
    * size(array_intersect) per language PER ROW; only membership in
    * the 24 fixed stopwords ever mattered.
    */
  def langIdScored(textCol: Column): Column =
    graft.plans.TextHashCols.langIdScored(textCol, stopwords)

  /** The pre-kernel expression tree, kept for the TextHashSpec
    * equivalence pin (the TextHashSpec convention: the spec rebuilds
    * the replaced plan and asserts value equality).
    */
  def langIdScoredExpr(textCol: Column): Column = {
    val toks = array_distinct(filter(split(textCol, " "), t => length(t) > 0))
    val scores = stopwords.map { case (lang, ws) =>
      lang -> size(array_intersect(toks, typedLit(ws)))
    }
    val best = greatest(scores.map(_._2): _*)
    // first language (in declared order) whose score equals the max wins
    val ordered = scores.reverse.foldLeft(lit("unk")) { case (acc, (lang, s)) =>
      when(s === best, lang).otherwise(acc)
    }
    when(best === 0, "unk").otherwise(ordered)
  }

  /** Quality stats: length, word count, average word length, and a
    * density score (non-space ratio). Deterministic arithmetic only.
    */
  def nWords(textCol: Column): Column =
    // round-18: codegen token-count kernel ≡ size(filter(split(.)))
    // (TextHashSpec) — no token array, no interpreted filter lambda
    graft.plans.TextHashCols.tokenCount(textCol)

  def avgWordLen(textCol: Column): Column =
    EngineNeutral.r2(length(regexp_replace(textCol, " ", "")).cast("double") / nWords(textCol))

  def densityScore(textCol: Column): Column =
    EngineNeutral.r4(length(regexp_replace(textCol, " ", "")).cast("double") / length(textCol))

  /** Polynomial rolling-hash fingerprint over the byte stream —
    * backed by the codegen'd [[graft.plans.RollingHash]] expression
    * (a sequential fold; interpreted HOFs are ~100× slower here).
    */
  def fingerprint(textCol: Column): Column =
    graft.plans.RollingHash.rolling_hash(textCol)

  /** PII patterns, chosen to mean the same thing in Java regex
    * (Spark) and RE2 (DuckDB, the oracle): no backrefs, no lookarounds,
    * greedy quantifiers only — both dialects produce identical matches
    * for these, so redaction is engine-neutral and oracle-checkable.
    */
  val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiPhone = "\\d{3}-\\d{3}-\\d{4}"

  /** Number of email-shaped / phone-shaped spans in the text. */
  def emailCount(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit(piiEmail), lit(0)))
  def phoneCount(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit(piiPhone), lit(0)))

  /** Text with email/phone spans replaced by typed placeholders —
    * the standard pre-training scrub (emails first; the patterns
    * cannot overlap, so order only matters for determinism). Pure
    * columnar regexp_replace: partition-local, zero shuffle, codegen.
    */
  def redactPii(textCol: Column): Column =
    regexp_replace(
      regexp_replace(textCol, piiEmail, "<EMAIL>"),
      piiPhone, "<PHONE>")
}
