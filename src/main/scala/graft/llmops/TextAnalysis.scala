package graft.llmops

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level text analysis for corpus curation (charter extension):
  * language ID, quality scoring, token statistics, fingerprinting.
  * Single narrow projection over the corpus — no shuffle; every metric is a
  * codegen'd expression from [[graft.functions.TextFunctions]].
  */
object TextAnalysis {

  /** Stopword profiles for the 5 fixture languages. Tiny on purpose: the
    * operator contract is the voting mechanism, not lexicon quality. */
  val defaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "en"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "人"))

  /** Per-doc analysis record: token counts, quality, lang guess,
    * fingerprint. */
  def analyze(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id),
      TextFunctions.tokenCount(col(text)).as("n_tokens"),
      length(col(text)).as("n_chars"),
      round(TextFunctions.punctRatio(col(text)), 6).as("punct_ratio"),
      round(TextFunctions.stopwordRatio(col(text), defaultProfiles("en")), 6)
        .as("stopword_ratio"),
      TextFunctions.qualityScore(col(text)).as("quality"),
      TextFunctions.langIdHeuristic(col(text), defaultProfiles).as("lang_guess"),
      TextFunctions.fingerprint(col(text)).as("fingerprint"))
}
