package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** D-block (SURVEY §2): text analysis over `documents`. All scoring is
  * composed from built-in codegen'd functions (see TextFunctions), with
  * bit-identical DuckDB twins for the oracle.
  */
object TextAnalysis {

  /** D1 — token counting: whitespace tokens + BPE-ish subword estimate. */
  def textTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        wsTokens(col("text")).as("n_ws_tokens"),
        bpeTokens(col("text")).as("n_bpe_tokens"),
        length(col("text")).as("n_chars_actual"))

  /** D2 — quality scoring: ratio features used for corpus filtering. */
  def textQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        alphaRatio(col("text")).as("alpha_ratio"),
        spaceRatio(col("text")).as("space_ratio"),
        stopwordRatio(col("text")).as("stopword_ratio"),
        meanTokenLen(col("text")).as("mean_token_len"))

  /** D3 — language ID: stopword-marker argmax heuristic (deterministic
    * tiebreak), aggregated to per-language counts.
    */
  def textLangid(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(langId(col("text")).as("pred_lang"))
      .groupBy(col("pred_lang"))
      .agg(count(lit(1)).as("n"))

  /** D4 — document fingerprint: md5 over normalized content. */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> textTokens _,
    "text_quality" -> textQuality _,
    "text_langid" -> textLangid _,
    "text_fingerprint" -> textFingerprint _
  )

  val oracles: Map[String, String] = Map(
    "text_tokens" -> s"""
      SELECT doc_id, ${wsTokensSql("text")} AS n_ws_tokens,
        ${bpeTokensSql("text")} AS n_bpe_tokens,
        length(text) AS n_chars_actual
      FROM documents ORDER BY doc_id""",
    "text_quality" -> s"""
      SELECT doc_id,
        ${alphaRatioSql("text")} AS alpha_ratio,
        ${spaceRatioSql("text")} AS space_ratio,
        ${stopwordRatioSql("text")} AS stopword_ratio,
        ${meanTokenLenSql("text")} AS mean_token_len
      FROM documents ORDER BY doc_id""",
    "text_langid" -> s"""
      SELECT ${langIdSql("text")} AS pred_lang, COUNT(*) AS n
      FROM documents GROUP BY 1 ORDER BY 1""",
    "text_fingerprint" -> s"""
      SELECT doc_id, ${fingerprintSql("text")} AS fp
      FROM documents ORDER BY doc_id"""
  )
}
