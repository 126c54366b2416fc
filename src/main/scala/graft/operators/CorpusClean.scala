package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Flagship composite: the corpus-cleaning pipeline a training-data run
  * actually executes, end to end in ONE declarative plan —
  *
  *   quality gate (ratio features) -> language filter (langid heuristic)
  *   -> exact dedup (normalized fingerprint, keep smallest doc_id)
  *
  * Catalyst fuses the whole thing: one scan of documents, the quality and
  * language expressions run inside the scan's codegen stage, and only the
  * dedup needs a shuffle (on the fingerprint). 100 TB scaling = the same
  * plan with more partitions.
  */
object CorpusClean {

  val MinChars = 100
  val MinAlpha = 0.5
  val MaxSpace = 0.4

  def corpusClean(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d)
      .withColumn("alpha_ratio", alphaRatio(col("text")))
      .withColumn("space_ratio", spaceRatio(col("text")))
      .withColumn("pred_lang", langId(col("text")))
      .withColumn("fp", fingerprint(col("text")))
    val cleaned = scored
      .filter(length(col("text")) >= MinChars &&
        col("alpha_ratio") >= MinAlpha && col("space_ratio") <= MaxSpace &&
        col("pred_lang") === "en")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    cleaned
      .select(col("doc_id"), col("pred_lang"),
        col("alpha_ratio"), col("space_ratio"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val corpusCleanSql: String = s"""
    WITH scored AS (
      SELECT doc_id, n_chars, text,
        ${alphaRatioSql("text")} AS alpha_ratio,
        ${spaceRatioSql("text")} AS space_ratio,
        ${langIdSql("text")} AS pred_lang,
        ${fingerprintSql("text")} AS fp
      FROM documents),
    cleaned AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM scored
      WHERE length(text) >= $MinChars AND alpha_ratio >= $MinAlpha
        AND space_ratio <= $MaxSpace AND pred_lang = 'en')
    SELECT doc_id, pred_lang, alpha_ratio, space_ratio, n_chars
    FROM cleaned WHERE rn = 1 ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_clean" -> corpusClean _
  )

  val oracles: Map[String, String] = Map(
    "corpus_clean" -> corpusCleanSql
  )
}
