package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level corpus operators (SURVEY §2 H14+): sub-document repeated-span
  * removal and n-gram statistics — the "dedup below the document" family
  * (exact-substring dedup à la Lee et al. 2022, at fixed-span granularity
  * that keeps the computation a hash shuffle instead of a suffix array).
  */
object CorpusSpans {

  /** H14 — repeated-span removal: split every document into consecutive
    * `SpanWords`-word spans, keep only the globally FIRST occurrence of each
    * distinct span text (ordered by doc_id, then position), and reassemble
    * the surviving spans in document order. Duplicated boilerplate that
    * recurs across documents — the memorization hazard exact-document dedup
    * cannot see — is removed everywhere but its first site.
    *
    * Shape: one explode (bounded ×(words/span) blowup), one shuffle keyed on
    * the span text for the keep-first window, one shuffle back on doc_id for
    * reassembly — linear at any corpus size, where the reference suffix-array
    * formulation is superlinear and single-machine. First-occurrence is
    * (doc_id, position) lexicographic, so the output is replay-deterministic.
    */
  val SpanWords = 8

  def spanDedup(s: SparkSession, d: String): DataFrame = {
    val spans = Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, (size(ws) - 1) DIV $SpanWords), " +
            s"k -> concat_ws(' ', slice(ws, k * $SpanWords + 1, $SpanWords)))"))
          .as(Seq("blk", "span")))
    val keepFirst = Window.partitionBy(col("span")).orderBy(col("doc_id"), col("blk"))
    spans
      .withColumn("rn", row_number().over(keepFirst))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans_kept"),
        concat_ws(" ", expr("transform(array_sort(collect_list(struct(blk, span))), x -> x.span)"))
          .as("text_dedup"))
  }

  val spanDedupSql: String = s"""
    WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
    b AS (SELECT doc_id, ws,
            unnest(range(((len(ws) - 1) // $SpanWords) + 1)) AS blk
          FROM w),
    sp AS (SELECT doc_id, blk,
             array_to_string(ws[blk * $SpanWords + 1 : blk * $SpanWords + $SpanWords], ' ') AS span
           FROM b),
    r AS (SELECT doc_id, blk, span,
            ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, blk) AS rn
          FROM sp)
    SELECT doc_id, COUNT(*) AS n_spans_kept,
      string_agg(span, ' ' ORDER BY blk) AS text_dedup
    FROM r WHERE rn = 1 GROUP BY 1 ORDER BY 1"""

  /** H15 — corpus n-gram statistics: the top `TopNgrams` bigrams by corpus
    * frequency — the language-model-side summary behind contamination
    * screens, tokenizer audits, and domain drift checks. The explode is a
    * bounded ×(words−1) blowup feeding a map-side-combined hash aggregate
    * (distinct-bigram cardinality, not corpus size, crosses the shuffle);
    * the global top-k is TakeOrdered, never a full sort. (count DESC, text)
    * ordering makes the cut deterministic under ties.
    */
  val TopNgrams = 50

  def ngramCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))"))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(TopNgrams)

  val ngramCountsSql: String = s"""
    WITH w AS (SELECT str_split(text, ' ') AS ws FROM documents),
    g AS (SELECT ws[x + 1] || ' ' || ws[x + 2] AS bigram
          FROM w, LATERAL (SELECT unnest(range(len(ws) - 1)) AS x))
    SELECT bigram, COUNT(*) AS n FROM g
    GROUP BY 1 ORDER BY n DESC, bigram LIMIT $TopNgrams"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_span_dedup" -> spanDedup _,
    "corpus_ngram_counts" -> ngramCounts _
  )

  val oracles: Map[String, String] = Map(
    "corpus_span_dedup" -> spanDedupSql,
    "corpus_ngram_counts" -> ngramCountsSql
  )
}
