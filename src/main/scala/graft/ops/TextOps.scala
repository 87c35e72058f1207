package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a `documents(doc_id, text, lang, source,
  * n_chars)` table — the training-data-pipeline layer on top of the RDF
  * engine. Everything is pure Column expressions (whole-stage codegen, no
  * UDFs), so each operator scales to arbitrary input: a narrow projection +
  * one optional hash aggregation, no unbounded state.
  */
object TextOps {

  /** Whitespace tokens (split on \s+). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Token counting: whitespace tokens + a BPE-ish subword proxy (runs of
    * letters/digits of length<=4 after splitting longer words). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"),
      // BPE-ish proxy: ceil(len/4) subword units per token
      aggregate(
        transform(tokens(col("text")), w => ceil(length(w) / lit(4.0)).cast("long")),
        lit(0L), (acc, x) => acc + x).as("n_subwords"))

  /** Quality scoring: stopword ratio + mean word length (length/punct
    * families of heuristics). */
  def qualityScores(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nSpace = (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).cast("double")
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      round(size(filter(toks, w => w === "the" || w === "a")) / nTok, 6).as("stopword_ratio"),
      round((length(col("text")) - nSpace) / nTok, 6).as("avg_word_len"))
  }

  /** Language-ID by stopword-marker counting (n-gram heuristic family):
    * argmax over per-language marker-token counts, ties broken by a fixed
    * language preference order. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    def score(markers: String*): Column =
      size(filter(toks, w => markers.map(w === _).reduce(_ || _)))
    val en = score("the", "a"); val fr = score("le", "la")
    val de = score("der", "die"); val es = score("el", "los")
    docs.select(
      col("doc_id"),
      when(en >= fr && en >= de && en >= es, "en")
        .when(fr >= de && fr >= es, "fr")
        .when(de >= es, "de")
        .otherwise("es").as("pred_lang"))
  }

  /** Document fingerprint: order-independent content hash over the sorted
    * distinct-token set (md5 so the fingerprint is reproducible across
    * engines and languages). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(distinctTokens(col("text"))))).as("fp"))
}
