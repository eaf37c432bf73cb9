package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.TextOps

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure built-in
  * expression chains (whole-stage codegen, SQL-oracle-portable).
  */
object TextMetrics {

  /** Tiny function-word inventories for an n-gram-free heuristic lang-id.
    * Real pipelines plug a model here; the OPERATOR (tokenize → ratio →
    * argmax) is what the engine provides.
    */
  val enStop: Seq[String] = Seq("a", "an", "the", "and", "of", "to", "in", "is", "it", "that")
  val deStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit")
  val frStop: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une", "de", "que")

  private def ratioIn(toksCol: Column, words: Seq[String]): Column = {
    val hits = size(filter(toksCol, t => t.isInCollection(words)))
    when(size(toksCol) > 0, hits.cast("double") / size(toksCol)).otherwise(0.0)
  }

  /** @return input + (pred_lang: en|de|fr|und) by max function-word ratio;
    * ties and all-zero → "und" (undetermined).
    */
  def langId(docs: DataFrame, textCol: String): DataFrame = {
    val t = TextOps.tokens(TextOps.textProcessing(col(textCol)))
    val en = ratioIn(t, enStop)
    val de = ratioIn(t, deStop)
    val fr = ratioIn(t, frStop)
    docs.withColumn("pred_lang",
      when(en > de && en > fr && en > 0, "en")
        .when(de > en && de > fr && de > 0, "de")
        .when(fr > en && fr > de && fr > 0, "fr")
        .otherwise("und"))
  }

  /** Quality metrics per doc: token count, mean token length, stopword
    * ratio, alphanumeric ratio, max single-token share (repetition signal).
    */
  def quality(docs: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val t = TextOps.tokens(TextOps.textProcessing(col(textCol)))
    docs.select(
      col(keyCol),
      size(t).as("n_tokens"),
      when(size(t) > 0,
        aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
        .otherwise(0.0).as("avg_token_len"),
      ratioIn(t, enStop).as("stopword_ratio"),
      when(length(col(textCol)) > 0,
        length(regexp_replace(col(textCol), "[^A-Za-z0-9]", "")).cast("double") /
          length(col(textCol))).otherwise(0.0).as("alnum_ratio"))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex token count
    * (alphanumeric runs + single non-space symbols). The pattern avoids
    * lookaround so it runs identically under Java regex and RE2 (DuckDB).
    */
  def tokenCounts(docs: DataFrame, textCol: String, keyCol: String): DataFrame =
    docs.select(
      col(keyCol),
      size(TextOps.tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), lit(0))).as("subword_tokens"))

  /** Document fingerprint: md5 of the normalized text (whole-doc), plus a
    * winnowed local fingerprint — the MIN shingle hash, a 1-feature
    * robust-hash stand-in that survives suffix edits.
    */
  def fingerprint(docs: DataFrame, textCol: String, keyCol: String,
                  shingleWidth: Int = 8): DataFrame = {
    val sh = Dedup.shingles(textCol, shingleWidth)
    docs.select(
      col(keyCol),
      md5(TextOps.textProcessing(col(textCol))).as("doc_fp"),
      array_min(transform(sh, s => md5(s))).as("min_shingle_fp"))
  }
}
