package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSON corpus sources (reference S4/S5/S6, SURVEY.md §2.1).
  *
  * - corpus loader: `[{title, text}, ...]` → one doc per row, content =
  *   "title\ntext" (reference main.py:76-81).
  * - OpenIE results round-trip: docs with extracted entities/triples plus
  *   the avg entity char/word stats (reference HippoRAG.py:1113-1144).
  */
object CorpusJson {

  /** reference main.py:76-81: docs = [f"{title}\n{text}"]. */
  def loadCorpus(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).json(path)
      .select(concat_ws("\n", col("title"), col("text")).as("content"))

  /** S5 — the stats block of save_openie_results: average entity length in
    * chars and in (whitespace) words over all per-chunk entity mentions.
    */
  def openieStats(chunkEntities: DataFrame): DataFrame =
    chunkEntities.agg(
      avg(length(col("entity"))).as("avg_ent_chars"),
      avg(size(split(col("entity"), " "))).as("avg_ent_words"))

  /** S4/S5 — persist the OpenIE extraction as a columnar table instead of
    * the reference's JSON blob; re-keying by md5 is already the id rule.
    */
  def saveOpenie(triples: DataFrame, chunkEntities: DataFrame, dir: String): Unit = {
    triples.write.mode("overwrite").parquet(s"$dir/triples")
    chunkEntities.write.mode("overwrite").parquet(s"$dir/chunk_entities")
  }
}
