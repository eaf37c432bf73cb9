package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Ids, TextOps}

/** Deterministic extraction: the engine's substitute for the reference's
  * LLM OpenIE boundary (reference src/hipporag/information_extraction/
  * openie_openai.py:45-128). Pure functions of `text`; `text` itself is
  * never mutated (byte-identity invariant per url, BASELINE.json).
  *
  * Two corpora shapes are supported:
  *  - `pages` (url, warc_ts, html, text, lang): sentence-shaped text with
  *    capitalized entities → sentence triples (FIXTURES.md §2).
  *  - `documents` (doc_id, text, ...): flat token text → adjacent-token
  *    triples (SQL-expressible, used by the DuckDB oracle).
  */
object Extract {

  /** pages|documents → chunks (chunk_id = "chunk-"+md5(content), content).
    * One chunk per document, as in the reference default chunker
    * (reference src/hipporag/utils/preprocessing.py:15-27).
    * `keyCols` are carried through (url / doc_id).
    */
  def chunks(corpus: DataFrame, textCol: String, keyCols: Seq[String]): DataFrame =
    corpus.select(
      (keyCols.map(col) :+
        Ids.mdhash(Ids.ChunkNs, col(textCol)).as("chunk_id") :+
        col(textCol).as("content")): _*)

  // ---------------------------------------------------------------- triples

  /** Sentence triples for the pages corpus: per '.'-terminated sentence,
    * entities = maximal runs of capitalized tokens, predicate = the text
    * left after removing the entities; triple = (e0, pred, e1) when the
    * sentence holds ≥2 entities. Every element is then `text_processing`-
    * normalized exactly as the reference does post-OpenIE
    * (reference HippoRAG.py:312, misc_utils.py:80-85), and triples are
    * deduped per chunk on (s,p,o) (llm_utils.py:222-254).
    */
  def sentenceTriples(chunks: DataFrame): DataFrame = {
    // Hand-rolled byte-scan kernels ([[graftx.TextKernels]]) in place of
    // split("\\.") / regexp_extract_all / regexp_replace: same output,
    // but java.util.regex thread-scales at ~0.30 on this hardware class
    // and this stage IS the build phase.
    import org.apache.spark.sql.graftx
    val sentences = chunks
      .withColumn("sentence",
        explode(graftx.column(graftx.SplitByte(graftx.expression(col("content")), '.'.toByte))))
      .where(trim(col("sentence")) =!= "")
    val withEnts = sentences
      .withColumn("ents", graftx.column(graftx.CapRuns(graftx.expression(col("sentence")))))
      .where(size(col("ents")) >= 2)
      .withColumn("pred_raw",
        graftx.column(graftx.CapRunsToSpace(graftx.expression(col("sentence")))))
    withEnts.select(
        col("chunk_id"),
        TextOps.textProcessing(element_at(col("ents"), 1)).as("subj"),
        TextOps.textProcessing(col("pred_raw")).as("pred"),
        TextOps.textProcessing(element_at(col("ents"), 2)).as("obj"))
      .where(col("subj") =!= "" && col("obj") =!= "")
      .dropDuplicates("chunk_id", "subj", "pred", "obj")
  }

  /** Adjacent-token triples for the documents corpus: after
    * `text_processing`, triple i = (tok(i), tok(i+1), tok(i+2)).
    * Chosen because it is exactly expressible in ANSI SQL (DuckDB oracle)
    * while keeping the reference's (subject, predicate, object) row shape.
    */
  def adjacentTriples(chunks: DataFrame): DataFrame = {
    val toks = TextOps.tokens(TextOps.textProcessing(col("content")))
    // sequence(0, n-3) would DESCEND for n<3 — guard to empty.
    val idx = when(size(col("toks")) >= 3, sequence(lit(0), size(col("toks")) - 3))
      .otherwise(array().cast("array<int>"))
    chunks
      .withColumn("toks", toks)
      .withColumn("i", explode(idx))
      .select(
        col("chunk_id"),
        element_at(col("toks"), col("i") + 1).as("subj"),
        element_at(col("toks"), col("i") + 2).as("pred"),
        element_at(col("toks"), col("i") + 3).as("obj"))
      .dropDuplicates("chunk_id", "subj", "pred", "obj")
  }

  /** Per-chunk entity set = distinct subjects ∪ objects of the chunk's
    * triples (reference add_fact_edges builds `entities_in_chunk` this way,
    * HippoRAG.py:895-911; predicates are NOT nodes).
    */
  def chunkEntities(triples: DataFrame): DataFrame =
    triples.select(col("chunk_id"), col("subj").as("entity"))
      .unionAll(triples.select(col("chunk_id"), col("obj").as("entity")))
      .distinct()

  /** Global distinct entities with their hash ids. */
  def entities(chunkEntities: DataFrame): DataFrame =
    chunkEntities.select(col("entity")).distinct()
      .withColumn("entity_id", Ids.mdhash(Ids.EntityNs, col("entity")))

  /** Global distinct facts (reference flatten_facts, misc_utils.py:123-128)
    * with fact ids = "fact-"+md5(str((s,p,o))) — the reference hashes the
    * Python-tuple rendering `('s', 'p', 'o')` (HippoRAG.py:320).
    */
  def facts(triples: DataFrame): DataFrame =
    triples.select("subj", "pred", "obj").distinct()
      .withColumn("fact_id", Ids.mdhash(Ids.FactNs, factContent(col("subj"), col("pred"), col("obj"))))

  /** Python `str((s,p,o))` rendering: `('s', 'p', 'o')` with single quotes.
    * Elements are post-text_processing ([a-z0-9 ] only) so no escaping can
    * arise. Reference: HippoRAG.py:320 + misc_utils.py:141-152.
    */
  def factContent(s: Column, p: Column, o: Column): Column =
    concat(lit("('"), s, lit("', '"), p, lit("', '"), o, lit("')"))
}
