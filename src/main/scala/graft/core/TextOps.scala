package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx

/** Text normalization primitives, byte-compatible with the reference.
  *
  * `textProcessing` mirrors `text_processing` (reference
  * src/hipporag/utils/misc_utils.py:80-85): lowercase, replace every char
  * outside `[A-Za-z0-9 ]` with a space, strip. The regex class is ASCII-only
  * on purpose — after `lower`, `[^a-z0-9 ]` is equivalent.
  *
  * `normalizeAnswer` mirrors `normalize_answer` (reference
  * src/hipporag/evaluation/eval_utils.py:4-31): lowercase, remove ASCII
  * punctuation (the 32 chars of `string.punctuation`), drop articles
  * a/an/the, squash whitespace.
  */
object TextOps {

  /** lower → non-[a-z0-9 ] → ' ' → trim, as ONE hand-rolled byte scan
    * ([[graftx.TextNormalize]]): java.util.regex thread-scales at ~0.30
    * on this hardware class (see graftx.TextKernels doc) and this is the
    * extraction hot path. Output identical to
    * trim(regexp_replace(lower(c), "[^a-z0-9 ]", " ")) — property-tested.
    */
  def textProcessing(c: Column): Column =
    graftx.column(graftx.TextNormalize(graftx.expression(c)))

  /** Whitespace tokens of an already-normalized string; empties dropped.
    * ≡ filter(split(norm, " +"), _ =!= "") as a single scan.
    */
  def tokens(norm: Column): Column =
    graftx.column(graftx.SpaceTokens(graftx.expression(norm)))

  /** Python string.punctuation, regex-escaped as a character class. */
  private val punctClass = """[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""

  /** Reference answer normalization for EM/F1 (eval_utils.py:4-31).
    * Order matters: lower → strip punct → drop articles → squash ws.
    */
  def normalizeAnswer(c: Column): Column = {
    val lowered = lower(c)
    val noPunct = regexp_replace(lowered, punctClass, "")
    val noArticles = regexp_replace(noPunct, "\\b(a|an|the)\\b", " ")
    trim(regexp_replace(noArticles, "\\s+", " "))
  }

  /** difflib `SequenceMatcher.ratio` as a codegen column (J7 — the
    * reference's rerank match-back maps LLM-returned fact strings onto
    * candidates with difflib, reference src/hipporag/rerank.py; the LLM
    * call itself stays out of scope, the matching arithmetic does not).
    * Golden-tested against difflib's own outputs in CoreSpec.
    */
  def sequenceRatio(a: Column, b: Column): Column =
    graftx.column(graftx.SequenceRatio(graftx.expression(a), graftx.expression(b)))

  /** HTML/XML tag strip ≡ regexp_replace(c, "<[^>]*>", "") as one
    * byte-scan codegen kernel ([[graftx.StripTags]]) — the html→text
    * extraction step for the Common-Crawl-shaped pages input (the
    * `html: binary` column that [[htmlText]] decodes). Property-tested
    * against the regex built-in; PageSynth roundtrip pins the per-row
    * invariant (strip(html) == text byte-identical per url).
    */
  def stripTags(c: Column): Column =
    graftx.column(graftx.StripTags(graftx.expression(c)))

  /** `html: binary` (UTF-8) → extracted text: decode + [[stripTags]]. */
  def htmlText(html: Column): Column = stripTags(html.cast("string"))

  /** URL → lowercased authority host, ≡ lower(regexp_extract(url,
    * "://([^/:?#]*)", 1)) as one byte-scan codegen kernel
    * ([[graftx.UrlHost]]) — the key extractor for host-level link-graph
    * rollups over the pages input's `url` column. Property-tested
    * against the regex built-in.
    */
  def urlHost(c: Column): Column =
    graftx.column(graftx.UrlHost(graftx.expression(c)))

  /** Character n-gram set (sorted distinct) of a string — used for the
    * deterministic trigram-similarity embedding substitute (FIXTURES.md §2).
    */
  def charNgrams(c: Column, n: Int): Column = {
    // Guard: sequence(1, 0) would produce a DESCENDING range, not empty.
    val grams = transform(sequence(lit(1), length(c) - (n - 1)), i => c.substr(i, lit(n)))
    array_sort(array_distinct(when(length(c) >= n, grams).otherwise(array())))
  }
}
