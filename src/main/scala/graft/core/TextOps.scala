package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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

  /** lower → non-[a-z0-9 ] → ' ' → trim. All codegen'd built-ins. */
  def textProcessing(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9 ]", " "))

  /** Whitespace tokens of an already-normalized string; empties dropped. */
  def tokens(norm: Column): Column =
    filter(split(norm, " +"), t => t =!= lit(""))

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

  /** Character n-gram set (sorted distinct) of a string — used for the
    * deterministic trigram-similarity embedding substitute (FIXTURES.md §2).
    */
  def charNgrams(c: Column, n: Int): Column = {
    // Guard: sequence(1, 0) would produce a DESCENDING range, not empty.
    val grams = transform(sequence(lit(1), length(c) - (n - 1)), i => c.substr(i, lit(n)))
    array_sort(array_distinct(when(length(c) >= n, grams).otherwise(array())))
  }
}
