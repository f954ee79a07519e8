package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-shingle derivation shared by the dedup/fingerprint operators.
  *
  * Implemented as pure ARRAY expressions (filter/transform/slice over
  * the split words) — shingling is embarrassingly parallel and must not
  * shuffle: at 100 TB the explode+window formulation would exchange the
  * entire exploded word stream just to run lead(); the array form is a
  * straight map inside whole-stage codegen. The DuckDB oracle derives
  * the same shingles with unnest+lead (dialects differ, outputs don't).
  */
object Shingles {

  private def txt(c: Column): Column = coalesce(c, lit(""))

  /** Non-empty words of a text column as an array (split on single
    * space; blanks from doubled/leading/trailing spaces dropped —
    * matching both engines' split semantics). Compiled single-pass
    * kernel (round 18): the declarative filter(split(...)) twin it
    * replaces evaluated the filter INTERPRETED per element; values are
    * identical ([[graft.functions.ShingleOps.shingles]] with k=1).
    */
  def wordArray(c: Column): Column =
    graft.functions.ShingleFunctions.shinglesF(txt(c), 1)

  /** (doc_id, word, word_pos) rows; word_pos is the position in the
    * ORIGINAL split (gaps where blanks were dropped), matching the
    * oracle's generate_subscripts construction.
    */
  def words(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
        posexplode(split(txt(col("text")), " ")))
      .withColumnRenamed("pos", "word_pos")
      .withColumnRenamed("col", "word")
      .filter(length(col("word")) > 0)

  /** k-shingle array: space-joined runs of k consecutive non-empty
    * words; empty when the doc has <k words.
    *
    * Built with zip_with over k-1 shifted copies, NOT by slicing inside
    * a transform lambda: Catalyst re-evaluates outer-array references in
    * a lambda body once per element, which turns the slice formulation
    * into O(words²) splits per row (measured 7× slowdown at sf0.1).
    * zip_with lambdas touch only their lambda variables — strictly
    * linear.
    */
  def shingleArray(c: Column, k: Int): Column = {
    // compiled single-pass kernel (round 18): the k-1 chained
    // zip_withs this replaces re-derived wordArray(c) per level and
    // ran every lambda INTERPRETED (HOFs are CodegenFallback and share
    // no subexpressions) — ~2(k-1) splits + k-1 interpreted zip passes
    // per row. Same element order/values, same <k-words → empty-array
    // semantics ([[graft.functions.ShingleOps.shingles]]).
    require(k >= 1 && k <= 24)
    graft.functions.ShingleFunctions.shinglesF(txt(c), k)
  }

  /** (doc_id, shingle_pos, shingle) rows — shingle_pos is the 0-based
    * index over the filtered word sequence.
    */
  def wordShingles(df: DataFrame, k: Int): DataFrame =
    df.select(col("doc_id"), posexplode(shingleArray(col("text"), k)))
      .withColumnRenamed("pos", "shingle_pos")
      .withColumnRenamed("col", "shingle")
}
