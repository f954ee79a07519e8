package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word-shingle derivation shared by the dedup/fingerprint operators.
  *
  * k-shingles are built with lead() windows over exploded words rather
  * than array slicing so the DuckDB oracle can reproduce them with the
  * identical unnest + lead construction (list slicing dialects differ;
  * window semantics don't).
  */
object Shingles {

  private def txt(c: Column): Column = coalesce(c, lit(""))

  /** (id, word, pos) rows; empty words dropped (leading/trailing/double
    * spaces produce '' in both engines' split).
    */
  def words(df: DataFrame, k: Int = 1): DataFrame =
    df.select(col("doc_id"),
        posexplode(split(txt(col("text")), " ")))
      .withColumnRenamed("pos", "word_pos")
      .withColumnRenamed("col", "word")
      .filter(length(col("word")) > 0)

  /** (doc_id, shingle_pos, shingle) with shingle = k space-joined
    * consecutive words; docs with <k words yield no rows.
    */
  def wordShingles(df: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 5)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("word_pos"))
    val parts = (0 until k).map {
      case 0 => col("word")
      case i => lead(col("word"), i).over(w)
    }
    words(df)
      .withColumn("shingle", concat_ws(" ", parts: _*))
      .withColumn("last_word", if (k == 1) col("word") else lead(col("word"), k - 1).over(w))
      .filter(col("last_word").isNotNull)
      .select(col("doc_id"), col("word_pos").as("shingle_pos"), col("shingle"))
  }
}
