package graft.functions

import scala.collection.immutable.TreeMap
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A4/A3: bounded-size hierarchical summarization as a typed Aggregator
  * — the one genuinely custom aggregate the reference demands
  * (SURVEY.md §2.12; DESIGN.md:153-195 "summary pyramid"): concatenate
  * per-item summaries in a deterministic key order, never exceeding a
  * character budget. The IRON RULE (bounded intermediate size,
  * /root/reference/DESIGN.md:241-262) holds by construction: the buffer
  * only ever retains the maximal by-key prefix whose joined length fits
  * the budget, so merge order cannot change the result and no buffer
  * outgrows `maxChars`.
  *
  * PRECONDITION — unique keys per group: `updated`/`++` keep the
  * last-seen value on a key collision, and "last seen" depends on
  * partition merge order, so duplicate keys would make the kept value
  * nondeterministic (the merge-order-independence claim holds only for
  * distinct keys). The verified call site keys by doc_id within lang
  * (unique by construction); a caller with non-unique keys must
  * pre-aggregate to one value per key first.
  *
  * Semantics (mirrored by the DuckDB oracle of `bounded_summary`):
  * items sorted by key ascending; keep the longest prefix such that
  * length(join(pieces, "|")) <= maxChars; output the joined string.
  *
  * Buffer boundedness: inserting a key smaller than the current prefix
  * boundary only shrinks the fitting prefix, so entries once trimmed
  * can never re-qualify — trimming at every reduce/merge is lossless.
  */
case class BoundedConcat(maxChars: Int)
    extends Aggregator[(Long, String), TreeMap[Long, String], String] {

  private def trim(m: TreeMap[Long, String]): TreeMap[Long, String] = {
    var total = -1L // joined length = sum(len + 1) - 1
    var keep = m
    val it = m.iterator
    var boundary = Long.MaxValue
    var found = false
    while (it.hasNext && !found) {
      val (k, v) = it.next()
      total += v.length + 1
      if (total > maxChars) { boundary = k; found = true }
    }
    if (found) keep = m.rangeUntil(boundary)
    keep
  }

  override def zero: TreeMap[Long, String] = TreeMap.empty

  override def reduce(b: TreeMap[Long, String], a: (Long, String)): TreeMap[Long, String] =
    trim(b.updated(a._1, a._2))

  override def merge(x: TreeMap[Long, String], y: TreeMap[Long, String]): TreeMap[Long, String] =
    trim(x ++ y)

  override def finish(m: TreeMap[Long, String]): String =
    m.values.mkString("|")

  override def bufferEncoder: Encoder[TreeMap[Long, String]] =
    Encoders.kryo[TreeMap[Long, String]]

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
