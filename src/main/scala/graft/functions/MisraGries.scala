package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed [[Aggregator]] —
  * `capacity` counters of bounded state per partition, merged with the
  * Agarwal et al. "Mergeable Summaries" (PODS 2012) rule, so the
  * distributed two-stage aggregation keeps the sequential guarantee:
  *
  *   any key with true count > N / (capacity + 1) is in the summary.
  *
  * That guarantee is what makes the sketch EXACTLY verifiable (unlike
  * an HLL/KLL tier): a second pass recounts just the candidate keys,
  * and for a threshold of N/k with k <= capacity the recounted+filtered
  * result provably equals the exact heavy-hitter set — see
  * Skew.heavyHitters, whose DuckDB oracle is the plain GROUP BY.
  *
  * Why this exists at 100 TB: a raw GROUP BY over a power-law key space
  * (URLs, n-grams, user ids) shuffles and holds reducer state for every
  * distinct key — billions of mostly-count-1 entries. The sketch pass
  * carries a fixed 32-entry map per partition, and the recount pass
  * shuffles only candidate keys after a broadcast semi-join filter.
  *
  * Reduce is the textbook algorithm (Misra & Gries 1982): hit keys
  * increment; a miss inserts when under capacity, else decrements every
  * counter (dropping zeros). Merge sums both maps, then subtracts the
  * (capacity+1)-th largest count from all entries and drops the
  * non-positive — at most `capacity` strictly-positive entries remain.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Array[String]]
    with Serializable {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
    b.get(key) match {
      case Some(c) => b.updated(key, c + 1L)
      case None if b.size < capacity => b.updated(key, 1L)
      case None =>
        b.flatMap { case (k, v) => if (v > 1L) Some(k -> (v - 1L)) else None }
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val sum = b2.foldLeft(b1) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (sum.size <= capacity) sum
    else {
      // (capacity+1)-th largest count; subtracting it leaves at most
      // `capacity` positive entries (ties at the pivot all reach zero)
      val pivot = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      sum.flatMap { case (k, v) =>
        if (v - pivot > 0L) Some(k -> (v - pivot)) else None
      }
    }
  }

  override def finish(b: Map[String, Long]): Array[String] =
    b.keysIterator.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}
