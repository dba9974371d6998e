package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a typed, MERGEABLE
  * [[org.apache.spark.sql.expressions.Aggregator]] — the missing UDAF
  * shape in the §2.8 surface: partial sketches build map-side on every
  * partition, merge associatively in the exchange, and the driver sees
  * one k-entry summary instead of the full token universe.
  *
  * Guarantee (the classical one): any item with true frequency
  * f > N/(k+1) over a stream of N items survives in the final sketch,
  * and each surviving counter underestimates by at most N/(k+1). The
  * sketch alone is approximate AND layout-dependent (which items beyond
  * the guaranteed set survive depends on arrival order) — so, like the
  * LSH/IVF candidate generators in this repo, it is used to PRUNE, never
  * to answer: [[graft.operators.TextOps.heavyHitters]] verifies the
  * candidate set with an exact count and the verified output is
  * deterministic on any cluster layout.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries", PODS 2012): sum
  * counters pointwise; if more than k survive, subtract the (k+1)-st
  * largest count from all and drop the non-positive — preserving the
  * error bound under arbitrary merge trees, which is exactly what a
  * Spark partial aggregation needs.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {
  require(k > 0, "k must be positive")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(m: mutable.Map[String, Long], t: String): mutable.Map[String, Long] = {
    m.get(t) match {
      case Some(c) => m.update(t, c + 1L)
      case None if m.size < k => m.update(t, 1L)
      case None =>
        // decrement-all: every counter pays one, zeros evicted
        val dead = mutable.ArrayBuffer.empty[String]
        m.mapValuesInPlace((_, c) => c - 1L)
        m.foreach { case (key, c) => if (c <= 0L) dead += key }
        dead.foreach(m.remove)
    }
    m
  }

  override def merge(
      a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (key, c) => big.update(key, big.getOrElse(key, 0L) + c) }
    if (big.size > k) {
      // subtract the (k+1)-st largest count from every counter
      val cut = big.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      big.mapValuesInPlace((_, c) => c - cut)
      big.foreach { case (key, c) => if (c <= 0L) dead += key }
      dead.foreach(big.remove)
    }
    big
  }

  /** Sorted for a deterministic driver artifact (the SET is guaranteed to
    * contain every true heavy hitter; order of the remainder is not). */
  override def finish(m: mutable.Map[String, Long]): Seq[String] =
    m.keys.toSeq.sorted

  // Tungsten-native map/array encoders (not Kryo): the partial sketches
  // that cross the exchange stay in the compact unsafe format
  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    ExpressionEncoder[mutable.Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
