package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed Aggregator — the
  * bounded-memory half of a two-pass EXACT heavy-hitters operator
  * (ext94): pass 1 streams every item through ≤ k counters and emits a
  * candidate set guaranteed to contain every item with frequency
  * > N/(k+1); pass 2 exact-counts only the candidates. The alternative —
  * a full-vocabulary groupBy — shuffles one row per DISTINCT key, which
  * on a 100 TB corpus with a long-tailed vocabulary is the dominant
  * exchange; this sketch ships ≤ k counters per map task regardless of
  * vocabulary size.
  *
  * Correctness under Spark's PARTIAL/FINAL split relies on the
  * mergeable-summaries result (Agarwal et al., PODS 2012): summing two
  * MG summaries and then subtracting the (k+1)-th largest count from
  * every entry (dropping non-positive ones) preserves the deficit bound
  * deficit(item) ≤ N/(k+1) for the combined stream, for ANY merge tree —
  * so the candidate superset guarantee is independent of partitioning.
  * The candidate SET itself may vary with merge order below the
  * guarantee line; only the exact second pass is oracle-compared.
  *
  * The decrement-all step is O(k) per evicting insert; with k in the
  * tens this favors obviousness over a constant-time generation-counter
  * scheme, same trade as [[BottomKAgg]].
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1L)
      case None if b.size < k => b.updated(a, 1L)
      // full and a is untracked: decrement every counter (a's +1 and one
      // -1 cancel), dropping zeros — the classic MG eviction
      case None => b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val summed = b2.foldLeft(b1) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from all; ≤ k survive
      val bar = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      summed.view.mapValues(_ - bar).filter(_._2 > 0L).toMap
    }
  }

  // sorted for a deterministic-looking intermediate; the guarantee, not
  // the order, is what pass 2 consumes
  override def finish(r: Map[String, Long]): Seq[String] = r.keys.toSeq.sorted

  // kryo buffer => ObjectHashAggregate; the buffer never exceeds k entries
  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}
