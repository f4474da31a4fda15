package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (the UDAF tier of §2.10): a bottom-k sketch —
  * the k lexicographically-smallest hash values per group, the classic
  * KMV (k-minimum-values) summary used for distinct-count estimation and
  * deterministic per-group sampling in corpus-curation pipelines.
  *
  * Why an Aggregator and not a window: `row_number() OVER (ORDER BY h) <= k`
  * sorts every group member (WindowGroupLimit caps the flow but the
  * exchange still carries all survivors per partition); this aggregator
  * carries O(k) state per group through Spark's PARTIAL/FINAL aggregation
  * — partial buffers of ≤ k hashes merge associatively, so a group with a
  * billion members ships k values per map task, not a sorted run.
  *
  * Result is the SET of k smallest values — independent of encounter
  * order, hence deterministic under any partitioning (finish emits them
  * sorted ascending, '|'-joined).
  *
  * The O(k log k) insert below favors obviousness; a production kernel
  * would keep a bounded max-heap. With k ≈ tens the difference is noise.
  */
class BottomKAgg(k: Int) extends Aggregator[String, Array[String], String] {

  override def zero: Array[String] = Array.empty

  override def reduce(b: Array[String], a: String): Array[String] = insert(b, a)

  override def merge(b1: Array[String], b2: Array[String]): Array[String] =
    b2.foldLeft(b1)(insert)

  override def finish(r: Array[String]): String = r.mkString("|")

  // kryo buffer => ObjectHashAggregate (same physical strategy as
  // collect_list); the buffer never exceeds k elements
  override def bufferEncoder: Encoder[Array[String]] = Encoders.kryo[Array[String]]

  override def outputEncoder: Encoder[String] = Encoders.STRING

  private def insert(b: Array[String], a: String): Array[String] =
    if (b.length == k && b(k - 1) <= a) b // below the bar — O(1) fast path
    else if (b.contains(a)) b // KMV is a set summary: duplicates don't count twice
    else {
      val nb = (b :+ a).sorted
      if (nb.length > k) nb.take(k) else nb
    }
}
