package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact distinct-count bitmaps as mergeable typed [[Aggregator]]s — the
  * accelerator pattern behind Druid / ClickHouse / Kylin bitmap metrics:
  * aggregate dense surrogate ids into a bit set once, then answer every
  * coarser rollup (year from months, region from nations, any ad-hoc
  * slice union) by OR-merging the per-group sketch rows instead of
  * rescanning the fact table. Unlike HLL (q38) the result is EXACT, so
  * the rollup query stays oracle-hashable.
  *
  * Two aggregators share the `Array[Long]` word representation:
  * [[BitmapAgg.Build]] consumes raw ids (fact-scan side, standard
  * two-phase agg: partial bitmaps map-side, OR reduce-side);
  * [[BitmapAgg.Union]] consumes already-built bitmaps (rollup side, runs
  * over sketch rows only). Cardinality is NOT computed here — popcount
  * stays in codegen'd SQL (`aggregate(bm, 0L, (a, w) -> a +
  * bit_count(w))`), keeping the JVM boundary to the bit-set writes.
  *
  * Scale: buffers grow to `maxId/64` words — exact and dense-id-shaped,
  * right while surrogate keys (dw/Keys.scala) are dense by construction.
  * A production engine swaps the word array for a compressed (roaring)
  * bitmap behind the same Aggregator contract when ids are sparse or
  * unbounded; the plan shape — scan once, roll up over sketches — is
  * identical. Keys are bounded to 2^26 (8 MiB buffer) so a mis-keyed
  * query fails fast instead of OOM-ing an executor.
  */
object BitmapAgg {
  /** Hard cap on bit index: 2^26 bits = 8 MiB per buffer. */
  val MaxBits: Long = 1L << 26

  private def orInto(dst: Array[Long], src: Array[Long]): Array[Long] = {
    // callers guarantee dst is a private buffer; src is never mutated
    val out =
      if (dst.length >= src.length) dst
      else java.util.Arrays.copyOf(dst, src.length)
    var i = 0
    while (i < src.length) { out(i) |= src(i); i += 1 }
    out
  }

  /** Fact-scan side: set bit `id` per input row. */
  final class Build extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], id: Long): Array[Long] = {
      require(id >= 0 && id < MaxBits, s"bitmap id out of [0, $MaxBits): $id")
      val w = (id >>> 6).toInt
      val g = if (b.length > w) b else java.util.Arrays.copyOf(b, w + 1)
      g(w) |= 1L << (id & 63)
      g
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.length >= b.length) orInto(a, b) else orInto(b, a)
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Rollup side: OR-merge bitmaps already built by [[Build]]. */
  final class Union extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], in: Array[Long]): Array[Long] =
      orInto(b, in)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.length >= b.length) orInto(a, b) else orInto(b, a)
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }
}
