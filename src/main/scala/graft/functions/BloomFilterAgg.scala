package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-geometry bloom filter built as a typed [[Aggregator]] — the
  * explicit form of the runtime-filter pattern Spark's own
  * InjectRuntimeFilter applies to shuffle joins: aggregate the build
  * side's join keys into a bit set small enough to broadcast, then prune
  * the probe side map-side before the exact join.
  *
  * Geometry is compile-time constant (16384 bits = 2 KiB, k=4 probes) so
  * the build and probe sides can never disagree; the per-key bit
  * positions come from double hashing `bit_i = (h1 + i·h2) mod m` with
  * both hashes computed by Spark's codegen'd `xxhash64` BEFORE rows reach
  * the Aggregator — the JVM-side reduce only ORs bits, and the probe side
  * re-derives identical positions in pure SQL (`Search.bloomProbeSql`).
  *
  * Scale: the aggregation is a standard two-phase agg (partial 2 KiB
  * bitmaps map-side, one OR-merge reduce-side), so the driver sees one
  * 2 KiB array regardless of build-side row count; m is sized for the
  * demo's ~3k keys (k=4, m/n ≈ 5.5 → ~8% false positives, pruned by the
  * exact join that follows). A production build picks m from a build-side
  * count estimate the same way Spark's InjectRuntimeFilter does.
  */
object BloomFilterAgg {
  /** Filter size in bits (power of two so `mod` is a mask). */
  val NumBits = 16384
  /** Words of the Array[Long] representation. */
  val NumWords: Int = NumBits / 64
  /** Number of probe positions per key. */
  val K = 4

  /** Input: the key's two xxhash64 values. Buffer/output: the bit set. */
  final class Agg extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](NumWords)
    override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
      var i = 0
      while (i < K) {
        val bit = (in._1 + i * in._2) & (NumBits - 1)
        b((bit >>> 6).toInt) |= 1L << (bit & 63)
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < NumWords) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }
}
