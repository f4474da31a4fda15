package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 32-bit SimHash fingerprint of a token
  * array in ONE pass — `graft_simhash(tokens)`.
  *
  * Semantics are bit-identical to the relational formulation (ext04's
  * original pipeline and its DuckDB oracle): for bit j, each token votes
  * +1 if the first hex nibble of `md5(tok || '#' || j)` is >= 8 (i.e. the
  * digest's top bit is set) else -1; bit j of the fingerprint is set iff
  * the balance is positive. Tokens are expected pre-deduplicated
  * (`array_distinct`) — the caller controls multiset-vs-set voting.
  *
  * Why native: the relational version needs explode (row blowup) → a
  * distinct SHUFFLE → a broadcast sign-table join → a 32-column
  * aggregation shuffle. This kernel folds all of it into a map-side
  * projection inside whole-stage codegen — zero exchanges, zero
  * broadcast state. The trade: tokens are hashed once per document
  * rather than once per corpus (no shared sign table); 32 short MD5s per
  * token is ~µs-scale, far cheaper than the shuffles it replaces, and at
  * 100 TB the kernel's zero memory footprint also removes the
  * vocabulary-broadcast failure mode entirely.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  // "#0".."#31" as UTF-8 byte suffixes, computed once
  private val suffixes: Array[Array[Byte]] =
    Array.tabulate(32)(j => s"#$j".getBytes("UTF-8"))

  /** Called from both the interpreted path and generated code. */
  def compute(arr: ArrayData): Long = {
    val digest = md5.get()
    val bal = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tokBytes = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < 32) {
          digest.reset()
          digest.update(tokBytes)
          digest.update(suffixes(j))
          // first hex char >= '8'  ⇔  top bit of byte 0 set
          if ((digest.digest()(0) & 0x80) != 0) bal(j) += 1 else bal(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (bal(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  private[functions] def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_simhash(tokens) takes exactly 1 array argument, got ${exprs.length}")
    SimHash64(exprs.head)
  }

  /** Register `graft_simhash(tokens)` for SQL/expr use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", build, "scala_udf")
}
