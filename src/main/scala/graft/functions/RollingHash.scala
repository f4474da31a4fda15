package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: base-31 polynomial rolling hash mod 1e9+7
  * (the Rabin-Karp-style content signature used by ext11 fingerprinting).
  *
  * The built-in formulation
  * `aggregate(sequence(1, length(t)), 0L, (acc, i) -> (acc*31 +
  * ascii(substring(t, i, 1))) % M)` materializes an index array per row and
  * re-seeks the string per character (`substring(t, i, 1)` walks from the
  * start of the UTF8 buffer each call — O(len²) per document). This
  * expression is one O(len) pass inside whole-stage codegen.
  *
  * Semantics: iterates UTF-16 code units of the decoded string, which
  * equals `ascii()`'s codepoint for every BMP character — identical
  * results to the HOF formulation (and the DuckDB oracle) on BMP text,
  * asserted in NativeExprSpec.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType

  /** Analysis-time type check (strict — ExpectsInputTypes validates but,
    * unlike ImplicitCastInputTypes, inserts no coercions):
    * graft_rolling_hash(non_string) is an AnalysisException, not a
    * runtime ClassCastException. */
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + $s.charAt($i)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  private[functions] def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_rolling_hash(s) takes exactly 1 string argument, got ${exprs.length}")
    RollingHash(exprs.head)
  }

  /** Register `graft_rolling_hash(s)` for SQL/expr use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", build, "scala_udf")
}
