package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: squared Euclidean distance of two double
  * arrays — the k-means assignment kernel (graft.ext.Similarity.kmeansIvfTopK).
  *
  * The built-in route (`aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), …)`)
  * allocates an intermediate array and interprets two lambdas per centroid
  * per vector — the dominant cost of the IVF build. This is one fused loop;
  * inside a higher-order lambda it still wins (tight `while` in nullSafeEval
  * vs per-element lambda interpretation), and in a flat projection it joins
  * whole-stage codegen.
  *
  * Numerics: single left-to-right accumulation, identical operation order
  * to the HOF formulation — bit-identical results, so oracle SQL written
  * against the HOF semantics keeps matching.
  *
  * Nulls: null if either array is null (BinaryExpression default); length
  * mismatch scores the common prefix, mirroring [[CosineSimilarity]].
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = xs.getDouble(i) - ys.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dv = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $dv * $dv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {

  private[functions] def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_sqdist(a, b) takes exactly 2 array<double> arguments, got ${exprs.length}")
    SquaredDistance(exprs.head, exprs(1))
  }

  /** Register `graft_sqdist(a, b)` for SQL/expr use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sqdist", build, "scala_udf")
}
