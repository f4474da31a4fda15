package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays.
  *
  * The built-in route (`aggregate(zip_with(...))`, see graft.ext.Similarity)
  * allocates an intermediate array per row and interprets two lambdas; this
  * expression is one fused loop and participates in whole-stage codegen, so
  * the ANN scoring kernel stays allocation-free inside the generated
  * stage — the (b)-tier of the custom-operator ladder (custom Expression
  * before custom physical operator).
  *
  * Numerics: a single left-to-right accumulation per vector, identical
  * operation order to the higher-order-function formulation — results are
  * bit-identical to it (and to the DuckDB oracle's sequential list fold),
  * which keeps float-descending ORDER BYs stable across engines.
  *
  * Nulls: null if either array is null (BinaryExpression default); arrays
  * of different lengths score over the common prefix, mirroring zip_with's
  * null-padding-free prefix behavior for our fixed-width embeddings.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  // callers pass array<double>; AbstractDataType (for ExpectsInputTypes)
  // is private[sql] in Spark 4, so input typing is by convention here

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getDouble(i)
      val y = ys.getDouble(i)
      dot += x * y
      nx += x * x
      ny += y * y
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Arity-checked builder shared by both registration paths. */
  private[functions] def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_cosine(a, b) takes exactly 2 array<double> arguments, got ${exprs.length}")
    CosineSimilarity(exprs.head, exprs(1))
  }

  /** Register `graft_cosine(a, b)` for SQL/expr use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", build, "scala_udf")
}
