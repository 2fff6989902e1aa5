package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two
  * Array[Double] columns with full whole-stage codegen (`doGenCode`).
  *
  * Preference order for custom ops (SURVEY.md §2.7): compose built-ins
  * → native Expression → UDF. The higher-order-function composition
  * (`zip_with`+`aggregate`) evaluates per element with boxing; a Scala
  * UDF breaks codegen at the call boundary; this expression inlines a
  * primitive loop into the generated stage — no boxing, no virtual
  * call, stays inside WholeStageCodegen.
  *
  * Accumulation is left-to-right (identical to the UDF and the
  * aggregate() form), so results are bit-equal with the DuckDB oracle.
  * Null in → null out; zero norm → 0.0 (engine convention). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    // tails count toward norms (defensive; equal-length in practice)
    var j = n
    while (j < x.numElements()) { val v = x.getDouble(j); nx += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getDouble(j); ny += v * v; j += 1 }
    val na = math.sqrt(nx); val nb = math.sqrt(ny)
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  double $xi = $a.getDouble($i); $nx += $xi * $xi;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  double $yi = $b.getDouble($i); $ny += $yi * $yi;
         |}
         |double $na = java.lang.Math.sqrt($nx);
         |double $nb = java.lang.Math.sqrt($ny);
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / ($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
