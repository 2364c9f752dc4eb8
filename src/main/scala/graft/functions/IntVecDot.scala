package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: exact integer dot product of two
  * `ARRAY<INT>` code columns with a long accumulator, in whole-stage
  * codegen — [[FloatVecDot]]'s integer sibling, built for the int8
  * compressed-scoring ANN stage ([[graft.ext.Similarity.int8TopK]]),
  * where the HOF form (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) runs
  * interpreted and allocates a zipped array per candidate pair.
  *
  * Integer addition is associative-exact, so for EQUAL-LENGTH, NON-NULL
  * code arrays (the quantizer's contract) results are identical to the
  * HOF form by construction — no rounding grain needed, unlike the float
  * case. Outside the contract the same divergence as [[FloatVecDot]]
  * applies (min-length partial sum, null elements as 0, total eval) and
  * is spec-pinned.
  */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"IntVecDot requires two ARRAY<INT> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += x.getInt(i).toLong * y.getInt(i).toLong
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVecDot =
    copy(left = newLeft, right = newRight)
}

object IntVecDot {
  /** Column-API entry point: `int_dot(a, b)`. */
  def int_dot(a: Column, b: Column): Column =
    Bridge.toCol(IntVecDot(Bridge.toExpr(a), Bridge.toExpr(b)))
}
