package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for position-wise hamming distance over the
  * common prefix of two strings — the codegen'd variant of the
  * `hamming_str` UDF (SURVEY §2.11: a custom `Expression` with `doGenCode`
  * beats a Scala UDF because it stays inside whole-stage codegen: no
  * boxing, no lambda dispatch, and the join/aggregate around it fuse into
  * the same generated function).
  *
  * Byte-level comparison is exact for the ASCII alphabets this engine
  * works with (bases, phred chars) and for any UTF-8 input it equals
  * byte-hamming, which is what the reference's uint8 view computes too
  * (ref: numpy_ops.py:52-56).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_distance requires (string, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    var i = 0; var d = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) != b(i)) d += 1; i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ba = ctx.freshName("ba")
      val bb = ctx.freshName("bb")
      s"""
         |byte[] $ba = $a.getBytes();
         |byte[] $bb = $b.getBytes();
         |int $n = java.lang.Math.min($ba.length, $bb.length);
         |int ${ev.value}Acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($ba[$i] != $bb[$i]) ${ev.value}Acc++;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{call_function, udf}

  /** Column form via the registered function name (requires
    * GraftExtensions or registerAll on the session).
    */
  def apply(a: Column, b: Column): Column = call_function("hamming_distance", a, b)
}
