package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.align.AlignRead

/** T1 CIGAR realignment as a native expression — the last UDF on the SAM/
  * BAM ingest hot path (SURVEY §2.11 preference order). The ScalaUDF form
  * paid, per read: Catalyst→Scala converters on four inputs, an Option +
  * tuple allocation, and an encoder round-trip for the
  * (seq, qual, ins-array) struct output. This expression produces the
  * InternalRow directly and participates in whole-stage codegen, so the
  * surrounding filter/projection fuse into the generated loop.
  *
  * The row kernel delegates to [[AlignRead.align]] — single source of
  * truth, so the expression is bit-identical to the UDF it replaces
  * (q_sam_* / q_bam_dist stay oracle-green).
  *
  * Output: struct<seq string, qual string,
  *                ins array<struct<position int, loc int, base string,
  *                                 qual int>>>
  * (ins quals already phred-adjusted); NULL for unaligned reads (CIGAR
  * "*"), which the caller filters — exactly the UDF contract.
  */
case class AlignReadExpr(
    seqE: Expression,
    qualE: Expression,
    posE: Expression,
    cigarE: Expression,
    minPos: Int,
    maxPos: Int,
    phredAdjust: Int) extends Expression {

  override def children: Seq[Expression] = Seq(seqE, qualE, posE, cigarE)
  override def nullable: Boolean = true
  override def dataType: DataType = AlignReadExpr.outType
  override def prettyName: String = "align_read"

  override def checkInputDataTypes(): TypeCheckResult =
    (seqE.dataType, qualE.dataType, posE.dataType, cigarE.dataType) match {
      case (StringType, StringType, IntegerType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"align_read requires (string, string, int, string), got $other")
    }

  /** Row kernel, shared by interpreted eval and the generated code.
    * `qual` may be null (reads without quality); the others are
    * null-checked by the caller.
    */
  def kernel(s: UTF8String, q: UTF8String, p: Int, c: UTF8String): InternalRow =
    AlignRead.align(
      s.toString, if (q == null) null else q.toString, p, c.toString,
      minPos, maxPos) match {
      case None => null
      case Some(ar) =>
        val ins = ar.insertions
        val rows = new Array[Any](ins.length)
        var i = 0
        ins.foreach { ib =>
          rows(i) = InternalRow(
            ib.position, ib.loc,
            UTF8String.fromString(ib.base.toString),
            ib.qual.toInt - phredAdjust)
          i += 1
        }
        InternalRow(
          UTF8String.fromString(ar.seq),
          UTF8String.fromString(ar.qual),
          new GenericArrayData(rows))
    }

  override def eval(input: InternalRow): Any = {
    val s = seqE.eval(input)
    val p = posE.eval(input)
    val c = cigarE.eval(input)
    if (s == null || p == null || c == null) null
    else kernel(
      s.asInstanceOf[UTF8String],
      qualE.eval(input).asInstanceOf[UTF8String],
      p.asInstanceOf[Int],
      c.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seqG = seqE.genCode(ctx)
    val qualG = qualE.genCode(ctx)
    val posG = posE.genCode(ctx)
    val cigarG = cigarE.genCode(ctx)
    // the kernel rides along as a reference object — the generated loop
    // calls it directly, no converters, and the stage stays whole-codegen
    val ref = ctx.addReferenceObj("alignExpr", this)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code =
      code"""
         |${seqG.code}
         |${qualG.code}
         |${posG.code}
         |${cigarG.code}
         |boolean ${ev.isNull} = true;
         |$rowCls ${ev.value} = null;
         |if (!${seqG.isNull} && !${posG.isNull} && !${cigarG.isNull}) {
         |  ${ev.value} = ($rowCls) $ref.kernel(
         |    ${seqG.value},
         |    ${qualG.isNull} ? null : ${qualG.value},
         |    ${posG.value}, ${cigarG.value});
         |  ${ev.isNull} = (${ev.value} == null);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(seqE = newChildren(0), qualE = newChildren(1),
      posE = newChildren(2), cigarE = newChildren(3))
}

object AlignReadExpr {
  val insEntry: StructType = StructType(Seq(
    StructField("position", IntegerType, nullable = false),
    StructField("loc", IntegerType, nullable = false),
    StructField("base", StringType, nullable = false),
    StructField("qual", IntegerType, nullable = false)))
  val outType: StructType = StructType(Seq(
    StructField("seq", StringType, nullable = false),
    StructField("qual", StringType, nullable = false),
    StructField("ins", ArrayType(insEntry, containsNull = false), nullable = false)))
}
