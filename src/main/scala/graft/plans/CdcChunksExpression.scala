package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for content-defined chunking (the engine
  * behind [[graft.ops.Cdc.chunks]]): one pass over the value's raw UTF-8
  * bytes, no String materialization at all.
  *
  * Semantics (must stay bit-identical to the q_cdc_* DuckDB oracles): a
  * cut lands after code-point position `i` (`w <= i < nCp`) when the
  * first byte of md5 over the UTF-8 bytes of the w-codepoint gram
  * ending at `i` is <= `maxFirstByte`; chunks are the byte slices
  * between consecutive cuts. Code points are counted as UTF-8 lead
  * bytes — the same rule `UTF8String.numChars` uses, and the same unit
  * Spark's and DuckDB's `substring`/`length` operate in, so the
  * expression agrees with the oracle on any input, ASCII or astral.
  *
  * Why an Expression and not the ScalaUDF it replaced: the UDF path
  * deserializes UTF8String → java.lang.String per row (a copy + UTF-16
  * transcode), boxes the result array, and blocks whole-stage codegen
  * around the projection. Here eval and codegen both jump straight into
  * [[CdcChunksExpr.kernel]] on the unsafe bytes, and the surrounding
  * operators stay fused. The md5 instance is thread-local (one per
  * executor thread, not per row).
  */
case class CdcChunksExpr(child: Expression, w: Int, maxFirstByte: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a string or binary column, got ${child.dataType}")

  /** String in → string chunks (positions are code points); binary in →
    * binary chunks (positions are bytes — a raw payload has no text
    * semantics). On ASCII bytes the two paths cut identically.
    */
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  protected override def nullSafeEval(input: Any): Any = input match {
    case u: UTF8String => CdcChunksExpr.kernel(u, w, maxFirstByte)
    case b: Array[Byte] => CdcChunksExpr.kernelBytes(b, w, maxFirstByte)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (child.dataType == StringType)
        s"${ev.value} = graft.plans.CdcChunksExpr.kernel($c, $w, $maxFirstByte);"
      else
        s"${ev.value} = graft.plans.CdcChunksExpr.kernelBytes($c, $w, $maxFirstByte);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

object CdcChunksExpr {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** The one-pass chunker, shared by interpreted eval and codegen (the
    * generated code calls this static forwarder directly).
    */
  def kernel(u: UTF8String, w: Int, maxFirstByte: Int): ArrayData = {
    val bytes = u.getBytes
    val nb = bytes.length
    if (nb == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    // byte offset of each code point (UTF-8 lead-byte rule)
    val offs = new Array[Int](nb + 1)
    var nCp = 0
    var i = 0
    while (i < nb) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(nCp) = i; nCp += 1 }
      i += 1
    }
    offs(nCp) = nb
    if (nCp < w)
      return new GenericArrayData(Array[Any](UTF8String.fromBytes(bytes)))
    val md = mdLocal.get()
    var cuts = new Array[Int](16)
    var nCuts = 0
    def pushCut(p: Int): Unit = {
      if (nCuts == cuts.length) cuts = java.util.Arrays.copyOf(cuts, nCuts * 2)
      cuts(nCuts) = p
      nCuts += 1
    }
    pushCut(0)
    var p = w
    while (p <= nCp) {
      md.reset()
      md.update(bytes, offs(p - w), offs(p) - offs(p - w))
      if ((md.digest()(0) & 0xff) <= maxFirstByte && p != nCp) pushCut(p)
      p += 1
    }
    pushCut(nCp)
    val out = new Array[Any](nCuts - 1)
    var j = 0
    while (j < out.length) {
      out(j) = UTF8String.fromBytes(
        bytes, offs(cuts(j)), offs(cuts(j + 1)) - offs(cuts(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Byte-position variant for BINARY payloads: every byte is a
    * position, windows are raw byte slices. Identical cut decisions to
    * [[kernel]] on pure-ASCII input (where byte == code point).
    */
  def kernelBytes(bytes: Array[Byte], w: Int, maxFirstByte: Int): ArrayData = {
    val nb = bytes.length
    if (nb == 0)
      return new GenericArrayData(Array[Any](Array.emptyByteArray))
    if (nb < w)
      return new GenericArrayData(Array[Any](bytes.clone()))
    val md = mdLocal.get()
    var cuts = new Array[Int](16)
    var nCuts = 0
    def pushCut(p: Int): Unit = {
      if (nCuts == cuts.length) cuts = java.util.Arrays.copyOf(cuts, nCuts * 2)
      cuts(nCuts) = p
      nCuts += 1
    }
    pushCut(0)
    var p = w
    while (p <= nb) {
      md.reset()
      md.update(bytes, p - w, w)
      if ((md.digest()(0) & 0xff) <= maxFirstByte && p != nb) pushCut(p)
      p += 1
    }
    pushCut(nb)
    val out = new Array[Any](nCuts - 1)
    var j = 0
    while (j < out.length) {
      out(j) = java.util.Arrays.copyOfRange(bytes, cuts(j), cuts(j + 1))
      j += 1
    }
    new GenericArrayData(out)
  }
}
