package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Gear rolling-hash content-defined chunking — the SCALE-path sibling
  * of [[CdcChunksExpr]], fixing its cost model: the md5 kernel hashes
  * every w-codepoint window from scratch (O(w·n) bytes through
  * MessageDigest per document — at 100 TB roughly an order of magnitude
  * more CPU than needed), while Gear (the FastCDC boundary rule;
  * Xia et al., USENIX ATC'16 — public knowledge) is ONE table lookup,
  * one shift and one add per byte, O(n) total with no per-position
  * digest allocation.
  *
  * Boundary rule: per byte `b`, `h = (h << 1) + GEAR(b)`; a cut lands
  * after the byte when the TOP `maskBits` bits of `h` are all zero
  * (the high bits carry a ~64-byte sliding content window — the low
  * bits would depend on only the trailing `maskBits` bytes), the
  * current chunk is at least `minSize` bytes, and (for STRING input)
  * the next byte starts a code point, so a chunk is always valid
  * UTF-8. A cut is forced at the first code-point boundary at or past
  * `maxSize` bytes. `h` resets to 0 at every cut, which is what gives
  * CDC its edit locality: once one cut re-aligns after an edit, every
  * later cut is a function of content alone, so the chunk streams of
  * the two versions coincide from there on.
  *
  * Expected chunk length ≈ minSize + 2^maskBits bytes between the
  * floor and the ceiling.
  *
  * Cut points are NOT comparable to the md5 path's by construction
  * (different hash family), so this expression is gated by property
  * pins (cover invariant, size bounds, edit locality, UTF-8 safety in
  * CdcSpec) plus per-sf golden output hashes (GoldenGate q_cdc_gear) —
  * the md5 path stays as the cross-engine oracle twin. The GEAR table
  * itself is deterministic (SplitMix64 from a fixed seed), never
  * java.util.Random, so pins hold across JVMs.
  */
case class GearChunksExpr(child: Expression, maskBits: Int, minSize: Int,
    maxSize: Int) extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 32,
    s"maskBits in [1,32], got $maskBits")
  require(minSize >= 1 && maxSize >= minSize,
    s"need 1 <= minSize <= maxSize, got minSize=$minSize maxSize=$maxSize")

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gear_chunks requires a string or binary column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "gear_chunks"

  protected override def nullSafeEval(input: Any): Any = input match {
    case u: UTF8String =>
      GearChunksExpr.kernel(u.getBytes, maskBits, minSize, maxSize, utf8 = true)
    case b: Array[Byte] =>
      GearChunksExpr.kernel(b, maskBits, minSize, maxSize, utf8 = false)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (child.dataType == StringType)
        s"${ev.value} = graft.plans.GearChunksExpr.kernel($c.getBytes(), $maskBits, $minSize, $maxSize, true);"
      else
        s"${ev.value} = graft.plans.GearChunksExpr.kernel($c, $maskBits, $minSize, $maxSize, false);")

  override protected def withNewChildInternal(newChild: Expression): GearChunksExpr =
    copy(child = newChild)
}

object GearChunksExpr {

  /** 256 fixed 64-bit gear values via SplitMix64 from a constant seed —
    * deterministic across JVMs (a java.util.Random table would still be
    * stable, but SplitMix64 is spec-on-the-page reproducible by any
    * external reimplementation).
    */
  // private[graft]: graft.queries.HashSql embeds the table as oracle
  // literals, so the SQL restatement can never drift from the kernel
  private[graft] val Gear: Array[Long] = {
    var x = 0x2545F4914F6CDD1DL
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** One pass, O(n): shared by interpreted eval and codegen. When
    * `utf8` is set, cuts only land where the following byte starts a
    * code point (lead-byte rule — the same unit [[CdcChunksExpr]] and
    * `substring` count in), so every emitted slice is valid UTF-8; the
    * maxSize ceiling then overshoots by at most 3 continuation bytes.
    */
  def kernel(bytes: Array[Byte], maskBits: Int, minSize: Int, maxSize: Int,
      utf8: Boolean): ArrayData = {
    val n = bytes.length
    val empty: Any = if (utf8) UTF8String.EMPTY_UTF8 else Array.emptyByteArray
    if (n == 0) return new GenericArrayData(Array[Any](empty))
    val mask = ((1L << maskBits) - 1L) << (64 - maskBits)
    var cuts = new Array[Int](16)
    var nCuts = 0
    def pushCut(p: Int): Unit = {
      if (nCuts == cuts.length) cuts = java.util.Arrays.copyOf(cuts, nCuts * 2)
      cuts(nCuts) = p
      nCuts += 1
    }
    pushCut(0)
    var h = 0L
    var chunkStart = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val p = i + 1
      if (p < n && (!utf8 || (bytes(p) & 0xc0) != 0x80)) {
        val len = p - chunkStart
        if ((len >= minSize && (h & mask) == 0L) || len >= maxSize) {
          pushCut(p)
          chunkStart = p
          h = 0L
        }
      }
      i += 1
    }
    pushCut(n)
    val out = new Array[Any](nCuts - 1)
    var j = 0
    while (j < out.length) {
      out(j) =
        if (utf8) UTF8String.fromBytes(bytes, cuts(j), cuts(j + 1) - cuts(j))
        else java.util.Arrays.copyOfRange(bytes, cuts(j), cuts(j + 1))
      j += 1
    }
    new GenericArrayData(out)
  }
}
