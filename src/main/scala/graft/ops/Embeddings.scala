package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding storage/bandwidth utilities for the similarity family.
  *
  * At 100 TB the embedding column IS the dataset: symmetric int8
  * quantization (per-vector scale = maxAbs/127) cuts storage and shuffle
  * bytes 4× versus float32 while keeping cosine ranking nearly intact —
  * the standard trade in large ANN deployments. Everything here is a pure
  * Column expression in double precision with explicit floor(x+0.5)
  * rounding, so results are bit-reproducible across engines (Scala
  * math.round and SQL round() disagree on negative halves; floor(x+0.5)
  * does not).
  */
object Embeddings {

  /** L2-normalized copy of a float vector (unchanged when all-zero). */
  def l2Normalize(vec: Column): Column = {
    val n = Similarity.norm(vec)
    when(n > 0, transform(vec, x => (x.cast("double") / n).cast("float")))
      .otherwise(vec)
  }

  /** Per-vector symmetric int8 quantization:
    * scale = max|x| / 127, code_i = clamp(floor(x_i/scale + 0.5), ±127).
    * Output struct: (scale DOUBLE, codes ARRAY<INT> in [-127, 127]).
    * All-zero vectors get scale 0 and zero codes.
    */
  def quantizeInt8(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x.cast("double"))))
    val scale = maxAbs / lit(127.0)
    val codes = when(scale > 0,
      transform(vec, x =>
        greatest(lit(-127.0), least(lit(127.0),
          floor(x.cast("double") / scale + lit(0.5)))).cast("int")))
      .otherwise(transform(vec, _ => lit(0)))
    struct(scale.as("scale"), codes.as("codes"))
  }

  /** Reconstruct floats from (scale, codes). */
  def dequantizeInt8(quant: Column): Column =
    transform(quant.getField("codes"),
      c => (c.cast("double") * quant.getField("scale")).cast("float"))

  /** Cosine similarity directly on quantized vectors: the integer dot
    * product needs only one multiply by the two scales — int8 arithmetic
    * end-to-end, no dequantized copy materialized.
    */
  def quantizedCosine(qa: Column, qb: Column): Column = {
    def idot(a: Column, b: Column) =
      aggregate(zip_with(a.getField("codes"), b.getField("codes"),
        (x, y) => (x * y).cast("long")), lit(0L), (acc, v) => acc + v)
    def inorm2(a: Column) = idot(a, a)
    val denom = sqrt(inorm2(qa).cast("double")) * sqrt(inorm2(qb).cast("double"))
    when(denom > 0, idot(qa, qb).cast("double") / denom).otherwise(lit(0.0))
  }
}
