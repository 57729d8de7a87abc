package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the dimension
  * squeeze that sits in front of ANN indexing, SemDeDup cells and PQ
  * codebooks (project to the top-k variance directions, THEN bucket).
  *
  * Scale shape: ONE map-side-combined aggregate whose state is a fixed
  * `1 + d + d(d+1)/2` Long array (count, quantized mean sums, quantized
  * upper-triangle second moments) — ~17 KB at d=64 regardless of row
  * count — followed by an O(d³) eigensolve on the DRIVER of a d×d
  * matrix. No shuffle of vectors, no iteration over the data; projection
  * is map-only builtin arithmetic against broadcast literal components.
  *
  * Determinism: every per-row statistic is quantized to a Long BEFORE
  * aggregation — `floor(x·2^B)` with a power-of-two scale, so the scaling
  * is exact (exponent shift) and the floor is the same bit in every
  * engine — making the aggregate partition-order-free and the whole
  * model (Jacobi runs on the driver from those exact integers)
  * bit-reproducible: GoldenGate-pinnable, unlike naive float covariance.
  * Overflow envelope: |x| ≤ 2 ⇒ |x_i·x_j·2^B| ≤ 2^(B+2) — at the
  * default B=24 each row contributes < 2^26 per moment, so ~2^37 rows
  * (~10^11) fit in a signed 64-bit sum; beyond that lower B or
  * pre-aggregate per shard and merge the exact buffers.
  */
object Pca {

  /** means/eigcomponents are plain arrays: d doubles + k·d doubles. */
  case class PcaModel(dim: Int, k: Int, n: Long, scale: Long,
                      mean: Array[Double],
                      eigenvalues: Array[Double],
                      components: Array[Array[Double]]) {
    require(components.length == k && components.forall(_.length == dim))
  }

  /** One-pass quantized-moment aggregator: buffer layout
    * [0] n, [1..d] floor(x_i·S), then row-major upper triangle
    * floor(x_i·x_j·S) for i ≤ j.
    */
  final class MomentsAggregator(dim: Int, scale: Long)
      extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
    private val tri = dim * (dim + 1) / 2
    override def zero: Array[Long] = new Array[Long](1 + dim + tri)

    override def reduce(buf: Array[Long], vec: Seq[Float]): Array[Long] = {
      if (vec != null && vec.length == dim) {
        buf(0) += 1L
        val s = scale.toDouble
        val x = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          x(i) = vec(i).toDouble
          buf(1 + i) += math.floor(x(i) * s).toLong
          i += 1
        }
        var p = 1 + dim
        i = 0
        while (i < dim) {
          var j = i
          while (j < dim) {
            buf(p) += math.floor(x(i) * x(j) * s).toLong
            p += 1; j += 1
          }
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** The exact integer moment sums as rows — (i, j, qsum) for the upper
    * triangle, (i, -1, qsum) for the first moments, (-1, -1, n) for the
    * count — the oracle-checkable face of the aggregation (a cross
    * engine can restate every row with its own floor/sum).
    */
  def momentRows(df: DataFrame, vecCol: String, dim: Int,
                 scaleBits: Int = 24): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val buf = rawMoments(df, vecCol, dim, 1L << scaleBits)
    val rows = Seq((-1, -1, buf(0))) ++
      (0 until dim).map(i => (i, -1, buf(1 + i))) ++
      (for (i <- 0 until dim; j <- i until dim)
        yield (i, j, buf(1 + dim + triIndex(dim, i, j))))
    rows.toDF("i", "j", "qsum")
  }

  private def triIndex(dim: Int, i: Int, j: Int): Int =
    i * dim - i * (i - 1) / 2 + (j - i)

  /** The one-row aggregation plan (exposed so PlanSpec can pin its
    * shape: ONE partial-combined aggregate, no hash exchange).
    */
  def momentsPlan(df: DataFrame, vecCol: String, dim: Int,
                  scale: Long): DataFrame = {
    val agg = new MomentsAggregator(dim, scale)
    df.select(udaf(agg).apply(col(vecCol).cast("array<float>")).as("m"))
  }

  private def rawMoments(df: DataFrame, vecCol: String, dim: Int,
                         scale: Long): Array[Long] =
    momentsPlan(df, vecCol, dim, scale).head().getSeq[Long](0).toArray

  /** Fit the top-k model: one aggregate pass + driver Jacobi on d×d. */
  def fit(df: DataFrame, vecCol: String, k: Int, dim: Int,
          scaleBits: Int = 24): PcaModel = {
    require(k >= 1 && k <= dim)
    val scale = 1L << scaleBits
    val buf = rawMoments(df, vecCol, dim, scale)
    val n = buf(0)
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    val s = scale.toDouble
    val mean = Array.tabulate(dim)(i => buf(1 + i).toDouble / s / n)
    // covariance from the exact integer moments, normalized /(n-1)
    // (the conventional unbiased estimator; eigenvectors are scale-free
    // either way, so the choice only rescales the reported eigenvalues)
    val cov = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val exy = buf(1 + dim + triIndex(dim, i, j)).toDouble / s
      val c = (exy - n * mean(i) * mean(j)) / (n - 1)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (values, vectors) = jacobiEigen(cov)
    // order by eigenvalue desc, index asc on exact ties; fix sign so the
    // largest-|coordinate| entry (first on ties) is positive
    val order = values.zipWithIndex.sortBy { case (v, i) => (-v, i) }.map(_._2)
    val comps = order.take(k).map { c =>
      val v = Array.tabulate(dim)(r => vectors(r)(c))
      val pivot = (0 until dim).maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(-_) else v
    }
    PcaModel(dim, k, n, scale, mean, order.take(k).map(values), comps)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: fixed (p,q) sweep
    * order, rotations until the off-diagonal Frobenius mass is below
    * tol·‖A‖. Deterministic: same input bits → same output bits.
    * Returns (eigenvalues, eigenvector MATRIX with vectors as columns).
    */
  def jacobiEigen(aIn: Array[Array[Double]], tol: Double = 1e-14,
                  maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val norm = math.sqrt(a.map(_.map(x => x * x).sum).sum)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol * math.max(norm, Double.MinPositiveValue)) {
      sweep += 1
      for (p <- 0 until d; q <- (p + 1) until d if a(p)(q) != 0.0) {
        val apq = a(p)(q)
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t = {
          val sgn = if (theta >= 0) 1.0 else -1.0
          sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        // rotate rows/cols p,q of a
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      off = math.sqrt((for (i <- 0 until d; j <- 0 until d if i != j)
        yield a(i)(j) * a(i)(j)).sum)
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Map-only projection onto the model's components: per component one
    * `aggregate(zip_with(...))` dot product against a broadcast literal
    * array, mean-centering folded into a scalar constant. Output columns
    * pc_1..pc_k alongside the input.
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    val vecD = col(vecCol).cast("array<double>")
    model.components.zipWithIndex.foldLeft(df) { case (acc, (comp, idx)) =>
      val bias = comp.zip(model.mean).map { case (c, m) => c * m }.sum
      val dot = aggregate(
        zip_with(vecD, typedlit(comp.toSeq), (a, b) => a * b),
        lit(0.0), (s, x) => s + x)
      acc.withColumn(s"pc_${idx + 1}", dot - lit(bias))
    }
  }

  /** Per-component spectrum rows from a fitted model: eigenvalue,
    * explained-variance share and the cumulative share against the full
    * covariance trace (computed from the SAME exact integer moments, so
    * the rows are bit-reproducible).
    */
  def spectrum(df: DataFrame, vecCol: String, k: Int, dim: Int,
               scaleBits: Int = 24,
               fitted: Option[PcaModel] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val model = fitted.getOrElse(fit(df, vecCol, k, dim, scaleBits))
    val buf = rawMoments(df, vecCol, dim, model.scale)
    val s = model.scale.toDouble
    val n = model.n
    val trace = (0 until dim).map { i =>
      val exx = buf(1 + dim + triIndex(dim, i, i)).toDouble / s
      (exx - n * model.mean(i) * model.mean(i)) / (n - 1)
    }.sum
    val cum = model.eigenvalues.scanLeft(0.0)(_ + _).tail
    (0 until k).map { i =>
      (i + 1, model.eigenvalues(i), model.eigenvalues(i) / trace, cum(i) / trace)
    }.toDF("component", "eigenvalue", "var_share", "cum_share")
  }
}
