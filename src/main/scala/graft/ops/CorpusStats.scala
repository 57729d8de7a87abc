package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributional corpus statistics: how far each slice's token
  * distribution sits from the corpus-wide one. The KL number is the
  * standard "domain drift" diagnostic of a training-data pipeline —
  * which sources are stylistic outliers, which shard of a crawl dump
  * changed under you, which language's token mix the mixture re-weighting
  * actually shifted.
  *
  * KL(p_g || q) = Σ_t p_g(t) · ln(p_g(t) / q(t)) with p_g the group's
  * distribution and q the global one. Every token of the group occurs in
  * the global distribution, so no term needs smoothing and the sum is
  * finite and ≥ 0.
  *
  * Scale shape: one (group, token) count aggregate (vocab-bounded,
  * map-side combined), two roll-ups of that frame (per-group and global
  * totals, both tiny), one join back, one quantized-sum aggregate. The
  * per-term log terms quantize to 1e-9 Longs before summing (the
  * [[Classifier]] / [[LanguageModel]] pattern), so the per-group sum is
  * exact integer addition — order-insensitive, partition-invariant, and
  * replayable by the DuckDB oracle as a DECIMAL(38,9) sum.
  */
object CorpusStats {

  /** (groupCol, n_tokens, n_types, round(kl, 6)) per group — KL divergence
    * of the group's token distribution from the whole-corpus distribution,
    * [[TextAnalysis.tokens]] tokenization (codegen'd, no UDF on the
    * explode path).
    */
  def klBySource(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val occ = docs.select(col(groupCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val tf = occ.groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("c"))
    val perGroup = tf.groupBy(col(groupCol)).agg(sum(col("c")).as("n_g"))
    val global = tf.groupBy(col("token")).agg(sum(col("c")).as("c_t"))
    val total = tf.agg(sum(col("c")).as("n"))
    val pg = col("c").cast("double") / col("n_g")
    val q = col("c_t").cast("double") / col("n")
    val term = pg * log(pg / q)
    tf.join(perGroup, Seq(groupCol))
      .join(global, Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy(col(groupCol))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        // Half-AWAY-FROM-ZERO quantization (matches DuckDB round(term, 9)):
        // KL terms are the one quantized family with reachable negatives,
        // where plain floor(x*1e9+0.5) (half-up) would disagree on ties.
        round((sum(when(term >= 0, floor(term * 1e9 + 0.5))
          .otherwise(-floor(-term * 1e9 + 0.5)).cast("long")) / 1e9), 6)
          .as("kl"))
  }

  /** The DuckDB oracle for [[klBySource]] — self-contained, any scale. */
  def klOracleSql(table: String, groupCol: String, textCol: String): String =
    s"""WITH occ AS (
       |  SELECT $groupCol,
       |    unnest(regexp_extract_all(lower(trim($textCol)), '\\S+')) AS token
       |  FROM $table),
       |tf AS (SELECT $groupCol, token, count(*) AS c FROM occ GROUP BY 1, 2),
       |g AS (SELECT $groupCol, sum(c) AS n_g FROM tf GROUP BY 1),
       |gl AS (SELECT token, sum(c) AS c_t FROM tf GROUP BY 1),
       |tot AS (SELECT sum(c) AS n FROM tf),
       |terms AS (
       |  SELECT tf.$groupCol, tf.c,
       |    (CAST(tf.c AS DOUBLE) / n_g) *
       |      ln((CAST(tf.c AS DOUBLE) / n_g) / (CAST(c_t AS DOUBLE) / n)) AS term
       |  FROM tf JOIN g USING ($groupCol) JOIN gl USING (token) CROSS JOIN tot)
       |SELECT $groupCol, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
       |  round(CAST(sum(CAST(round(term, 9) AS DECIMAL(38,9))) AS DOUBLE), 6) AS kl
       |FROM terms GROUP BY $groupCol ORDER BY $groupCol""".stripMargin

  /** One-pass numeric column profile: one row per column —
    * (column_name, n, n_null, vmin, vmax, mean, n_distinct, nd_ok).
    * Everything except `nd_ok` is exact and oracle-checked; `nd_ok`
    * gates Spark's built-in HLL++ (`approx_count_distinct`, rsd 0.01 —
    * the default 0.05 is a standard deviation, not a bound, and misses
    * 5% on small-cardinality columns) against the exact distinct count
    * at 5% relative error.
    *
    * Shape: MELT first — `stack` unpivots each row into |cols| narrow
    * (column_name, value) pairs (map-only, codegen'd) — then TWO lean
    * keyed aggregates joined on the |cols|-row result. The exact
    * distinct runs ISOLATED (`distinct` on (column_name, value), then a
    * plain count): mixing `countDistinct` into the stats aggregate
    * makes Catalyst's distinct rewrite key the partial aggregate by
    * (column_name, value) and drag every other buffer — including the
    * ~16 KiB HLL++ state — along for MILLIONS of keys instead of
    * |cols|; measured 45× slower at sf0.1. Isolated, the distinct pass
    * shuffles bare (name, value) pairs and the stats pass keeps one
    * buffer per column. The wide alternative (per-column countDistinct
    * in one global agg) is worse still: an |cols|-way Expand into a
    * single final task. At 100 TB drop the exact-distinct pass and
    * keep the sketch — that is what `nd_ok` certifies it against.
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val stackArgs = cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    val melted = df.select(
      expr(s"stack(${cols.size}, $stackArgs) as (column_name, value)"))
    val stats = melted.groupBy(col("column_name"))
      .agg(
        count(col("value")).as("n"),
        (count(lit(1)) - count(col("value"))).as("n_null"),
        round(min(col("value")), 6).as("vmin"),
        round(max(col("value")), 6).as("vmax"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double") /
          count(col("value")), 6).as("mean"),
        approx_count_distinct(col("value"), 0.01).as("approx_nd"))
    val nd = melted.distinct()
      .groupBy(col("column_name"))
      .agg(count(col("value")).as("n_distinct"))
    stats.join(nd, Seq("column_name"))
      .select(col("column_name"), col("n"), col("n_null"), col("vmin"),
        col("vmax"), col("mean"), col("n_distinct"),
        // An all-null column has 0 exact distinct AND a 0 sketch estimate —
        // that's a perfect sketch, not a gate failure (oracle emits TRUE).
        when(col("n_distinct") === 0, col("approx_nd") === 0)
          .otherwise(abs(col("approx_nd").cast("double") / col("n_distinct")
            - 1.0) <= 0.05).as("nd_ok"))
      .orderBy(col("column_name"))
  }

  /** Zipf power-law fit over the top-`k` token frequencies: OLS of
    * ln(count) on ln(rank) — the standard corpus-health probe (natural
    * language sits near slope −1; templated/boilerplate-heavy or
    * synthetic corpora drift off it, so the fit belongs next to the
    * repetition and Gopher filters in a pipeline's profiling pass).
    *
    * Shape: the corpus-scale work is [[Vocabulary.topVocabulary]]'s
    * bounded-heap selection (map tasks reduce their vocabulary slice to
    * k candidates before one exchange — never a global sort); the fit
    * itself runs driver-side over ≤ k rows, like the BM25 constants.
    *
    * Cross-engine determinism, house convention: ln values quantize to
    * 1e-9 (half-up) and the five OLS sums accumulate as exact scaled
    * decimals (products of two 9-dp decimals are 18-dp exact); only the
    * closed form runs in doubles, on identical operands in identical
    * order on both engines, rounded HALF_UP to 6. Degenerate fits
    * (k = 1, or all counts equal ⇒ zero x-variance is impossible since
    * ranks differ, but zero y-variance isn't) report r2 = 0 via the
    * same CASE guard on both sides.
    *
    * Output: one row — (n_tokens_fit, slope, intercept, r2).
    */
  def zipfFit(df: DataFrame, idCol: String, textCol: String, k: Int = 1000): DataFrame = {
    require(k >= 1, s"zipfFit: k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val top = Vocabulary.topVocabulary(df, idCol, textCol, k)
      .select(col("rank").cast("long"), col("total_count").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(top.nonEmpty, "zipfFit: empty vocabulary")
    def q(x: Double): BigDecimal = BigDecimal(HashKernels.nanoQuant(x), 9)
    val lx = top.map { case (r, _) => q(math.log(r.toDouble)) }
    val ly = top.map { case (_, c) => q(math.log(c.toDouble)) }
    val n = top.length.toDouble
    val sx = lx.sum.doubleValue
    val sy = ly.sum.doubleValue
    val sxy = lx.zip(ly).map { case (a, b) => a * b }.sum.doubleValue
    val sxx = lx.map(a => a * a).sum.doubleValue
    val syy = ly.map(a => a * a).sum.doubleValue
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val num = n * sxy - sx * sy
    val slopeRaw = if (denx > 0) num / denx else 0.0
    val intercept = (sy - slopeRaw * sx) / n
    val r2 = if (denx > 0 && deny > 0) num * num / (denx * deny) else 0.0
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((top.length.toLong, r6(slopeRaw), r6(intercept), r6(r2)))
      .toDF("n_tokens_fit", "slope", "intercept", "r2")
  }

  /** Heaps' law fit — vocabulary growth V(N) ≈ K·N^β over the corpus in
    * deterministic md5 document order (the same rank-key convention every
    * deterministic-shuffle op uses, so "growth" is well-defined and
    * partition-invariant). The companion probe to [[zipfFit]]: natural
    * corpora grow sub-linearly (β ≈ 0.4–0.6); a corpus whose vocabulary
    * grows linearly (β → 1) is ID-soup or binary noise, one that
    * plateaus hard is templated.
    *
    * Fully distributed, unlike the top-k-bounded Zipf fit: per-doc token
    * counts cumsum to N_d via [[Packing.runningTotal]] (range partition +
    * partition-local window + broadcast prefix offsets — no single-task
    * exchange); each token's FIRST document is one token-keyed `min`
    * aggregate, the per-doc new-token counts cumsum the same way to V_d;
    * and the OLS of ln V on ln N runs as ONE map-side-combined aggregate
    * of 1e-9-quantized terms (Long sums for the linear terms, exact
    * DECIMAL sums for the three product terms). Only the closed form
    * touches the driver. Every document with ≥ 1 token contributes one
    * (N_d, V_d) point.
    *
    * Output: one row — (n_points, beta, ln_k, r2).
    */
  def heapsFit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the exploded (doc, token, tf) stream feeds ONLY the
    // first-occurrence aggregate; recomputing the compiled tokenizer per
    // consumer MEASURED faster than persisting the token stream
    // (2.5 s vs 3.1 s at sf0.1) — don't "optimize" this into a cache
    val tf = Vocabulary.docTermFrequencies(df, idCol, textCol)
    // per-doc token totals never need the explode + doc-keyed shuffle the
    // old sum(tf) formulation paid: Σtf per doc IS the token count of the
    // text, a map-only kernel call on the raw row. The ≥1-token filter
    // reproduces the explode's semantics (a token-less doc produced no
    // rows, hence no cumsum point).
    val nToksUdf = udf((t: String) => HashKernels.tokenCount(t))
    val perDoc = df
      .select(Sampling.rankKey(col(idCol)).as("__rk"),
        nToksUdf(col(textCol)).as("n_toks"))
      .filter(col("n_toks") >= 1L)
    val withN = Packing.runningTotal(perDoc, "__rk", "n_toks", "N")
    val newPerDoc = tf
      .withColumn("__rk", Sampling.rankKey(col(idCol)))
      .groupBy(col("token")).agg(min(col("__rk")).as("__frk"))
      .groupBy(col("__frk")).agg(count(lit(1)).as("n_new"))
    val withV = Packing.runningTotal(
      withN.join(newPerDoc, withN("__rk") === newPerDoc("__frk"), "left")
        .select(col("__rk"), col("N"),
          coalesce(col("n_new"), lit(0L)).as("n_new")),
      "__rk", "n_new", "V")
    val termUdf = udf((n: Long, v: Long) =>
      (HashKernels.nanoQuant(math.log(n.toDouble)),
        HashKernels.nanoQuant(math.log(v.toDouble))))
    val pts = withV.filter(col("N") >= 1 && col("V") >= 1)
      .select(termUdf(col("N"), col("V")).as("t"))
      .select(col("t._1").as("lxn"), col("t._2").as("lyn"))
    def dec(c: Column) = c.cast("decimal(19,0)")
    val r = pts.agg(
      count(lit(1)).as("n"),
      sum(col("lxn").cast("decimal(28,0)")).as("sx"),
      sum(col("lyn").cast("decimal(28,0)")).as("sy"),
      sum(dec(col("lxn")) * dec(col("lyn"))).as("sxy"),
      sum(dec(col("lxn")) * dec(col("lxn"))).as("sxx"),
      sum(dec(col("lyn")) * dec(col("lyn"))).as("syy")).head()
    val cnt = r.getLong(0)
    require(cnt > 0, "heapsFit: no documents with tokens")
    val nd = cnt.toDouble
    def d9(i: Int) = r.getDecimal(i).doubleValue / 1e9
    def d18(i: Int) = r.getDecimal(i).doubleValue / 1e18
    val (sx, sy) = (d9(1), d9(2))
    val (sxy, sxx, syy) = (d18(3), d18(4), d18(5))
    val denx = nd * sxx - sx * sx
    val deny = nd * syy - sy * sy
    val num = nd * sxy - sx * sy
    val slopeRaw = if (denx > 0) num / denx else 0.0
    val lnK = (sy - slopeRaw * sx) / nd
    val r2 = if (denx > 0 && deny > 0) num * num / (denx * deny) else 0.0
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((cnt, r6(slopeRaw), r6(lnK), r6(r2)))
      .toDF("n_points", "beta", "ln_k", "r2")
  }

  /** The DuckDB oracle for [[heapsFit]] — identical md5 order, cumsums,
    * quantization, and closed-form operation order.
    */
  def heapsOracleSql(table: String, idCol: String, textCol: String): String =
    s"""WITH occ AS (
       |  SELECT $idCol,
       |    unnest(regexp_extract_all(lower(trim($textCol)), '\\S+')) AS token
       |  FROM $table),
       |pd AS (
       |  SELECT md5(CAST($idCol AS VARCHAR)) || '|' || CAST($idCol AS VARCHAR) AS rk,
       |    count(*) AS n_toks
       |  FROM occ GROUP BY 1),
       |fo AS (
       |  SELECT token,
       |    min(md5(CAST($idCol AS VARCHAR)) || '|' || CAST($idCol AS VARCHAR)) AS frk
       |  FROM occ GROUP BY token),
       |nn AS (SELECT frk AS rk, count(*) AS n_new FROM fo GROUP BY frk),
       |cum AS (
       |  SELECT pd.rk,
       |    sum(pd.n_toks) OVER (ORDER BY pd.rk) AS N,
       |    sum(COALESCE(nn.n_new, 0)) OVER (ORDER BY pd.rk) AS V
       |  FROM pd LEFT JOIN nn USING (rk)),
       |qq AS (
       |  SELECT
       |    CAST(CAST(round(ln(N), 9) AS DECIMAL(19,9)) * 1000000000 AS BIGINT) AS lxn,
       |    CAST(CAST(round(ln(V), 9) AS DECIMAL(19,9)) * 1000000000 AS BIGINT) AS lyn
       |  FROM cum WHERE N >= 1 AND V >= 1),
       |s AS (
       |  SELECT count(*) AS cnt, CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(lxn) AS DOUBLE) / 1e9 AS sx,
       |    CAST(sum(lyn) AS DOUBLE) / 1e9 AS sy,
       |    CAST(sum(CAST(lxn AS HUGEINT) * lyn) AS DOUBLE) / 1e18 AS sxy,
       |    CAST(sum(CAST(lxn AS HUGEINT) * lxn) AS DOUBLE) / 1e18 AS sxx,
       |    CAST(sum(CAST(lyn AS HUGEINT) * lyn) AS DOUBLE) / 1e18 AS syy
       |  FROM qq),
       |g AS (
       |  SELECT cnt, n, sx, sy,
       |    n * sxx - sx * sx AS denx,
       |    n * syy - sy * sy AS deny,
       |    n * sxy - sx * sy AS num
       |  FROM s),
       |h AS (
       |  SELECT cnt, n, sx, sy, denx, deny, num,
       |    CASE WHEN denx > 0 THEN num / denx ELSE 0 END AS slope_raw
       |  FROM g)
       |SELECT CAST(cnt AS BIGINT) AS n_points,
       |  round(slope_raw, 6) AS beta,
       |  round((sy - slope_raw * sx) / n, 6) AS ln_k,
       |  round(CASE WHEN denx > 0 AND deny > 0
       |    THEN num * num / (denx * deny) ELSE 0 END, 6) AS r2
       |FROM h""".stripMargin

  /** The DuckDB oracle for [[zipfFit]] — same quantized-decimal sums,
    * same double closed form in the same operation order.
    */
  def zipfOracleSql(table: String, textCol: String, k: Int): String =
    s"""WITH occ AS (
       |  SELECT unnest(regexp_extract_all(lower(trim($textCol)), '\\S+')) AS token
       |  FROM $table),
       |v AS (SELECT token, count(*) AS c FROM occ GROUP BY token),
       |top AS (
       |  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token) AS r
       |  FROM v ORDER BY c DESC, token LIMIT $k),
       |qq AS (
       |  SELECT CAST(round(ln(r), 9) AS DECIMAL(19,9)) AS lx,
       |         CAST(round(ln(c), 9) AS DECIMAL(19,9)) AS ly
       |  FROM top),
       |s AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS cnt,
       |    CAST(sum(lx) AS DOUBLE) AS sx, CAST(sum(ly) AS DOUBLE) AS sy,
       |    CAST(sum(lx * ly) AS DOUBLE) AS sxy,
       |    CAST(sum(lx * lx) AS DOUBLE) AS sxx,
       |    CAST(sum(ly * ly) AS DOUBLE) AS syy
       |  FROM qq),
       |g AS (
       |  SELECT cnt, n, sx, sy,
       |    n * sxx - sx * sx AS denx,
       |    n * syy - sy * sy AS deny,
       |    n * sxy - sx * sy AS num
       |  FROM s),
       |h AS (
       |  SELECT cnt, n, sx, sy, denx, deny, num,
       |    CASE WHEN denx > 0 THEN num / denx ELSE 0 END AS slope_raw
       |  FROM g)
       |SELECT CAST(cnt AS BIGINT) AS n_tokens_fit,
       |  round(slope_raw, 6) AS slope,
       |  round((sy - slope_raw * sx) / n, 6) AS intercept,
       |  round(CASE WHEN denx > 0 AND deny > 0
       |    THEN num * num / (denx * deny) ELSE 0 END, 6) AS r2
       |FROM h""".stripMargin

  /** One-pass Pearson correlation matrix over a fixed numeric column
    * list: one row per unordered pair — (col_a, col_b, corr). ONE
    * aggregate over the table computes every co-moment (n, Σx, Σx²,
    * Σxy per pair) — no self-join, no second scan; the |cols|²/2 corr
    * values assemble driver-side from that single collected row.
    *
    * Cross-engine determinism: inputs are quantized to DECIMAL(18,4),
    * so every sum and product-sum is EXACT scaled-integer arithmetic —
    * order- and partition-invariant, bit-identical to the oracle's
    * DECIMAL accumulation. Only the final closed-form
    * (n·Σxy − ΣxΣy)/(√(n·Σx²−Σx²)·√(n·Σy²−Σy²)) runs in doubles, on
    * identical operands in identical order, rounded HALF_UP to 6
    * places on both sides. Complete-case semantics: rows with a null
    * in ANY profiled column are dropped first (documented contract).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    val spark = df.sparkSession
    import spark.implicits._
    def d(c: String) = col(c).cast("decimal(18,4)")
    val pairs =
      for { i <- cols.indices; j <- i + 1 until cols.size }
        yield (cols(i), cols(j))
    val aggs: Seq[Column] = Seq(count(lit(1)).as("n")) ++
      cols.flatMap(c => Seq(
        sum(d(c)).as(s"sx__$c"),
        sum(d(c) * d(c)).as(s"sxx__$c"))) ++
      pairs.map { case (a, b) => sum(d(a) * d(b)).as(s"sxy__${a}__${b}") }
    val r = df.na.drop(cols).agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getLong(0).toDouble
    // Zero surviving rows (empty frame / a fully-null column) leaves the
    // decimal sums NULL; treat as 0 so den = 0 -> corr 0.0, matching the
    // oracle's CASE WHEN NULL > 0 -> ELSE 0 path instead of an NPE.
    def dbl(name: String): Double = {
      val v = r.getDecimal(r.fieldIndex(name))
      if (v == null) 0.0 else v.doubleValue
    }
    val rows = pairs.map { case (a, b) =>
      val (sx, sy) = (dbl(s"sx__$a"), dbl(s"sx__$b"))
      val (sxx, syy) = (dbl(s"sxx__$a"), dbl(s"sxx__$b"))
      val sxy = dbl(s"sxy__${a}__${b}")
      val den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
      val corr = if (den > 0) (n * sxy - sx * sy) / den else 0.0
      (a, b, BigDecimal(corr)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    rows.toDF("col_a", "col_b", "corr").orderBy(col("col_a"), col("col_b"))
  }

  /** The DuckDB oracle for [[correlationMatrix]] — the same co-moment
    * sums in DECIMAL(18,4)-exact arithmetic, the same double closed
    * form in the same operation order.
    */
  def corrOracleSql(table: String, cols: Seq[String]): String = {
    val pairs =
      for { i <- cols.indices; j <- i + 1 until cols.size }
        yield (cols(i), cols(j))
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    // DECIMAL(19,4) operands force DuckDB's int128 multiply path (the
    // int64 (18,4) product overflows); the VALUES are identical to
    // Spark's (18,4)x(18,4) -> DECIMAL(37,8) exact products.
    val sumSel = (Seq("count(*) AS n") ++
      cols.flatMap(c => Seq(
        s"sum(CAST($c AS DECIMAL(18,4))) AS sx__$c",
        s"sum(CAST($c AS DECIMAL(19,4)) * CAST($c AS DECIMAL(19,4))) AS sxx__$c")) ++
      pairs.map { case (a, b) =>
        s"sum(CAST($a AS DECIMAL(19,4)) * CAST($b AS DECIMAL(19,4))) AS sxy__${a}__${b}"
      }).mkString(",\n    ")
    val pairSelects = pairs.map { case (a, b) =>
      val nn = "CAST(n AS DOUBLE)"
      val sx = s"CAST(sx__$a AS DOUBLE)"
      val sy = s"CAST(sx__$b AS DOUBLE)"
      val sxx = s"CAST(sxx__$a AS DOUBLE)"
      val syy = s"CAST(sxx__$b AS DOUBLE)"
      val sxy = s"CAST(sxy__${a}__${b} AS DOUBLE)"
      val den = s"sqrt($nn * $sxx - $sx * $sx) * sqrt($nn * $syy - $sy * $sy)"
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  round(CASE WHEN $den > 0
         |    THEN ($nn * $sxy - $sx * $sy) / ($den)
         |    ELSE 0 END, 6) AS corr
         |FROM s""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH s AS (\n  SELECT $sumSel\n  FROM $table WHERE $notNull)\n" +
      s"$pairSelects\nORDER BY col_a, col_b"
  }

  /** Per-row feature scaling — z-score and min-max, the normalization
    * step in front of any model- or embedding-training job. For each
    * requested column the output gains `<c>_z = (x − mean)/std`
    * (population std) and `<c>_mm = (x − min)/(max − min)`, both
    * `round(…, 6)`; a null input stays null, a zero-variance /
    * zero-range column yields nulls (mirrored by `nullif` on the oracle
    * side).
    *
    * Scale shape: ONE map-side-combined aggregate computes every
    * column's (n, Σx, Σx², min, max) — sums in DECIMAL(18,4)-exact
    * arithmetic like [[correlationMatrix]] so the constants are
    * partition-order independent; the scaled projection is MAP-ONLY
    * with the constants inlined as literals (no broadcast, no join, no
    * second pass over the data).
    *
    * DETERMINISM CONTRACT: mean/var/std are derived from the exact
    * decimal sums with the identical double expression tree the oracle
    * evaluates (`sxx/n − (sx/n)·(sx/n)`, clamped at 0, IEEE sqrt), so
    * the scaled values are bit-stable across engines and partitionings.
    */
  def scaleFeatures(
      df: DataFrame,
      idCols: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to scale")
    def d(c: String) = col(c).cast("decimal(18,4)")
    val aggs: Seq[Column] = cols.flatMap(c => Seq(
      count(col(c)).as(s"n__$c"),
      sum(d(c)).as(s"sx__$c"),
      sum(d(c) * d(c)).as(s"sxx__$c"),
      min(col(c).cast("double")).as(s"min__$c"),
      max(col(c).cast("double")).as(s"max__$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def dbl(name: String): Double = {
      val v = r.getDecimal(r.fieldIndex(name))
      if (v == null) 0.0 else v.doubleValue
    }
    val out: Seq[Column] = idCols.map(col) ++ cols.flatMap { c =>
      val n = r.getLong(r.fieldIndex(s"n__$c")).toDouble
      val nullCol = lit(null).cast("double")
      if (n == 0) Seq(nullCol.as(s"${c}_z"), nullCol.as(s"${c}_mm"))
      else {
        val mean = dbl(s"sx__$c") / n
        val std = math.sqrt(math.max(dbl(s"sxx__$c") / n - mean * mean, 0.0))
        val vmin = r.getDouble(r.fieldIndex(s"min__$c"))
        val vmax = r.getDouble(r.fieldIndex(s"max__$c"))
        val z =
          if (std == 0.0) nullCol
          else round((col(c).cast("double") - mean) / std, 6)
        val mm =
          if (vmax == vmin) nullCol
          else round((col(c).cast("double") - vmin) / (vmax - vmin), 6)
        Seq(z.as(s"${c}_z"), mm.as(s"${c}_mm"))
      }
    }
    df.select(out: _*)
  }

  /** The DuckDB oracle for [[scaleFeatures]] — same DECIMAL-exact sums,
    * same double closed form in the same operation order; any scale.
    */
  def scaleOracleSql(
      table: String,
      idCols: Seq[String],
      cols: Seq[String]): String = {
    val sumSel = cols.flatMap(c => Seq(
      s"count($c) AS n__$c",
      s"CAST(sum(CAST($c AS DECIMAL(18,4))) AS DOUBLE) AS sx__$c",
      // DECIMAL(19,4) operands force DuckDB's int128 multiply path;
      // values match Spark's (18,4)x(18,4) -> DECIMAL(37,8) products.
      s"CAST(sum(CAST($c AS DECIMAL(19,4)) * CAST($c AS DECIMAL(19,4))) AS DOUBLE) AS sxx__$c",
      s"CAST(min($c) AS DOUBLE) AS min__$c",
      s"CAST(max($c) AS DOUBLE) AS max__$c")).mkString(",\n    ")
    val scaled = cols.flatMap { c =>
      val mean = s"(sx__$c / CAST(n__$c AS DOUBLE))"
      val std =
        s"sqrt(greatest(sxx__$c / CAST(n__$c AS DOUBLE) - $mean * $mean, 0))"
      Seq(
        s"round((CAST(t.$c AS DOUBLE) - $mean) / nullif($std, 0), 6) AS ${c}_z",
        s"round((CAST(t.$c AS DOUBLE) - min__$c) / nullif(max__$c - min__$c, 0), 6) AS ${c}_mm")
    }.mkString(",\n  ")
    val ids = idCols.map(c => s"t.$c").mkString(", ")
    s"""WITH s AS (
       |  SELECT $sumSel
       |  FROM $table)
       |SELECT $ids,
       |  $scaled
       |FROM $table t CROSS JOIN s
       |ORDER BY $ids""".stripMargin
  }

  /** The DuckDB oracle for [[profileNumeric]] — self-contained, any scale. */
  def profileOracleSql(table: String, cols: Seq[String]): String =
    cols.sorted.map { c =>
      s"""SELECT '$c' AS column_name, count($c) AS n,
         |  count(*) - count($c) AS n_null,
         |  round(CAST(min($c) AS DOUBLE), 6) AS vmin,
         |  round(CAST(max($c) AS DOUBLE), 6) AS vmax,
         |  round(CAST(sum(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / count($c), 6)
         |    AS mean,
         |  count(DISTINCT $c) AS n_distinct, TRUE AS nd_ok
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
}
