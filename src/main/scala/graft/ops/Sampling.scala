package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and ordering for training-data assembly: quota
  * sampling per stratum, fraction sampling, a reproducible global
  * shuffle, and domain mixture re-weighting.
  *
  * Everything here keys on `md5(id)` rather than an RNG: the sample is a
  * pure function of the data, so reruns, retries, and other engines (the
  * DuckDB oracle) produce the identical sample — the property training
  * pipelines actually need from "random" sampling. `rand(seed)` would be
  * partition-order-dependent in Spark and unavailable to the oracle.
  *
  * Scale notes: quota sampling reuses the bounded-heap
  * [[TopKAggregator]] (map-side combine; a hot stratum never funnels
  * through one window task), the global shuffle reuses
  * [[Packing.runningTotal]] (two-phase cumsum; no Exchange
  * SinglePartition), and fraction sampling is a stateless filter.
  */
object Sampling {

  /** Deterministic pseudo-random rank key: 32 hex chars of md5(id), with
    * the id appended so the key stays unique even under (astronomically
    * unlikely) digest collisions. Uniform, reproducible, engine-agnostic.
    */
  def rankKey(id: Column): Column =
    concat(md5(id.cast("string")), lit("|"), id.cast("string"))

  /** Up to `quota` rows per group, chosen by ascending md5 order —
    * deterministic stratified sampling ("200k documents per language").
    * Output: (groupCol, idCol, sample_rank 1-based). Selection runs
    * through the bounded-heap top-k aggregate: each map task reduces its
    * slice of a stratum to `quota` keys before the shuffle, so a stratum
    * with a billion rows costs the same shuffle as one with a thousand.
    */
  def quotaSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    val idType = df.schema(idCol).dataType
    val keyed = df.select(col(groupCol),
      rankKey(col(idCol)).as("__rk"), lit(0.0).as("__sim"))
    // all sims equal -> the aggregator's id-ascending tie-break IS the
    // md5 order; rank = position in that order, like row_number would give
    TopKAggregator.topKByGroup(keyed, groupCol, "__rk", "__sim", quota,
      outId = "__rk", outSim = "__sim", outRank = "sample_rank")
      // the digest is exactly 32 hex chars, so the id starts at char 34
      .select(col(groupCol),
        substring(col("__rk"), 34, Int.MaxValue).cast(idType).as(idCol),
        col("sample_rank"))
  }

  /** Deterministic Bernoulli sample: keep a row iff md5(id) falls in the
    * first `fraction` of digest space. The threshold is a 32-hex-char
    * string compare — exact, portable, no float math.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    df.filter(md5(col(idCol).cast("string")) < lit(hexThreshold(fraction)))
  }

  /** Token-budget sampling: the greedy prefix of the corpus in md5(id)
    * order whose running token total stays within `budget` — pretraining
    * mixes are drawn to a TOKEN budget, not a document count ("sample
    * 300B tokens of web"), and hash order makes the drawn set a pure
    * function of the data (reruns, other engines, and corpus subsets
    * agree). A document is included only if it fits entirely.
    *
    * The running total is [[Packing.runningTotal]] — two-phase cumsum,
    * no single-partition exchange; everything else is map-only. Output:
    * input columns + `cum_tokens` (inclusive running total ≤ budget).
    */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val keyed = df.withColumn("__rk", rankKey(col(idCol)))
    Packing.runningTotal(keyed, "__rk", tokensCol, "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .drop("__rk")
  }

  /** `fraction` scaled into 128-bit digest space as 32 lowercase hex
    * chars (the exact cut point for [[hashSample]]'s string compare).
    */
  def hexThreshold(fraction: Double): String = {
    val full = BigInt(1) << 128
    val cut = (BigDecimal(full) * BigDecimal(fraction))
      .setScale(0, BigDecimal.RoundingMode.FLOOR).toBigInt.min(full)
    if (cut >= full) "g" // sorts after every hex digest: keep everything
    else f"${cut}%032x"
  }

  /** Deterministic train/validation/test assignment: each row lands in
    * the first split whose cumulative md5-digest-space share covers its
    * digest — the standard hash-split (every engine, every rerun, every
    * subset of the data agrees on each row's split; growing the corpus
    * never reassigns an existing row). `splits` are (name, fraction) in
    * order; the LAST split absorbs any rounding remainder so every row is
    * assigned even if the fractions don't sum to exactly 1. Map-only —
    * a pure function of the id column, no shuffle.
    */
  /** Cumulative cut fractions after each non-last split, accumulated in
    * DECIMAL so 0.8 + 0.1 is exactly 0.9 (a Double fold yields
    * 0.9000000000000001, whose hexThreshold differs from
    * hexThreshold(0.9) by a sliver of digest space — a latent
    * disagreement with anything that derives the boundary independently).
    */
  private def cumCuts(splits: Seq[(String, Double)]): Seq[Double] =
    splits.init
      .scanLeft(BigDecimal(0))((acc, s) => acc + BigDecimal.valueOf(s._2))
      .tail.map(_.toDouble)

  def hashSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, s"hashSplit needs >= 2 splits, got $splits")
    require(splits.forall(_._2 > 0), s"split fractions must be positive: $splits")
    require(splits.map(s => BigDecimal.valueOf(s._2)).sum <= 1,
      s"split fractions exceed 1: $splits")
    val digest = md5(col(idCol).cast("string"))
    val assigned = splits.init.zip(cumCuts(splits)).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cumFrac), rest) =>
        when(digest < lit(hexThreshold(cumFrac)), lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, assigned)
  }

  /** The exact CASE expression [[hashSplit]] evaluates, as DuckDB SQL —
    * thresholds come from the same [[hexThreshold]] values, so the oracle
    * is identical by construction. Split names are validated: they are
    * interpolated into SQL string literals.
    */
  def hashSplitOracleCase(idCol: String, splits: Seq[(String, Double)]): String = {
    require(splits.forall(_._1.matches("[A-Za-z0-9_-]+")),
      s"split names must be [A-Za-z0-9_-]+ (they embed in SQL literals): $splits")
    val whens = splits.init.zip(cumCuts(splits)).map { case ((name, _), cumFrac) =>
      s"WHEN md5(CAST($idCol AS VARCHAR)) < '${hexThreshold(cumFrac)}' THEN '$name'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${splits.last._1}' END"
  }

  /** Leakage-safe split: like [[hashSplit]], but near-duplicate documents
    * are FORCED into the same split — the eval-leakage guard (a test
    * document with a near-copy in train silently inflates benchmark
    * scores; Lee et al. 2022 measured the effect on C4). `pairs` is an
    * (id_a, id_b) near-duplicate edge list from any detector in the dedup
    * family; each connected component splits by the md5 of its min-id
    * representative, so every member lands together. Documents in no
    * pair keep their own id as representative — identical to plain
    * [[hashSplit]] for them.
    *
    * Scale shape: components come from [[Dedup.connectedComponents]]
    * (bounded driver union-find for small edge lists, distributed label
    * propagation above that); the component frame is bounded by the
    * near-duplicate population, so the join back broadcasts.
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, s"leakageSafeSplit needs >= 2 splits, got $splits")
    require(splits.forall(_._2 > 0), s"split fractions must be positive: $splits")
    require(splits.map(s => BigDecimal.valueOf(s._2)).sum <= 1,
      s"split fractions exceed 1: $splits")
    val comps = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
    val withRep = df.join(broadcast(comps), Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("component"), col(idCol)))
      .drop("component")
    val digest = md5(col("__rep").cast("string"))
    val assigned = splits.init.zip(cumCuts(splits)).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cumFrac), rest) =>
        when(digest < lit(hexThreshold(cumFrac)), lit(name)).otherwise(rest)
    }
    withRep.withColumn(splitCol, assigned).drop("__rep")
  }

  /** Reproducible global shuffle: every row's 1-based position in the
    * md5-of-id order, as `posCol`. Training-data loaders consume this as
    * the epoch order. The exact global rank is [[Packing.runningTotal]]
    * of 1 over the rank key — two parallel phases, never a
    * single-partition exchange (PlanSpec pins that for runningTotal).
    */
  def deterministicShuffle(df: DataFrame, idCol: String,
      posCol: String = "shuffle_pos"): DataFrame = {
    val keyed = df.withColumn("__rk", rankKey(col(idCol)))
      .withColumn("__one", lit(1L))
    Packing.runningTotal(keyed, "__rk", "__one", posCol)
      .drop("__rk", "__one")
  }

  /** Domain mixture re-weighting: given target shares per domain (e.g.
    * the DoReMi / Pile-style recipe "40% en, 15% each of the rest"),
    * compute each domain's CURRENT share of `weightCol` mass and the
    * sampling weight (target / current) that reshapes the corpus to the
    * target mixture. weight > 1 means the domain must be up-sampled
    * (repeated ~weight times per epoch), < 1 down-sampled.
    *
    * One map-side-combined aggregate over the corpus; the per-domain
    * frame is tiny. Domains absent from `targets` get target share 0.
    */
  def mixtureWeights(
      df: DataFrame,
      domainCol: String,
      weightCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "mixtureWeights needs at least one target share")
    df.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
        org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case t => throw new IllegalArgumentException(
        s"mixtureWeights needs an integral mass column (token/byte counts), got $weightCol: $t")
    }
    val tot = math.abs(targets.values.sum)
    require(tot > 0, "target shares must sum to a positive mass")
    val norm = targets.view.mapValues(_ / tot).toMap
    val targetCol: Column = norm.foldLeft(lit(0.0)) { case (acc, (d, s)) =>
      when(col(domainCol) === d, lit(s)).otherwise(acc)
    }
    val perDomain = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol)).cast("long").as("mass"),
        first(targetCol).as("target_share"))
    val total = perDomain.agg(sum(col("mass")).as("__total"))
    perDomain.crossJoin(broadcast(total))
      .select(col(domainCol), col("n_docs"), col("mass"),
        round(col("mass") / col("__total"), 6).as("share"),
        round(col("target_share"), 6).as("target_share"),
        round(col("target_share") / (col("mass") / col("__total")), 6)
          .as("weight"))
  }

  /** Temperature-scaled (τ = 0.5) sampling allocation: each group's draw
    * weight is sqrt of its size (the GPT-3 / multilingual-BERT "flatten
    * the head, keep the tail" recipe — p_i ∝ n_i^τ), and the document
    * `budget` is split by integer-exact largest-floor shares.
    *
    * Cross-engine determinism is why τ is 0.5 and not a free parameter
    * here: IEEE-754 `sqrt` and `*` are correctly rounded in every engine
    * (an arbitrary `pow(n, τ)` is NOT), so `w = floor(sqrt(n)·1e9)` is
    * bit-identical in Spark and the DuckDB oracle, and everything after
    * it is deterministic on both engines: target_i =
    * floor(budget · w_i / Σw) evaluated in correctly-rounded double ops
    * (identical bit patterns on every IEEE-754 engine even past 2^53 —
    * parity matters here, not exactness to the rational). One tiny
    * aggregate; output (groupCol, n_docs, w_quant, target).
    */
  def temperatureAllocation(
      df: DataFrame,
      groupCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val g = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("w_quant",
        floor(sqrt(col("n_docs").cast("double")) * lit(1e9)).cast("long"))
    val tot = g.agg(sum(col("w_quant")).as("__tot"))
    g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("w_quant"),
        floor(lit(budget).cast("double") * col("w_quant") / col("__tot"))
          .cast("long").as("target"))
  }

  /** Draw the [[temperatureAllocation]] sample: within each group, the
    * first `target_group` rows in md5(id) order. Selection reuses the
    * bounded-heap quota machinery with k = max target (each map task
    * reduces its slice of a group to ≤ k keys pre-shuffle); the per-group
    * cutoff is then a broadcast join against the tiny allocation frame.
    * Output: (groupCol, idCol, sample_rank, target), ≤ target rows/group.
    */
  def temperatureSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      budget: Long): DataFrame = {
    val alloc = temperatureAllocation(df, groupCol, budget)
    val targets = alloc.select(col("target"), col("n_docs")).collect()
    // The heap only ever needs min(target, group size) slots per group: a
    // target beyond the group's row count keeps the whole group anyway.
    // This also keeps Long-scale budgets exact — maxTarget can exceed
    // Int.MaxValue while the needed heap stays small.
    val maxTarget = targets.map(_.getLong(0)).foldLeft(0L)(math.max)
    val kNeeded = targets
      .map(r => math.min(r.getLong(0), r.getLong(1))).foldLeft(0L)(math.max)
    require(kNeeded <= Int.MaxValue,
      s"per-group selection of $kNeeded rows exceeds the bounded-heap range; " +
        "at this scale use hashSample/tokenBudgetSample (threshold cut), not a top-k draw")
    if (maxTarget == 0) {
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        quotaSample(df.limit(1), groupCol, idCol, 1)
          .withColumn("target", lit(0L)).schema)
    } else {
      quotaSample(df, groupCol, idCol, kNeeded.toInt)
        .join(broadcast(alloc.select(col(groupCol), col("target"))), Seq(groupCol))
        .filter(col("sample_rank") <= col("target"))
    }
  }

  /** Temperature-weighted (τ=0.5) TOKEN-budget mixture across strata —
    * the end-stage a pretraining mix actually runs: each group's share
    * of the corpus-wide token budget is proportional to sqrt of its
    * token mass (so heavy domains are tempered, light ones boosted),
    * then the group's share is filled greedily in md5(id) order with an
    * exact running token total. Same cross-engine determinism story as
    * [[temperatureAllocation]]: sqrt/·/floor are correctly-rounded IEEE
    * ops, the weight is a quantized Long, and the within-group cumsum
    * is exact integer arithmetic.
    *
    * Shape: one group-keyed aggregate for weights (|groups| rows,
    * broadcast back), one group-partitioned ordered window for the
    * cumsum — per-group state is a single Long, partitioning is by the
    * stratum key, so this survives any corpus size; a single
    * pathological mega-group degrades to [[tokenBudgetSample]]'s cost
    * on that group alone (and can be pre-cut with [[hashSample]] at a
    * fraction ~ target/grp_tokens when even that is too much).
    *
    * Output: the selected rows with `cum_tokens_grp` and the group's
    * `tok_target` attached.
    */
  def stratifiedTokenBudget(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val g = df.groupBy(col(groupCol)).agg(sum(col(tokensCol)).as("grp_tokens"))
      .withColumn("w_quant",
        floor(sqrt(col("grp_tokens").cast("double")) * lit(1e9)).cast("long"))
    val tot = g.agg(sum(col("w_quant")).as("__tot"))
    val targets = g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("grp_tokens"),
        floor(lit(budget).cast("double") * col("w_quant") / col("__tot"))
          .cast("long").as("tok_target"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__rk"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__rk", rankKey(col(idCol)))
      .withColumn("cum_tokens_grp", sum(col(tokensCol)).over(w))
      .join(broadcast(targets.drop("grp_tokens")), Seq(groupCol))
      .filter(col("cum_tokens_grp") <= col("tok_target"))
      .drop("__rk")
  }

  /** Weighted sample WITHOUT replacement, Efraimidis–Spirakis (IPL 2006):
    * each row draws key = -ln(u)/w and the n SMALLEST keys are the
    * sample — inclusion probability ∝ weight, one pass, no sequential
    * state. The uniform u comes from the first 12 md5 hex chars of the
    * id ((v + 0.5) / 2^48, never 0), so like every sampler here the
    * draw is a pure function of the id: engine-replayable, re-run
    * stable, and the same row keeps the same key when the corpus around
    * it changes. Keys are ranked ROUNDED to 9 dp so the cut is
    * engine-stable. Rows with weight <= 0 (or null) are EXCLUDED before
    * the key draw — -ln(u)/w is negative or -Inf there, which would sort
    * those rows FIRST and silently dominate the sample instead of never
    * appearing in it (inclusion ∝ weight says p=0). Plan: map-only key +
    * TakeOrdered (bounded per-task heap of n) — no full sort, no shuffle
    * of losers.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n >= 1)
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("double") + lit(0.5)) / lit(math.pow(2.0, 48))
    val key = round(-log(u) / col(weightCol).cast("double"), 9)
    df.filter(col(weightCol).cast("double") > 0)
      .select(col(idCol), col(weightCol).cast("double").as("weight"),
      key.as("es_key"))
      .orderBy(col("es_key"), col(idCol))
      .limit(n)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("es_key"), col(idCol))))
  }
}
