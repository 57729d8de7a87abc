package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HashKernelsSpec extends AnyFunSuite {

  test("hashedShingles: distinct, sorted, correct count") {
    val sh = HashKernels.hashedShingles("abcdab", 3)
    // windows: abc bcd cda dab — all distinct
    assert(sh.length == 4)
    assert(sh.toSeq == sh.sorted.toSeq)
    // repeated text dedups
    assert(HashKernels.hashedShingles("aaaa", 2).length == 1)
    // shorter than k → one truncated shingle
    assert(HashKernels.hashedShingles("ab", 5).length == 1)
    assert(HashKernels.hashedShingles("", 3).isEmpty)
  }

  test("jaccardSorted agrees with set arithmetic") {
    val a = HashKernels.hashedShingles("the quick brown fox", 3)
    val b = HashKernels.hashedShingles("the quick brown cat", 3)
    val sa = a.toSet; val sb = b.toSet
    val expected = sa.intersect(sb).size.toDouble / sa.union(sb).size
    assert(math.abs(HashKernels.jaccardSorted(a, b) - expected) < 1e-12)
    assert(HashKernels.jaccardSorted(a, a) == 1.0)
    val c = HashKernels.hashedShingles("zzzzzzzz", 3)
    assert(HashKernels.jaccardSorted(a, c) == 0.0)
  }

  test("minhashSig estimates jaccard") {
    val a = HashKernels.hashedShingles("x" * 200 + "abcdefghij" * 30, 5)
    val b = HashKernels.hashedShingles("x" * 200 + "abcdefghij" * 30 + "qq", 5)
    val sa = HashKernels.minhashSig(a, 256)
    val sb = HashKernels.minhashSig(b, 256)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
    val truth = HashKernels.jaccardSorted(a, b)
    assert(math.abs(est - truth) < 0.15)
    // identical input → identical signature (determinism)
    assert(HashKernels.minhashSig(a, 64).toSeq == HashKernels.minhashSig(a, 64).toSeq)
  }

  test("one-permutation minhash estimates jaccard and densifies empty bins") {
    val rnd = new scala.util.Random(23)
    // two large random sets with engineered ~0.5 overlap
    val shared = Array.fill(2000)(rnd.nextLong())
    val a = (shared ++ Array.fill(1000)(rnd.nextLong())).distinct.sorted
    val b = (shared ++ Array.fill(1000)(rnd.nextLong())).distinct.sorted
    val truth = HashKernels.jaccardSorted(a, b)
    val sa = HashKernels.minhashSigOPH(a, 64)
    val sb = HashKernels.minhashSigOPH(b, 64)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 64
    assert(math.abs(est - truth) < 0.2, s"OPH estimate $est vs truth $truth")
    // small set (fewer shingles than bins): every bin still defined
    val tiny = HashKernels.hashedShingles("abcdefg", 3)
    val st = HashKernels.minhashSigOPH(tiny, 64)
    assert(tiny.length < 64 && st.forall(_ != Long.MaxValue))
    // determinism
    assert(HashKernels.minhashSigOPH(a, 32).toSeq == HashKernels.minhashSigOPH(a, 32).toSeq)
    // empty input stays all-sentinel (no fabricated matches with another empty?
    // verification filters empties; just pin the shape)
    assert(HashKernels.minhashSigOPH(Array.emptyLongArray, 8).forall(_ == Long.MaxValue))
  }

  test("simhash: small edits stay within small hamming distance") {
    val s1 = HashKernels.simhash64("the quick brown fox jumps over the lazy dog again and again")
    val s2 = HashKernels.simhash64("the quick brown fox jumps over the lazy cat again and again")
    val s3 = HashKernels.simhash64("entirely different words with nothing shared whatsoever here")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s1, s2) < ham(s1, s3))
    assert(HashKernels.simhash64("abc def") == HashKernels.simhash64("abc def"))
  }

  test("dot product and hyperplane signature") {
    val v1 = Array(1.0f, 2.0f, 3.0f)
    val v2 = Array(4.0f, 5.0f, 6.0f)
    assert(HashKernels.dotD(v1, v2) == 32.0)
    assert(HashKernels.hyperplaneSig(v1, 16, 42) ==
      HashKernels.hyperplaneSig(v1, 16, 42))
    // a vector and its negation flip every sign bit
    val neg = v1.map(x => -x)
    val s = HashKernels.hyperplaneSig(v1, 16, 42)
    val sn = HashKernels.hyperplaneSig(neg, 16, 42)
    assert((s ^ sn) == 0xFFFFL)
  }
}

class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home", "b1"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away hom!", "b1"), // near-dup of 1
    (3L, "completely unrelated text talking about database query optimization", "b1"),
    (4L, "the quick brown fox jumps over the lazy dog and runs far away home", "b2"), // exact dup of 1
    (5L, "another thing entirely with words no other document shares at all!", "b2")
  ).toDF("doc_id", "text", "blk")

  test("filterByCount keeps rows duplicated above cutoff") {
    val df = Seq("a", "a", "a", "b").toDF("v")
    assert(Dedup.filterByCount(df, "v", 2).count() == 3)
    assert(Dedup.filterByCount(df, "v", 3).count() == 0)
    // NULL keys form a duplicate group like any other (null-safe join)
    val withNulls = Seq(Some("a"), None, None, None, Some("b")).toDF("v")
    assert(Dedup.filterByCount(withNulls, "v", 2).count() == 3)
  }

  test("exact dedup keeps min-id representative with group size") {
    val r = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id", "dup_count").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r(1L) == 2) // ids 1 and 4 share text; representative = 1
    assert(!r.contains(4L))
    assert(r(2L) == 1 && r(3L) == 1 && r(5L) == 1)
  }

  private def mkCorpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val body = s"the quick brown fox number ${i / 2} jumps over the lazy dog " +
        s"and then walks through the long templated boilerplate passage " +
        s"shared by both twins of pair ${i / 2}"
      // odd twin differs by one word — a genuine near-duplicate of its even twin
      (i.toLong, if (i % 2 == 0) body else body + " extra")
    }.toDF("doc_id", "text")
  }

  test("persisted minhash index: disk probe == memory probe; partitions skipped; commit marker") {
    val corpus = mkCorpus(30)
    val even = corpus.filter(col("doc_id") % 2 === 0)
    val odd = corpus.filter(col("doc_id") % 2 === 1)
    val idx = Dedup.minhashBuildIndex(even, "doc_id", "text",
      k = 3, numHashes = 40, bands = 8)
    val path = java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    val pidx = Dedup.minhashWriteIndex(idx, path, hashBuckets = 16)
    assert(pidx == Dedup.minhashOpenIndex(spark, path))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    val mem = pairs(Dedup.minhashProbe(odd, "doc_id", "text", idx, 0.7, 2))
    val disk = pairs(Dedup.minhashProbePersisted(odd, "doc_id", "text", pidx, 0.7, 2))
    assert(mem.nonEmpty, "premise: the twin pairs must be found at all")
    assert(disk == mem, "on-disk probe diverged from the in-memory probe")
    // measured partition skipping: a single-doc probe plans a scan over
    // only its own (band, bucket) partitions
    val one = odd.limit(1)
    val buckets = Dedup.probeBandBuckets(one, "doc_id", "text", pidx)
    assert(buckets.size <= 8, s"one doc → ≤ bands partitions, got ${buckets.size}")
    // inputFiles ignores partition pruning — read the EXECUTED scan's
    // numFiles metric (the files the planner actually selected)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val prunedFiles = scannedFiles(Dedup.prunedBandedRead(spark, pidx, buckets))
    val totalFiles = scannedFiles(spark.read.parquet(s"$path/banded"))
    assert(prunedFiles < totalFiles,
      s"probe scan planned $prunedFiles of $totalFiles files — nothing skipped")
    assert(prunedFiles > 0)
    // a directory without the meta commit marker is not an index
    val raw = java.nio.file.Files.createTempDirectory("graft_mhidx_raw").toString
    intercept[IllegalArgumentException](Dedup.minhashOpenIndex(spark, raw))
    // appends must match the committed parameters
    val wrong = Dedup.minhashBuildIndex(even, "doc_id", "text",
      k = 5, numHashes = 40, bands = 8)
    intercept[IllegalArgumentException](
      Dedup.minhashWriteIndex(wrong, path, append = true))
    // a non-append write REPLACES an existing index (the bench reruns
    // each query in one session — a rewrite must not trip on its own
    // stale commit marker)
    val pidx2 = Dedup.minhashWriteIndex(idx, path, hashBuckets = 16)
    assert(pidx2 == Dedup.minhashOpenIndex(spark, path))
    assert(pairs(Dedup.minhashProbePersisted(odd, "doc_id", "text", pidx2, 0.7, 2)) == mem)
  }

  test("persisted minhash index: incremental append == full rebuild") {
    val corpus = mkCorpus(40)
    val batch1 = corpus.filter(col("doc_id") % 2 === 0 && col("doc_id") < 20)
    val batch2 = corpus.filter(col("doc_id") % 2 === 0 && col("doc_id") >= 20)
    val probe = corpus.filter(col("doc_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("graft_mhidx_inc").toString
    val pidx = Dedup.minhashWriteIndex(
      Dedup.minhashBuildIndex(batch1, "doc_id", "text", k = 3, numHashes = 40, bands = 8),
      path, hashBuckets = 16)
    Dedup.minhashExtendIndex(batch2, "doc_id", "text", pidx)
    val rebuilt = Dedup.minhashBuildIndex(
      batch1.unionByName(batch2), "doc_id", "text", k = 3, numHashes = 40, bands = 8)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    val viaDisk = pairs(Dedup.minhashProbePersisted(probe, "doc_id", "text", pidx, 0.7, 2))
    val viaRebuild = pairs(Dedup.minhashProbe(probe, "doc_id", "text", rebuilt, 0.7, 2))
    assert(viaRebuild.nonEmpty && viaDisk == viaRebuild,
      "append-maintained on-disk index diverged from a full rebuild")
    // the probe finds twins from BOTH generations of the index
    assert(viaDisk.exists(_._2 < 20) && viaDisk.exists(_._2 >= 20))
  }

  test("hammingNearDuplicates64 widens blocking past radius 3: recall stays exactly 1.0") {
    // signatures engineered to differ by 4 and 5 bits — a fixed 4x16
    // blocking gives only probabilistic recall here; the maxHamming+1
    // chunk split must find every pair
    val base = 0x0123456789abcdefL
    val sigs = Seq(
      (1L, base),
      (2L, base ^ ((1L << 0) | (1L << 17) | (1L << 33) | (1L << 49))), // 4 bits, one per 16-bit chunk
      (3L, base ^ ((1L << 1) | (1L << 18) | (1L << 34) | (1L << 50) | (1L << 63))), // 5 bits
      (4L, ~base) // far away from everything
    ).toDF("id", "sig")
    def pairs(m: Int) = Dedup.hammingNearDuplicates64(sigs, m)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force truth at each radius
    val raw = Seq((1L, base), (2L, base ^ ((1L << 0) | (1L << 17) | (1L << 33) | (1L << 49))),
      (3L, base ^ ((1L << 1) | (1L << 18) | (1L << 34) | (1L << 50) | (1L << 63))), (4L, ~base))
    def truth(m: Int) = (for {
      (ia, sa) <- raw; (ib, sb) <- raw
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= m
    } yield (ia, ib)).toSet
    Seq(3, 4, 5, 9).foreach { m =>
      assert(pairs(m) == truth(m), s"radius $m: banded pairs != exact truth")
    }
    assert(truth(5).contains((1L, 3L)), "sanity: the 5-bit pair exists")
    assertThrows[IllegalArgumentException](Dedup.hammingNearDuplicates64(sigs, 64))
  }

  test("hammingNearDuplicates64 runs the signature kernel once, not per join side") {
    // the narrow repartition(id) between the kernel and the banded
    // self-join makes both join sides canonically identical consumers
    // of ONE exchange, which the planner/AQE reuses — so the signature
    // kernel (simhash tokenization, dHash resample: the dominant map
    // cost at corpus scale) evaluates each row once. A regression to
    // per-side evaluation doubles this counter.
    import org.apache.spark.sql.functions.udf
    val spark = TestSpark.spark
    // a driver-side counter would stay at 0 (task closures deserialize
    // their own copy) — an accumulator reports executor-side calls back
    val calls = spark.sparkContext.longAccumulator("sig-kernel-calls")
    val sigU = udf((id: Long) => { calls.add(1L); id * 0x9e3779b97f4a7c15L })
      .asNondeterministic()
    val n = 64L
    val withSig = spark.range(n).select(col("id"), sigU(col("id")).as("sig"))
    calls.reset()
    Dedup.hammingNearDuplicates64(withSig, 3).count()
    val c = calls.value
    info(s"signature kernel invocations: $c for $n rows")
    assert(c >= n, s"premise: the kernel must have run at all (got $c)")
    assert(c <= n + n / 2,
      s"signature kernel ran $c times for $n rows — the join sides no longer share the exchange")
  }

  test("persisted hamming index: disk == memory, partitions skipped, append == rebuild") {
    // signatures with planted near-pairs across the index/probe split
    val base = 0x0123456789abcdefL
    val idxSigs = (0L until 40L).map(i => (i * 2, base ^ (i << 8)))
      .toDF("id", "sig")
    val probeSigs = Seq(
      (1L, base ^ (1L << 0)), // 1 bit from id 0's sig
      (3L, base ^ (1L << 8) ^ (1L << 17) ^ (1L << 33)), // 3 bits from id 2's
      (5L, ~base) // far from everything
    ).toDF("id", "sig")
    val path = java.nio.file.Files.createTempDirectory("graft_phidx").toString
    val pidx = Dedup.hammingWriteIndex(idxSigs, path,
      maxHamming = 3, hashBuckets = 16)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("id_new", "id_old", "hamming_bits")
      .as[(Long, Long, Int)].collect().toSet
    val mem = pairs(Dedup.hammingProbe(probeSigs, idxSigs, maxHamming = 3))
    val disk = pairs(Dedup.hammingProbePersisted(probeSigs, pidx))
    assert(mem.contains((1L, 0L, 1)) && mem.contains((3L, 2L, 2)),
      "premise: the planted near-pairs must be found")
    assert(!mem.exists(_._1 == 5L))
    assert(disk == mem, "on-disk hamming probe diverged from the in-memory probe")
    // measured partition skipping: a 1-row probe plans ≤ 4 partitions
    val one = probeSigs.limit(1)
    val buckets = Dedup.hammingProbeBuckets(one, pidx)
    assert(buckets.size <= 4, s"one sig → ≤ maxHamming+1 partitions, got ${buckets.size}")
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val prunedFiles = scannedFiles(Dedup.prunedHammingRead(spark, pidx, buckets))
    val totalFiles = scannedFiles(spark.read.parquet(s"$path/chunked"))
    assert(prunedFiles < totalFiles && prunedFiles > 0,
      s"probe scan planned $prunedFiles of $totalFiles files — nothing skipped")
    // incremental append == full rebuild
    val delta = (40L until 60L).map(i => (i * 2, base ^ (i << 8)))
      .toDF("id", "sig")
    Dedup.hammingExtendIndex(delta, pidx)
    val probe2 = Seq((41L, base ^ (50L << 8) ^ (1L << 1))).toDF("id", "sig")
    val viaDisk = pairs(Dedup.hammingProbePersisted(probe2, pidx))
    val viaMem = pairs(Dedup.hammingProbe(probe2,
      idxSigs.unionByName(delta), maxHamming = 3))
    assert(viaMem.nonEmpty && viaDisk == viaMem,
      "append-maintained hamming index diverged from a full rebuild")
    assert(viaDisk.exists(_._2 == 100L), "the delta-generation twin must be found")
    // a directory without the meta commit marker is not an index
    val raw = java.nio.file.Files.createTempDirectory("graft_phidx_raw").toString
    intercept[IllegalArgumentException](Dedup.hammingOpenIndex(spark, raw))
    // a non-append write REPLACES an existing index (bench rerun safety)
    val pidx2 = Dedup.hammingWriteIndex(idxSigs, path,
      maxHamming = 3, hashBuckets = 16)
    assert(pidx2 == Dedup.hammingOpenIndex(spark, path))
    assert(pairs(Dedup.hammingProbePersisted(probeSigs, pidx2)) == mem)
  }

  test("exact dedup: null ids sort first and never null out the representative") {
    val df = Seq(
      (Some(7L), "x", "keep7"),
      (None, "x", "keepNull"), // null id sorts before 7 (window parity)
      (None, "y", "onlyNull")) // all-null-id group must keep its row
      .toDF("doc_id", "text", "payload")
    val r = Dedup.exact(df, "text", "doc_id").collect()
      .map(x => x.getString(1) ->
        ((x.getString(2), x.getLong(x.fieldIndex("dup_count"))))).toMap
    assert(r("x") == (("keepNull", 2L)))
    assert(r("y") == (("onlyNull", 1L)))
    // a pre-existing dup_count column is replaced, not duplicated
    val again = Dedup.exact(Dedup.exact(df, "text", "doc_id"), "text", "doc_id")
    assert(again.columns.count(_ == "dup_count") == 1)
  }

  test("minhash near-duplicates finds the near pair, not the unrelated") {
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      k = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // exact dup → jaccard 1
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("minhash bucket cap: no-op on healthy buckets, bounds a boilerplate clique") {
    // Healthy corpus: a generous cap must not change the verified pair set.
    def pairSet(df: org.apache.spark.sql.DataFrame, cap: Int) =
      Dedup.minhashNearDuplicates(df, "doc_id", "text",
        k = 3, numHashes = 64, bands = 16, threshold = 0.5, maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(docs, 100) == pairSet(docs, 0))

    // Degenerate corpus: 40 identical boilerplate docs (a clique — every
    // band bucket holds all 40) plus the planted near-dup pair. A cap of
    // 10 must kill the clique's 780 pairs (every one of its buckets is
    // over-cap) while the distinct near-dup pair is still found through
    // its own under-cap buckets.
    val boiler = (100L until 140L).map(i =>
      (i, "identical boilerplate license header repeated across the corpus", "b9"))
    val poisoned = docs.union(boiler.toDF("doc_id", "text", "blk"))
    val capped = pairSet(poisoned, 10)
    assert(capped.contains((1L, 2L)), "planted near-dup must survive the cap")
    assert(!capped.exists(p => p._1 >= 100L || p._2 >= 100L),
      "over-cap boilerplate clique must contribute no pairs")
    val uncapped = pairSet(poisoned, 0)
    assert(uncapped.count(p => p._1 >= 100L && p._2 >= 100L) == 40 * 39 / 2,
      "sanity: without the cap the clique is quadratic")
  }

  test("ngramJaccard respects blocking") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", "blk", n = 3,
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // (1,2) same block and similar; (1,4) identical but DIFFERENT blocks
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 > 0.8))
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 4L))
  }

  test("simhash near-duplicates links only near-identical docs") {
    val pairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // identical text → hamming 0
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("connected components group transitive near-dup chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("distributed label-propagation path matches the union-find path") {
    // chain + star + singleton pair; force the loop with threshold 0
    val pairs = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L),
      (20L, 21L), (20L, 22L), (20L, 23L), (30L, 31L)).toDF("id_a", "id_b")
    val loop = Dedup.connectedComponents(pairs, driverSideMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val uf = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(loop == uf)
    assert(loop(5L) == 1L && loop(23L) == 20L && loop(31L) == 30L)
  }

  test("dropNearDuplicates keeps one representative per cluster") {
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text",
      k = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // docs 1, 2, 4 are mutual near-dups -> representative 1 survives;
    // 3 and 5 are unrelated singletons
    assert(kept == Set(1L, 3L, 5L))
  }

  test("label propagation converges on a long chain within maxIter (pointer jumping)") {
    // 60-link path: plain min-label propagation needs ~60 rounds; pointer
    // jumping needs ~log2(60) ≈ 6. maxIter=10 would previously truncate
    // silently — now it must converge (a non-convergent exit throws).
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(chain, maxIter = 10, driverSideMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comps.length == 61)
    assert(comps.forall(_._2 == 0L), "all chain members should label to min id 0")
  }

  test("winnowed fingerprints: guarantee, density, determinism") {
    val rnd = new scala.util.Random(41)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val k = 8; val w = 16
    // guarantee: any shared substring of length >= w+k-1 shares a print
    val shared = randStr(w + k - 1) // exactly the guarantee boundary
    for (_ <- 0 until 20) {
      val a = randStr(100) + shared + randStr(100)
      val b = randStr(120) + shared + randStr(80)
      val fa = HashKernels.winnowedFingerprints(a, k, w).toSet
      val fb = HashKernels.winnowedFingerprints(b, k, w).toSet
      assert(fa.intersect(fb).nonEmpty,
        "winnowing guarantee violated: shared 23-char substring, no shared print")
    }
    // density ~ 2/(w+1): a 10k doc should produce far fewer prints than k-grams
    val big = randStr(10000)
    val prints = HashKernels.winnowedFingerprints(big, k, w)
    assert(prints.length < 10000 / 4, s"density too high: ${prints.length}")
    assert(prints.length > 10000 / (4 * w), s"density too low: ${prints.length}")
    // determinism + short-input handling
    assert(HashKernels.winnowedFingerprints(big, k, w).toSeq == prints.toSeq)
    assert(HashKernels.winnowedFingerprints("abc", 8, 16).isEmpty)
    assert(HashKernels.winnowedFingerprints("abcdefgh", 8, 16).length == 1)
  }

  test("sharedSubstringPairs finds planted long overlaps, prunes boilerplate") {
    val rnd = new scala.util.Random(43)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val passage = randStr(80) // long shared passage between docs 1 and 2
    val boiler = randStr(40) // "license header" present in EVERY doc
    val rows = Seq(
      (1L, boiler + randStr(200) + passage),
      (2L, boiler + passage + randStr(150)),
      (3L, boiler + randStr(250)),
      (4L, boiler + randStr(250)),
      (5L, boiler + randStr(250))).toDF("doc_id", "text")
    val pairs = Dedup.sharedSubstringPairs(rows, "doc_id", "text",
      k = 8, window = 16, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted 80-char passage not found: $pairs")
    // boilerplate prints occur in 5 docs > maxDocFreq=3 → no pair from them
    assert(!pairs.contains((3L, 4L)), s"boilerplate-only pair leaked: $pairs")
  }

  test("ngramJaccard skew guard: grid sub-blocking is exact") {
    // one pathological hot block (200 rows, all same blk) — force g>1 via a
    // tiny maxBlockRows and check the pair set is IDENTICAL to the
    // single-task run (the grid assigns every pair to exactly one cell).
    val rnd = new scala.util.Random(3)
    val hot = (0 until 200).map { i =>
      val base = "shared prefix words here " * 3
      (i.toLong, base + rnd.alphanumeric.take(10).mkString, "hot")
    }.toDF("doc_id", "text", "blk")
    def pairSet(maxBlockRows: Int) =
      Dedup.ngramJaccard(hot, "doc_id", "text", "blk", n = 3,
        threshold = 0.5, maxBlockRows = maxBlockRows)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = pairSet(25) // g = ceil(200/25) = 8 → 36 grid cells
    val plain = pairSet(1000000)
    assert(salted == plain, s"grid-split changed results: ${salted.size} vs ${plain.size} pairs")
    assert(plain.nonEmpty)
  }

  test("minhashBandBuckets: bucket equality iff the band's signature rows agree") {
    // the fused kernel must preserve exactly the LSH collision structure of
    // banding the classic signature: band b collides iff sig rows agree
    val rnd = new scala.util.Random(7)
    val numHashes = 32; val bands = 8; val rows = numHashes / bands
    (0 until 50).foreach { _ =>
      val a = Array.fill(rnd.nextInt(60) + 5)(rnd.nextLong())
      // b shares a's tail — some bands will agree, some won't
      val b = a.take(rnd.nextInt(a.length)) ++
        Array.fill(rnd.nextInt(30))(rnd.nextLong())
      val (sa, sb) = (HashKernels.minhashSig(a.distinct.sorted, numHashes),
        HashKernels.minhashSig(b.distinct.sorted, numHashes))
      val (ba, bb) = (HashKernels.minhashBandBuckets(a.distinct.sorted, numHashes, bands),
        HashKernels.minhashBandBuckets(b.distinct.sorted, numHashes, bands))
      (0 until bands).foreach { band =>
        val sigRowsEqual = (0 until rows).forall(r =>
          sa(band * rows + r) == sb(band * rows + r))
        assert((ba(band) == bb(band)) == sigRowsEqual,
          s"band $band: bucket collision disagrees with signature-row equality")
      }
    }
  }

  test("lshPlan: S-curve inflection lands near the threshold; monotone in t") {
    val plans = Seq(0.2, 0.5, 0.8).map(t => t -> Dedup.lshPlan(t, 128))
    plans.foreach { case (t, (b, r)) =>
      assert(b * r == 128)
      // the curve's 50% point (1/b)^(1/r) should sit near the threshold
      val mid = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(mid - t) < 0.15, s"t=$t -> (b=$b,r=$r), mid=$mid")
    }
    // higher thresholds demand longer bands (more rows per band)
    val rowsSeq = plans.map(_._2._2)
    assert(rowsSeq == rowsSeq.sorted, s"rows not monotone: $rowsSeq")
    // degenerate budgets still return a legal split
    assert(Dedup.lshPlan(0.5, 1) == ((1, 1)))
  }
}
