package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bitPositions: k positions, in range, deterministic, h2 stride") {
    val p = BloomIndex.bitPositions(0x0123456789abcdefL, 7, 4096)
    assert(p.length == 7 && p.forall(x => x >= 0 && x < 4096))
    assert(p.toSeq == BloomIndex.bitPositions(0x0123456789abcdefL, 7, 4096).toSeq)
    // negative hash still lands in range
    val n = BloomIndex.bitPositions(Long.MinValue + 3, 7, 4096)
    assert(n.forall(x => x >= 0 && x < 4096))
  }

  test("bloom sidecar: no false negatives, measured skipping, stale refusal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    // cluster by x so `id` scatters: id's min/max box spans every file
    // and stats pruning is useless — the bloom's exact use case
    val base = spark.range(20000).select(
      col("id"), ((col("id") * 7919L) % 500).as("x"))
    Layout.writeClustered(base, dir, col("x"), nFiles = 10, statsCols = Nil)
    val meta = BloomIndex.writeBloomSidecar(spark, dir, "id")
    assert(meta.mBits >= 64 && meta.k == 7)

    // NO FALSE NEGATIVES: for a battery of present values, the pruned
    // read must contain every matching row
    val probes = Seq(0L, 1L, 777L, 19999L, 4242L)
    val (cand, total, df) = BloomIndex.bloomPrunedRead(spark, dir, "id", probes)
    assert(total == 10)
    val got = df.filter(col("id").isin(probes: _*))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == probes.sorted, s"bloom lost rows: $got")
    // MEASURED SKIPPING: 5 scattered ids live in ≤5 files; false
    // positives are rare at 10 bits/key — at least half the files skip
    assert(cand <= 7, s"expected ≤7 candidate files, got $cand/$total")

    // an absent value prunes everything (up to false positives) and
    // the re-filtered read is empty either way
    val (candA, _, dfA) = BloomIndex.bloomPrunedRead(spark, dir, "id", Seq(-99L))
    assert(candA <= 1)
    assert(dfA.filter(col("id") === -99L).isEmpty)

    // STALE REFUSAL: an append bumps the snapshot; the old sidecar
    // would miss the new rows and must refuse, naming the rebuild
    Layout.appendClustered(
      spark.range(50000, 50010).select(col("id"), (col("id") % 500).as("x")),
      dir, col("x"), nFiles = 1)
    val ex = intercept[IllegalArgumentException](
      BloomIndex.bloomPrunedRead(spark, dir, "id", Seq(50005L)))
    assert(ex.getMessage.contains("writeBloomSidecar"))
    // rebuild covers the appended rows
    BloomIndex.writeBloomSidecar(spark, dir, "id")
    val (_, total2, df2) = BloomIndex.bloomPrunedRead(spark, dir, "id", Seq(50005L))
    assert(total2 == 11)
    assert(df2.filter(col("id") === 50005L).count() == 1L)

    // a column the table lacks, and a missing sidecar, refuse loudly
    intercept[IllegalArgumentException](
      BloomIndex.writeBloomSidecar(spark, dir, "nope"))
    intercept[IllegalArgumentException](
      BloomIndex.bloomPrunedRead(spark, dir, "x", Seq(1L)))
  }

  test("extendBloomSidecar follows appends without a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_ext").toString
    val base = spark.range(10000).select(
      col("id"), ((col("id") * 7919L) % 500).as("x"))
    Layout.writeClustered(base, dir, col("x"), nFiles = 8)
    val m0 = BloomIndex.writeBloomSidecar(spark, dir, "id")
    assert(m0.rowsCapacity > 0L)
    // two appends land new files the sidecar has no rows for
    Layout.appendClustered(
      spark.range(20000, 20300).select(col("id"), (col("id") % 500).as("x")),
      dir, col("x"), nFiles = 1)
    Layout.appendClustered(
      spark.range(30000, 30300).select(col("id"), (col("id") % 500).as("x")),
      dir, col("x"), nFiles = 1)
    // DELTA maintenance: bloom rows for just the appended files, meta
    // bumped to the current snapshot — no rebuild of the base filters
    val before = spark.read.parquet(s"$dir/_blooms/id/data")
      .select("file").as[String].collect().toSet
    val m1 = BloomIndex.extendBloomSidecar(spark, dir, "id")
    val snap = Layout.latestSnapshot(spark, dir).get
    assert(m1.version == snap.version && m1.mBits == m0.mBits && m1.k == m0.k)
    val after = spark.read.parquet(s"$dir/_blooms/id/data")
      .select("file").as[String].collect().toSet
    assert(before.subsetOf(after), "extension must not rewrite base rows")
    assert((after -- before).nonEmpty && (after -- before)
      .forall(n => n.startsWith("part-append-")),
      s"only appended files gain rows, got ${after -- before}")
    // probe straddles base + both appended generations: no false negatives
    val probes = Seq(7L, 20100L, 30299L)
    val (cand, total, df) = BloomIndex.bloomPrunedRead(spark, dir, "id", probes)
    assert(total == 10)
    assert(df.filter(col("id").isin(probes: _*)).count() == 3L)
    assert(cand < total, s"expected skipping, got $cand/$total")
    // already-current extension is a no-op; a fresh rebuild still works
    assert(BloomIndex.extendBloomSidecar(spark, dir, "id").version == snap.version)
  }

  test("bloom probe hashes ride the engine's xxhash64 — type-faithful") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_str").toString
    // string column: probe must hash the STRING, not a stringified long
    val base = spark.range(5000).select(
      col("id"), concat(lit("doc-"), col("id")).as("name"),
      (col("id") % 100).as("x"))
    Layout.writeClustered(base, dir, col("x"), nFiles = 8)
    BloomIndex.writeBloomSidecar(spark, dir, "name")
    val (cand, total, df) = BloomIndex.bloomPrunedRead(
      spark, dir, "name", Seq("doc-4999", "doc-0"))
    assert(df.filter(col("name").isin("doc-4999", "doc-0")).count() == 2L)
    assert(cand < total, s"expected skipping, got $cand/$total")
  }
}
