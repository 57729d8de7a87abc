package graft.io

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Within-file BAM splits (round-3 verdict #2) and .bai region fetch
  * (verdict #3). Mirrors FastqSpec's split-boundary stress: every split
  * size must produce exactly the whole-file record set — no duplicates,
  * no drops — even when records straddle BGZF block boundaries.
  */
class BamScanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val rnd = new scala.util.Random(11)
  private val bases = "ACGT"

  /** Coordinate-sorted synthetic records across three references. */
  private def mkRecords(n: Int): Seq[Bam.BamRecord] = {
    var pos = Map("chr1" -> 1, "chr2" -> 1, "chr3" -> 1)
    (0 until n).map { i =>
      val rname = s"chr${i * 3 / n + 1}" // sorted: chr1 block, then chr2, chr3
      val p = pos(rname) + rnd.nextInt(900)
      pos = pos.updated(rname, p)
      val len = 20 + rnd.nextInt(61)
      val seq = Array.fill(len)(bases(rnd.nextInt(4))).mkString
      val qual = Array.fill(len)((33 + rnd.nextInt(60)).toChar).mkString
      val cigar =
        if (i % 7 == 0 && len > 12) s"5S${len - 10}M5S"
        else if (i % 5 == 0 && len > 8) s"${len - 4}M2D4M"
        else s"${len}M"
      val opt: Map[String, String] =
        if (i % 3 == 0) Map("NM" -> (i % 9).toString) else Map.empty
      Bam.BamRecord(f"r$i%05d", 0, rname, p, 60, cigar, "*", 0, 0, seq, qual, opt)
    }
  }

  private def writeBam(recs: Seq[Bam.BamRecord], blockData: Int): String = {
    val refs = Seq(("chr1", 1 << 20), ("chr2", 1 << 20), ("chr3", 1 << 20))
    val payload = Bam.encode(recs.iterator, refs)
    val f = Files.createTempFile("bamscan", ".bam")
    Files.write(f, Bgzf.compress(payload, blockData))
    f.toFile.getAbsolutePath
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getString(2), r.getInt(3), r.getString(5), r.getString(9), r.getString(10))

  test("split reads equal the whole-file decode at every boundary (records straddle blocks)") {
    val recs = mkRecords(800)
    val path = writeBam(recs, blockData = 2048) // ~50 blocks, records straddle
    val whole = Bam.decode(
      Bgzf.inflate(Files.readAllBytes(java.nio.file.Paths.get(path)))).toSeq
    assert(whole.size == 800)
    val fileLen = new java.io.File(path).length()
    for (splitSize <- Seq(1024L, 3000L, 4096L, 7777L, fileLen - 1, fileLen, 10 * fileLen)) {
      val df = Bam.read(spark, path, splitSize = splitSize)
      if (splitSize <= fileLen / 4)
        assert(df.rdd.getNumPartitions >= 4,
          s"splitSize=$splitSize must shard the single file into >=4 tasks")
      val got = df.collect().map(key).toSeq.sorted
      val want = whole.map(r => (r.header, r.rname, r.pos, r.cigar, r.seq, r.qual)).sorted
      assert(got == want, s"splitSize=$splitSize lost or duplicated records")
    }
  }

  test("mid-file record resync: a split that opens inside a record finds the next one") {
    // tiny blocks + tiny splits put nearly every split boundary inside a
    // record; equality is only possible if resync lands exactly on record
    // starts (a single off-by-one would desync every following field)
    val recs = mkRecords(300)
    val path = writeBam(recs, blockData = 512)
    val got = Bam.read(spark, path, splitSize = 700).collect()
    assert(got.length == 300)
    assert(got.map(_.getString(0)).sorted.toSeq == recs.map(_.header).sorted)
    // opt map survives the split path too
    val withNm = got.filter(r => !r.isNullAt(11) && r.getMap[String, String](11).contains("NM"))
    assert(withNm.length == recs.count(_.opt.contains("NM")))
  }

  test("truncated BAM fails loudly through the split reader") {
    val recs = mkRecords(100)
    val path = writeBam(recs, blockData = 2048)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 40) // rips the EOF + part of last block
    val f = Files.createTempFile("bamtrunc", ".bam")
    Files.write(f, cut)
    val e = intercept[org.apache.spark.SparkException] {
      Bam.read(spark, f.toFile.getAbsolutePath).collect()
    }
    assert(e.getMessage.contains("BGZF") || e.getMessage.contains("truncated") ||
      Option(e.getCause).exists(c => c.getMessage.contains("BGZF") || c.getMessage.contains("truncated")))
  }

  test("reg2bin/reg2bins match the SAM-spec binning scheme") {
    assert(Bai.reg2bin(0, 1) == 4681) // first 16 Kbp leaf
    assert(Bai.reg2bin(16384, 16385) == 4682)
    assert(Bai.reg2bin(0, 16385) == 585) // spans two leaves -> 128 Kbp level
    assert(Bai.reg2bin(0, 1 << 29) == 0) // whole range -> root
    val bins = Bai.reg2bins(100000, 200000)
    assert(bins.contains(0) && bins.contains(Bai.reg2bin(100000, 100001)))
    // every record bin for a position inside the query must be probed
    for (p <- Seq(100000, 150000, 199999))
      assert(bins.contains(Bai.reg2bin(p, p + 50)),
        s"bin of record at $p missing from query bins")
  }

  test("bai round-trip + region fetch: identical rows to a full-scan filter, tiny byte footprint") {
    val recs = mkRecords(2000)
    val path = writeBam(recs, blockData = 2048)
    val conf = new Configuration()
    val fs = new Path(path).getFileSystem(conf)
    val idx = Bai.build(fs, new Path(path))
    Bai.write(idx, fs, new Path(path + ".bai"))
    val back = Bai.read(fs, new Path(path + ".bai"))
    assert(back == idx, ".bai write/read round-trip")

    val (rname, beg, end) = ("chr2", 2000, 9000)
    val fetched = Bam.fetch(spark, path, rname, beg, end).collect().map(key).toSeq.sorted
    val full = Bam.read(spark, path).collect()
      .filter { r =>
        r.getString(2) == rname && r.getInt(3) <= end &&
          r.getInt(3) + math.max(1, graft.align.Cigar.refConsumed(r.getString(5))) - 1 >= beg
      }
      .map(key).toSeq.sorted
    assert(fetched.nonEmpty, "fixture must contain reads in the queried region")
    assert(fetched == full, "indexed fetch must equal full-scan + overlap filter")

    // the point of the index: the fetch touches a small corner of the file
    // (blockLenHint 4 KiB: the fixture's 2 KiB-payload blocks compress
    // well under that)
    val refId = 1 // chr2
    val chunks = Bai.chunksFor(idx, refId, beg - 1, end)
    val fileLen = new java.io.File(path).length()
    val touched = Bai.compressedBytesTouched(chunks, blockLenHint = 4096L)
    assert(touched < fileLen / 4,
      s"fetch reads $touched of $fileLen bytes — index isn't pruning")
  }

  test("sharded layout: writeSharded + fetchSharded equal the full-scan filter") {
    import spark.implicits._
    val recs = mkRecords(1500)
    val dir = java.nio.file.Files.createTempDirectory("graft_bam_sharded").toString
    // UNSORTED input frame — writeSharded owns the coordinate ordering
    val df = spark.createDataset(rnd.shuffle(recs)).toDF()
    val files = Bam.writeSharded(df, dir, nShards = 4, blockData = 2048)
    assert(files.length > 1, "fixture must actually produce multiple shards")
    files.foreach(f => assert(new java.io.File(f + ".bai").exists(), s"missing index for $f"))

    val (rname, beg, end) = ("chr2", 2000, 9000)
    val fetched = Bam.fetchSharded(spark, dir, rname, beg, end)
      .collect().map(key).toSeq.sorted
    val full = Bam.read(spark, dir).collect()
      .filter { r =>
        r.getString(2) == rname && r.getInt(3) <= end &&
          r.getInt(3) + math.max(1, graft.align.Cigar.refConsumed(r.getString(5))) - 1 >= beg
      }
      .map(key).toSeq.sorted
    assert(fetched.nonEmpty, "fixture must contain reads in the queried region")
    assert(fetched == full, "sharded fetch must equal full-scan + overlap filter")

    // range sharding means the region's reads live in few shards: at
    // least one shard prunes entirely (no chr2, or no overlapping bins)
    val conf = new org.apache.hadoop.conf.Configuration()
    val pruned = files.count { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val hdr = { val in = fs.open(hp); try BamScan.readHeader(in) finally in.close() }
      val refId = hdr.refs.indexOf(rname)
      refId < 0 ||
        Bai.chunksFor(Bai.read(fs, new Path(p + ".bai")), refId, beg - 1, end).isEmpty
    }
    assert(pruned >= 1, "expected at least one shard to prune via its .bai")

    // from_pysam parity surface: a region fromBam over the sharded DIR
    // routes through fetchSharded and matches the single-file reads
    val viaSeqTable = graft.core.SeqTable
      .fromBam(spark, dir, region = Some((rname, beg, end)))
      .reads.select("read_id").collect().map(_.getString(0)).toSeq.sorted
    val expectIds = full.map(_._1).sorted
    assert(viaSeqTable == expectIds, "fromBam(dir, region) must route through the sharded fetch")

    // re-sharding the SAME dir with fewer shards must clean the old
    // layout — stale part-*.bam would be mixed into listBams-driven reads
    val files2 = Bam.writeSharded(df, dir, nShards = 2, blockData = 2048)
    val onDisk = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".bam")).sorted.toSeq
    assert(onDisk == files2.map(p => new Path(p).getName).sorted.toSeq,
      s"stale shards survived the re-shard: $onDisk vs ${files2.map(p => new Path(p).getName)}")
    assert(Bam.read(spark, dir).count() == recs.length.toLong,
      "re-sharded dir must hold exactly one copy of every record")
  }

  test("buildAll indexes every .bam in a directory, one task per file") {
    val dir = Files.createTempDirectory("baidir")
    for (i <- 0 until 3) {
      val recs = mkRecords(100)
      val payload = Bam.encode(recs.iterator,
        Seq(("chr1", 1 << 20), ("chr2", 1 << 20), ("chr3", 1 << 20)))
      Files.write(dir.resolve(s"s$i.bam"), Bgzf.compress(payload, 2048))
    }
    val bais = Bai.buildAll(spark, dir.toFile.getAbsolutePath)
    assert(bais.size == 3 && bais.forall(_.endsWith(".bai")))
    for (i <- 0 until 3) // paths come back scheme-qualified; stat the files
      assert(dir.resolve(s"s$i.bam.bai").toFile.length() > 0)
    // and the written indexes drive a real fetch
    val bam = dir.resolve("s0.bam").toFile.getAbsolutePath
    assert(Bam.fetch(spark, bam, "chr1", 1, 100000).count() > 0)
  }

  test("property: random records/blocks/split grids never lose or duplicate a record") {
    // Spark-free: drive BamScan.splitRecords directly over randomized
    // (record count, block size, split size) triples — the union of all
    // splits must be exactly the whole-file decode, every time. This is
    // the ownership contract under fuzz, not just at hand-picked sizes.
    val conf = new Configuration()
    for (c <- 1 to 25) {
      val recs = mkRecords(20 + rnd.nextInt(150))
      val blockData = 256 + rnd.nextInt(4000)
      val path = writeBam(recs, blockData)
      val fileLen = new java.io.File(path).length()
      val splitSize = 200L + rnd.nextInt(math.max(1, fileLen.toInt))
      val fs = new Path(path).getFileSystem(conf)
      val got = (0L until fileLen by splitSize).flatMap { off =>
        BamScan.splitRecords(fs, new Path(path), fileLen,
          off, math.min(off + splitSize, fileLen),
          new java.io.File(path).lastModified()).toSeq
      }
      val want = Bam.decode(
        Bgzf.inflate(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))).toSeq
      assert(got.map(_.header).sorted == want.map(_.header).sorted,
        s"case $c: n=${recs.size} blockData=$blockData splitSize=$splitSize " +
          s"fileLen=$fileLen → ${got.size} records, expected ${want.size}")
      assert(got.sortBy(_.header) == want.sortBy(_.header),
        s"case $c: record content drifted through the split path")
      new java.io.File(path).delete()
    }
  }

  test("property: syncToBlock always lands on the next true block boundary") {
    val recs = mkRecords(200)
    val path = writeBam(recs, blockData = 1024)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // ground truth: walk the BSIZE chain
    val boundaries = Iterator.iterate(0L) { p =>
      p + Bgzf.inflateBlockAt(bytes, p.toInt)._2
    }.takeWhile(_ < bytes.length).toVector
    val fs = new Path(path).getFileSystem(new Configuration())
    val in = fs.open(new Path(path))
    try {
      for (_ <- 1 to 50) {
        val from = rnd.nextInt(bytes.length).toLong
        val got = BamScan.syncToBlock(in, from, bytes.length.toLong)
        val want = boundaries.find(_ >= from).getOrElse(bytes.length.toLong)
        assert(got == want, s"sync from $from gave $got, true boundary $want")
      }
    } finally in.close()
  }

  test("SeqTable.fromBam: one-call from_pysam parity, with and without a region") {
    // sorted fixture with an index: region fetch must feed the same
    // realignment pipeline as a full read
    val recs = mkRecords(300).sortBy(r => (r.rname, r.pos))
      .map(_.copy(cigar = "20M", seq = "ACGTACGTACGTACGTACGT", qual = "IIIIIIIIIIIIIIIIIIII"))
    val path = writeBam(recs, blockData = 2048)
    val fs = new Path(path).getFileSystem(new Configuration())
    Bai.write(Bai.build(fs, new Path(path)), fs, new Path(path + ".bai"))
    val full = graft.core.SeqTable.fromBam(spark, path)
    assert(full.reads.count() == 300)
    val chr2 = recs.filter(r => r.rname == "chr2" && r.pos <= 5000)
    val sliced = graft.core.SeqTable.fromBam(spark, path, region = Some(("chr2", 1, 5000)))
    assert(sliced.reads.count() == chr2.size && chr2.nonEmpty)
    // minMapq composes with the region path (all fixture reads are mapq
    // 60); the explicit window sidesteps fromSam's can't-infer-a-window-
    // from-zero-reads contract
    assert(graft.core.SeqTable.fromBam(spark, path,
      region = Some(("chr2", 1, 5000)), minMapq = 61,
      window = Some((1, 100))).reads.isEmpty)
  }

  test("bai build rejects an unsorted BAM") {
    val recs = mkRecords(50)
    val shuffled = recs.reverse // descending positions
    val path = writeBam(shuffled, blockData = 2048)
    val fs = new Path(path).getFileSystem(new Configuration())
    val e = intercept[IllegalArgumentException] {
      Bai.build(fs, new Path(path))
    }
    assert(e.getMessage.contains("coordinate-sorted"))
  }

  test("bai build rejects records beyond the 512 Mbp BAI limit (advice r3)") {
    // beyond 1<<29 reg2bin's level-1 bins alias into the level-2 range
    // (beg>>26 == 8 -> bin 9) — htslib refuses such files; so do we
    val far = Bam.BamRecord("rFar", 0, "chrBig", (1 << 29) + 1, 60,
      "20M", "*", 0, 0, "A" * 20, "I" * 20, Map.empty)
    val payload = Bam.encode(Iterator(far), Seq(("chrBig", (1 << 30))))
    val f = Files.createTempFile("bambig", ".bam")
    Files.write(f, Bgzf.compress(payload, 4096))
    val fs = new Path(f.toString).getFileSystem(new Configuration())
    val e = intercept[IllegalArgumentException] {
      Bai.build(fs, new Path(f.toString))
    }
    assert(e.getMessage.contains("512 Mbp"))
  }

  test("zero-length .bam files are skipped at listing, not aborted on (advice r3)") {
    val dir = Files.createTempDirectory("bamdir")
    val recs = mkRecords(40)
    val good = dir.resolve("good.bam")
    Files.copy(java.nio.file.Paths.get(writeBam(recs, 2048)), good)
    Files.createFile(dir.resolve("inflight.bam")) // zero bytes — e.g. an in-progress write
    val df = Bam.read(spark, dir.toString)
    assert(df.count() == 40, "valid file must still be read, empty one skipped")
  }
}
