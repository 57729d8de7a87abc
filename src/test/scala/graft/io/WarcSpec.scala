package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDocs(n: Int): Seq[(String, String, String)] =
    (1 to n).map { i =>
      val r = new scala.util.Random(i)
      val body = (1 to 40 + r.nextInt(200)).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      (s"d$i", s"http://site$i.example/p/$i", body)
    }

  private def roundTrip(docs: Seq[(String, String, String)], splitSize: Long,
      dir: String): Set[(String, String, String)] = {
    Warc.write(docs.toDF("id", "uri", "text").repartition(3), dir)
    Warc.read(spark, dir, splitSize = splitSize)
      .collect()
      .map(r => (r.getString(0), r.getString(2),
        new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8)))
      .toSet
  }

  test("round-trips records across partitions and survives tiny splits") {
    val docs = mkDocs(60)
    val expected = docs.map { case (id, uri, t) => (s"<urn:graft:$id>", uri, t) }.toSet
    val big = roundTrip(docs, 128L * 1024 * 1024, "/tmp/graft_warc_spec/big")
    assert(big === expected)
    // 64-byte splits: every record straddles several splits; the
    // owner-of-the-version-line contract must still yield exactly-once
    val tiny = roundTrip(docs, 64L, "/tmp/graft_warc_spec/tiny")
    assert(tiny === expected)
  }

  test("conversion (WET) records round-trip with their type and Refers-To intact") {
    val docs = mkDocs(12)
    val dir = "/tmp/graft_warc_spec/wet"
    Warc.write(docs.toDF("id", "uri", "text").repartition(3), dir,
      memberGzip = true, warcType = "conversion")
    val rows = Warc.read(spark, dir, splitSize = 64L).collect()
    assert(rows.length == 12)
    assert(rows.forall(_.getString(1) == "conversion"))
    // the raw shard carries the ISO 28500 back-pointer header
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val gz = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(shard))
    val raw = new String(gz.readAllBytes(), StandardCharsets.UTF_8)
    assert(raw.contains("WARC-Type: conversion"))
    assert(raw.contains("WARC-Refers-To: <urn:graft:"))
    // response records (the default) carry no Refers-To
    Warc.write(docs.toDF("id", "uri", "text"), "/tmp/graft_warc_spec/resp")
    val rawResp = Files.readString(
      new java.io.File("/tmp/graft_warc_spec/resp").listFiles()
        .filter(_.getName.endsWith(".warc")).head.toPath)
    assert(!rawResp.contains("WARC-Refers-To"))
  }

  test("metadata (WAT) records round-trip with type, namespace and refers_to") {
    val docs = mkDocs(12)
    val dir = "/tmp/graft_warc_spec/wat"
    Warc.write(docs.toDF("id", "uri", "text").repartition(3), dir,
      memberGzip = true, warcType = "metadata")
    val rows = Warc.read(spark, dir, splitSize = 64L).collect()
    assert(rows.length == 12)
    assert(rows.forall(_.getString(1) == "metadata"))
    // meta: namespace keeps record ids distinct from the response they
    // describe; the reader surfaces the back-pointer as refers_to
    docs.foreach { case (id, _, _) =>
      val r = rows.find(_.getString(0) == s"<urn:graft:meta:$id>")
      assert(r.isDefined, s"missing meta record for $id")
      assert(r.get.getAs[String]("refers_to") == s"<urn:graft:$id>")
    }
    // response records expose an empty refers_to (no header present)
    Warc.write(docs.toDF("id", "uri", "text"), "/tmp/graft_warc_spec/resp2")
    val resp = Warc.read(spark, "/tmp/graft_warc_spec/resp2").collect()
    assert(resp.forall(_.getAs[String]("refers_to") == ""))
  }

  test("payloads containing WARC-looking bytes do not confuse the reader") {
    val docs = Seq(
      ("a", "http://x.example/a", "before\r\nWARC/1.0\r\nnot: a real record\rmid\r\n\r\nafter"),
      ("b", "http://x.example/b", "plain body"),
      ("c", "http://x.example/c", "WARC/1.0\r\nBadHeaderNoColon\r\ntail"))
    val expected = docs.map { case (id, uri, t) => (s"<urn:graft:$id>", uri, t) }.toSet
    assert(roundTrip(docs, 128L * 1024 * 1024, "/tmp/graft_warc_spec/adv") === expected)
    assert(roundTrip(docs, 48L, "/tmp/graft_warc_spec/adv2") === expected)
  }

  test("a payload ending in a version line does not swallow the next record") {
    // the pushback case: false sync consumes up to the REAL version line;
    // the scanner must re-examine that exact line
    val docs = Seq(
      ("a", "http://x.example/a", "body then\r\nWARC/1.0"),
      ("b", "http://x.example/b", "the record after"))
    val expected = docs.map { case (id, uri, t) => (s"<urn:graft:$id>", uri, t) }.toSet
    assert(roundTrip(docs, 32L, "/tmp/graft_warc_spec/push") === expected)
  }

  test("warcChunks streams one record batch per arriving file") {
    val docsA = mkDocs(4).take(2)
    val docsB = mkDocs(7).drop(4)
    Warc.write(docsA.toDF("id", "uri", "text").repartition(1), "/tmp/graft_warc_spec/stream/src_a")
    Warc.write(docsB.toDF("id", "uri", "text").repartition(1), "/tmp/graft_warc_spec/stream/src_b")
    val dir = java.nio.file.Files.createTempDirectory("warcstream")
    val ckpt = java.nio.file.Files.createTempDirectory("warcckpt")
    def onePart(src: String, dst: String): Unit = {
      val p = java.nio.file.Files.list(java.nio.file.Paths.get(src))
        .filter(_.toString.endsWith(".warc")).findFirst().get()
      java.nio.file.Files.copy(p, dir.resolve(dst))
    }
    onePart("/tmp/graft_warc_spec/stream/src_a", "a.warc")
    onePart("/tmp/graft_warc_spec/stream/src_b", "b.warc")
    val chunks = new java.util.concurrent.ConcurrentLinkedQueue[Set[String]]()
    val q = graft.streaming.EventStream.warcChunks(
      spark, dir.toString, ckpt.toString) { recs =>
      chunks.add(recs.select("record_id").collect().map(_.getString(0)).toSet)
    }
    try {
      q.processAllAvailable()
      val got = chunks.toArray(Array.empty[Set[String]]).toSet
      assert(got === Set(
        docsA.map(d => s"<urn:graft:${d._1}>").toSet,
        docsB.map(d => s"<urn:graft:${d._1}>").toSet))
    } finally q.stop()
  }

  test("non-ASCII URIs and ids round-trip through the UTF-8 header path") {
    // multi-byte sequences (2-, 3-, and 4-byte/astral) in header values:
    // the reader must decode accumulated raw bytes as UTF-8, not
    // char-cast each signed byte
    val docs = Seq(
      ("dü1", "http://exämple.example/päth/ü", "body one"),
      ("d2", "http://x.example/встреча/道/😀", "body two"))
    val expected = docs.map { case (id, uri, t) => (s"<urn:graft:$id>", uri, t) }.toSet
    assert(roundTrip(docs, 128L * 1024 * 1024, "/tmp/graft_warc_spec/utf8") === expected)
    assert(roundTrip(docs, 16L, "/tmp/graft_warc_spec/utf8b") === expected)
  }

  test("CR/LF in header values is rejected loudly, not silently corrupted") {
    val docs = Seq(("bad", "http://x.example/a\r\nWARC-Injected: yes", "p"))
    val e = intercept[Exception] {
      Warc.write(docs.toDF("id", "uri", "text"), "/tmp/graft_warc_spec/inject")
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("header injection")), chain(e).mkString(" | "))
  }

  test("member-gzip round-trips across partitions and survives tiny splits") {
    // the CommonCrawl layout: one gzip member per record; the member
    // scanner must find every member whose magic starts in its split,
    // validate it, and parse its records — under splits far smaller
    // than a member, every member straddles several splits
    val docs = mkDocs(40)
    val expected = docs.map { case (id, uri, t) => (s"<urn:graft:$id>", uri, t) }.toSet
    def gzTrip(splitSize: Long, dir: String): Set[(String, String, String)] = {
      Warc.write(docs.toDF("id", "uri", "text").repartition(3), dir, memberGzip = true)
      Warc.read(spark, dir, splitSize = splitSize)
        .collect()
        .map(r => (r.getString(0), r.getString(2),
          new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8)))
        .toSet
    }
    assert(gzTrip(128L * 1024 * 1024, "/tmp/graft_warc_spec/mgz_big") === expected)
    assert(gzTrip(64L, "/tmp/graft_warc_spec/mgz_tiny") === expected)
  }

  test("gzip-magic garbage between members is rejected by validation, not mistaken for members") {
    // hand-craft a file: junk containing the 3 magic bytes, a real
    // member, more magic-bearing junk, a second real member — exactly
    // two records must come back, at any split size
    val dir = Paths.get("/tmp/graft_warc_spec/falsegz")
    Files.createDirectories(dir)
    def member(id: String, body: String): Array[Byte] = {
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: $id\r\n" +
        s"WARC-Target-URI: http://x.example/$id\r\n" +
        s"Content-Length: ${body.getBytes(StandardCharsets.UTF_8).length}\r\n\r\n" +
        body + "\r\n\r\n").getBytes(StandardCharsets.UTF_8)
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(rec); gz.close()
      bos.toByteArray
    }
    val junk1 = Array[Byte](0x1f, 0x8b.toByte, 8, 0x7f, 1, 2, 3, 4, 5, 6, 7, 8)
    val junk2 = Array[Byte](9, 9, 0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0, 66, 66)
    val bytes = junk1 ++ member("a", "first body") ++ junk2 ++ member("b", "second body")
    Files.write(dir.resolve("crafted.warc.gz"), bytes)
    for (split <- Seq(10L, 4096L)) {
      val got = Warc.read(spark, dir.toString, splitSize = split).collect()
        .map(r => (r.getString(0),
          new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8))).toSet
      assert(got === Set(("a", "first body"), ("b", "second body")),
        s"splitSize=$split")
    }
  }

  test("legacy archives larger than the member guard fall back to streaming") {
    // a whole-stream (single-member) .warc.gz whose decompressed size
    // exceeds maxMemberBytes must stream via GZIPInputStream, not throw
    // — and splits past offset 0 must contribute NOTHING (no dupes)
    val docs = mkDocs(25)
    val dir = "/tmp/graft_warc_spec/legacy_src"
    Warc.write(docs.toDF("id", "uri", "text").repartition(1), dir)
    val src = Files.list(Paths.get(dir)).filter(_.toString.endsWith(".warc"))
      .findFirst().get()
    val gzDir = Paths.get("/tmp/graft_warc_spec/legacy_big")
    Files.createDirectories(gzDir)
    val gz = gzDir.resolve("big.warc.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    try out.write(Files.readAllBytes(src)) finally out.close()
    val expected = docs.map { case (id, _, t) => (s"<urn:graft:$id>", t) }.toSet
    for (split <- Seq(Files.size(gz) + 1, 128L)) { // one split; many splits
      val got = Warc.read(spark, gzDir.toString, splitSize = split,
          maxMemberBytes = 256).collect()
        .map(r => (r.getString(0),
          new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8))).toSet
      assert(got === expected, s"splitSize=$split")
    }
    // an over-guard member NOT at offset 0 still fails loudly
    val mixDir = Paths.get("/tmp/graft_warc_spec/legacy_mix")
    Files.createDirectories(mixDir)
    def oneMember(id: String, body: String): Array[Byte] = {
      val rec = (s"WARC/1.0\r\nWARC-Record-ID: $id\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n" + body + "\r\n\r\n")
        .getBytes(StandardCharsets.UTF_8)
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(rec); g.close()
      bos.toByteArray
    }
    Files.write(mixDir.resolve("mix.warc.gz"),
      oneMember("small", "tiny") ++ oneMember("huge", "y" * 4096))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, mixDir.toString, maxMemberBytes = 256).collect()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("decompressed-size guard")))
  }

  test("an embedded genuine gzip stream that is not a WARC cannot emit phantom records") {
    // a crawled payload may CONTAIN a byte-perfect gzip stream whose
    // inflated content embeds WARC-looking lines ("X\r\nWARC/1.0...").
    // A split resyncing onto that magic validates CRC/ISIZE fully —
    // only the WARC/-prefix rule on resynced members stops the phantom
    def member(id: String, body: String): Array[Byte] = {
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: $id\r\n" +
        s"WARC-Target-URI: http://x.example/$id\r\n" +
        s"Content-Length: ${body.getBytes(StandardCharsets.UTF_8).length}\r\n\r\n" +
        body + "\r\n\r\n").getBytes(StandardCharsets.UTF_8)
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(rec); gz.close()
      bos.toByteArray
    }
    val ghostRec = ("X\r\nWARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: ghost\r\nWARC-Target-URI: http://x.example/ghost\r\n" +
      "Content-Length: 5\r\n\r\nboo!!\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val ghostGz = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(ghostRec); gz.close()
      bos.toByteArray
    }
    val dir = Paths.get("/tmp/graft_warc_spec/ghost")
    Files.createDirectories(dir)
    val bytes = member("a", "first body") ++ Array[Byte]('Z') ++ ghostGz ++
      Array[Byte]('Q') ++ member("b", "second body")
    Files.write(dir.resolve("ghost.warc.gz"), bytes)
    for (split <- Seq(10L, 64L, 4096L)) {
      val got = Warc.read(spark, dir.toString, splitSize = split).collect()
        .map(_.getString(0)).toSet
      assert(got === Set("a", "b"), s"splitSize=$split (phantom leaked)")
    }
  }

  test("CDX index + random-access fetch round-trip on both layouts") {
    val docs = mkDocs(30)
    val expected = docs.map { case (id, uri, t) => (s"<urn:graft:$id>", uri, t) }.toSet
    for (gz <- Seq(false, true)) {
      val dir = s"/tmp/graft_warc_spec/cdx_${if (gz) "gz" else "plain"}"
      val cdx = Warc.writeWithCdx(
        docs.toDF("id", "uri", "text").repartition(3), dir, memberGzip = gz)
      assert(cdx.count() === 30, s"one index row per record (gz=$gz)")
      // full fetch == full read
      val fetched = Warc.fetch(spark, cdx).collect()
        .map(r => (r.getString(0), r.getString(2),
          new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8))).toSet
      assert(fetched === expected, s"gz=$gz")
      // filtered fetch touches only the selected records
      val some = cdx.filter(org.apache.spark.sql.functions.col("record_id")
        .isin("<urn:graft:d3>", "<urn:graft:d17>", "<urn:graft:d30>"))
      val got = Warc.fetch(spark, some).collect()
        .map(_.getString(0)).toSet
      assert(got === Set("<urn:graft:d3>", "<urn:graft:d17>", "<urn:graft:d30>"), s"gz=$gz")
      // the index survives independently: re-read from parquet and fetch
      val reread = spark.read.parquet(s"$dir/_cdx")
      assert(Warc.fetch(spark, reread.limit(5)).count() === 5, s"gz=$gz")
      // and the shards are still readable by the full scanner
      val scanned = Warc.read(spark, dir).collect().map(_.getString(0)).toSet
      assert(scanned === expected.map(_._1), s"gz=$gz")
    }
  }

  test("CDX fetch on hostile payloads: random binary, gz-magic traps, empty") {
    val rnd = new scala.util.Random(42)
    val payloads: Seq[(String, String, Array[Byte])] = (1 to 20).map { i =>
      val body: Array[Byte] = i % 4 match {
        case 0 => Array.emptyByteArray // empty payload
        case 1 => // random binary with planted gzip magic + WARC-looking text
          val b = Array.fill[Byte](200 + rnd.nextInt(300))(rnd.nextInt(256).toByte)
          b(13) = 0x1f.toByte; b(14) = 0x8b.toByte; b(15) = 8
          val trap = "\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz".getBytes("ISO-8859-1")
          System.arraycopy(trap, 0, b, 50, trap.length)
          b
        case 2 => ("plain text body " * (1 + rnd.nextInt(8))).getBytes("UTF-8")
        case _ => Array.fill[Byte](1 + rnd.nextInt(64))(rnd.nextInt(256).toByte)
      }
      (f"h$i%02d", s"http://x.example/h$i", body)
    }
    for (gz <- Seq(false, true)) {
      val dir = s"/tmp/graft_warc_spec/cdx_hostile_${if (gz) "gz" else "plain"}"
      val cdx = Warc.writeWithCdx(
        payloads.toDF("id", "uri", "payload").repartition(2), dir, memberGzip = gz)
      val fetched = Warc.fetch(spark, cdx).collect()
        .map(r => (r.getString(0), r.getAs[Array[Byte]]("payload").toSeq)).toMap
      assert(fetched.size === 20, s"gz=$gz")
      payloads.foreach { case (id, _, body) =>
        assert(fetched(s"<urn:graft:$id>") === body.toSeq, s"gz=$gz id=$id")
      }
      // the full scanner agrees (payload bytes that LOOK like records or
      // members never split a real record)
      val scanned = Warc.read(spark, dir).collect()
        .map(r => (r.getString(0), r.getAs[Array[Byte]]("payload").toSeq)).toMap
      assert(scanned === fetched, s"gz=$gz")
    }
  }

  test("gz members are read whole-file") {
    val docs = mkDocs(10)
    val dir = "/tmp/graft_warc_spec/gz_src"
    Warc.write(docs.toDF("id", "uri", "text").repartition(1), dir)
    val src = Files.list(Paths.get(dir)).filter(_.toString.endsWith(".warc"))
      .findFirst().get()
    val gzDir = Paths.get("/tmp/graft_warc_spec/gz")
    Files.createDirectories(gzDir)
    val gz = gzDir.resolve("all.warc.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    try out.write(Files.readAllBytes(src)) finally out.close()
    val got = Warc.read(spark, gzDir.toString).collect()
      .map(r => (r.getString(0),
        new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8))).toSet
    assert(got === docs.map { case (id, _, t) => (s"<urn:graft:$id>", t) }.toSet)
  }
}
