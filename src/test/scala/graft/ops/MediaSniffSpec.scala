package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Multimodal.{MediaInfo, sniff, syntheticMediaPayload}

/** Pins [[Multimodal.sniff]] against HAND-WRITTEN real-world header byte
  * vectors — independent of the `syntheticMediaPayload` encoder, so the
  * corpus-gate pair (encode → sniff, q_media_sniff) cannot agree on a
  * wrong byte convention — plus the encoder round-trip battery and the
  * garbage-totality contract.
  */
class MediaSniffSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("PNG: the canonical 1x1 RGBA header (real CRC) sniffs to 1x1") {
    // the widely-circulated smallest-PNG prefix: signature + IHDR(1,1,8,RGBA)
    val p = bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1F, 0x15, 0xC4, 0x89)
    assert(sniff(p) == MediaInfo("png", Some(1), Some(1), None, None, None))
  }

  test("PNG: signature without a complete IHDR keeps the format, nulls dims") {
    val p = bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 0x00)
    assert(sniff(p) == MediaInfo("png", None, None, None, None, None))
  }

  test("JPEG: APP1/Exif then progressive SOF2 — the marker walk finds dims") {
    val p = bytes(0xFF, 0xD8,
      0xFF, 0xE1, 0x00, 0x08, 'E', 'x', 'i', 'f', 0x00, 0x00, // APP1 len 8
      0xFF, 0xC2, 0x00, 0x0B, 0x08, 0x00, 0xF0, 0x01, 0x40, // SOF2: h=240 w=320
      0x01, 0x01, 0x11, 0x00,
      0xFF, 0xD9)
    assert(sniff(p) == MediaInfo("jpeg", Some(320), Some(240), None, None, None))
  }

  test("JPEG: 0xFF fill bytes before the marker code are skipped") {
    val p = bytes(0xFF, 0xD8, 0xFF, 0xFF, 0xFF, // two fill bytes then SOF0
      0xC0, 0x00, 0x0B, 0x08, 0x00, 0x02, 0x00, 0x03, 0x01, 0x01, 0x11, 0x00)
    assert(sniff(p) == MediaInfo("jpeg", Some(3), Some(2), None, None, None))
  }

  test("JPEG: SOS before any SOF ends the walk with format kept, dims null") {
    val p = bytes(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0x01, 0x00)
    assert(sniff(p) == MediaInfo("jpeg", None, None, None, None, None))
  }

  test("JPEG: a stray nested SOI is standalone, not a length-bearing segment") {
    val p = bytes(0xFF, 0xD8, 0xFF, 0xD8, // doubled SOI
      0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x02, 0x00, 0x03, 0x01, 0x01, 0x11, 0x00)
    assert(sniff(p) == MediaInfo("jpeg", Some(3), Some(2), None, None, None))
  }

  test("JPEG: truncation mid-segment degrades to null dims, never throws") {
    val p = bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00) // length field cut short
    assert(sniff(p) == MediaInfo("jpeg", None, None, None, None, None))
  }

  test("GIF: 87a and 89a little-endian logical-screen dims") {
    val p87 = "GIF87a".getBytes ++ bytes(0x02, 0x00, 0x03, 0x00, 0, 0, 0)
    val p89 = "GIF89a".getBytes ++ bytes(0x40, 0x01, 0xF0, 0x00, 0, 0, 0)
    assert(sniff(p87) == MediaInfo("gif", Some(2), Some(3), None, None, None))
    assert(sniff(p89) == MediaInfo("gif", Some(320), Some(240), None, None, None))
  }

  test("WAV: the canonical 44-byte header yields rate/channels/bits") {
    val p = "RIFF".getBytes ++ bytes(0x24, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ bytes(16, 0, 0, 0,
        0x01, 0x00, 0x02, 0x00, // PCM, stereo
        0x44, 0xAC, 0x00, 0x00, // 44100
        0x10, 0xB1, 0x02, 0x00, // byte rate
        0x04, 0x00, 0x10, 0x00) ++ // block align, 16 bits
      "data".getBytes ++ bytes(0, 0, 0, 0)
    assert(sniff(p) ==
      MediaInfo("wav", None, None, Some(44100), Some(2), Some(16)))
  }

  test("WAV: an odd-sized chunk before fmt exercises the even-padding rule") {
    val p = "RIFF".getBytes ++ bytes(0x28, 0, 0, 0) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ bytes(3, 0, 0, 0) ++ "abc".getBytes ++ bytes(0) ++
      "fmt ".getBytes ++ bytes(16, 0, 0, 0,
        0x01, 0x00, 0x01, 0x00,
        0x40, 0x1F, 0x00, 0x00, // 8000
        0x40, 0x1F, 0x00, 0x00, 0x01, 0x00, 0x08, 0x00)
    assert(sniff(p) == MediaInfo("wav", None, None, Some(8000), Some(1), Some(8)))
  }

  test("BMP: negative (top-down) stored height comes back as abs()") {
    val p = "BM".getBytes ++ bytes(54, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0,
      0x05, 0x00, 0x00, 0x00, // width 5
      0xFE, 0xFF, 0xFF, 0xFF, // height -2
      0x01, 0x00, 0x18, 0x00)
    assert(sniff(p) == MediaInfo("bmp", Some(5), Some(2), None, None, None))
  }

  test("garbage totality: null, empty, text, near-magic all land 'unknown'") {
    assert(sniff(null).format == "unknown")
    assert(sniff(Array.emptyByteArray).format == "unknown")
    assert(sniff("just some text".getBytes).format == "unknown")
    assert(sniff("GIF".getBytes).format == "unknown") // magic cut short
    assert(sniff("RIFFxxxxAVI ".getBytes).format == "unknown") // RIFF, not WAVE
  }

  test("encoder round-trip: sniff inverts syntheticMediaPayload on 0..600") {
    (0L until 600L).foreach { id =>
      val got = sniff(syntheticMediaPayload(id, s"text-$id"))
      val w = (16 + id % 1017).toInt
      val h = (16 + (id * 7) % 767).toInt
      val expected = (id % 6) match {
        case 0 => MediaInfo("png", Some(w), Some(h), None, None, None)
        case 1 => MediaInfo("jpeg", Some(w), Some(h), None, None, None)
        case 2 => MediaInfo("gif", Some(w), Some(h), None, None, None)
        case 3 =>
          val k = id / 6
          MediaInfo("wav", None, None,
            Some(Array(8000, 16000, 22050, 44100)((k % 4).toInt)),
            Some(1 + (k % 2).toInt), Some(8 + 8 * ((k % 3).toInt)))
        case 4 => MediaInfo("bmp", Some(w), Some(h), None, None, None)
        case _ => MediaInfo("unknown", None, None, None, None, None)
      }
      assert(got == expected, s"id=$id")
    }
  }

  test("sniffMedia lifts the kernel over a frame with the contract schema") {
    val spark = TestSpark.spark
    import spark.implicits._
    val framed = Seq((0L, "a"), (3L, "b"), (5L, "c")).toDF("media_id", "t")
      .select(col("media_id"),
        Multimodal.syntheticMediaPayloadUdf(col("media_id"), col("t"))
          .as("payload"))
    val out = Multimodal.sniffMedia(framed).orderBy("media_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("png", "wav", "unknown"))
    assert(out(0).getInt(2) == 16 && out(0).getInt(3) == 16) // id 0 dims
    assert(out(1).getInt(4) == 8000 && out(1).getInt(5) == 1) // id 3 = k 0
    assert(out(2).isNullAt(2) && out(2).isNullAt(4))
  }
}
