package graft.io

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** BGZF (blocked gzip) codec — the container format of BAM files
  * (SAM spec §4.1; ref: seqtables/core/seqtables.py:227-283 ingests BAM via
  * pysam, which wraps htslib's BGZF layer).
  *
  * BGZF is a sequence of independent gzip members, each ≤64 KiB
  * uncompressed, carrying the compressed block length in a BC extra
  * subfield so a reader can hop block-to-block without inflating. The
  * independence of blocks is the format's scale feature: any byte range of
  * a BAM file can be decompressed without touching the rest, which is what
  * makes within-file splits possible (htslib virtual offsets = blockStart
  * << 16 | intraBlockOffset). This codec exposes block-level deflate /
  * inflate so callers can exploit exactly that.
  *
  * The stream stays stock-gzip compatible: `GZIPInputStream` inflates a
  * whole BGZF file because gzip readers must support concatenated members.
  */
object Bgzf {

  /** ≤64 KiB uncompressed per block per the spec; leave headroom so even
    * incompressible data fits the 16-bit BSIZE field after deflate.
    */
  val MaxBlockData: Int = 60000

  /** The spec's fixed 28-byte empty terminal block (SAM spec §4.1.2). */
  val EofMarker: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00).map(_.toByte)

  /** One BGZF member: gzip header with the BC (BSIZE) extra subfield, raw
    * deflate payload, CRC32 + ISIZE footer.
    */
  def deflateBlock(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    require(len <= 65535, "BGZF block payload must be < 64 KiB")
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(data, off, len)
    deflater.finish()
    val cbuf = new Array[Byte](len + 1024)
    val clen = deflater.deflate(cbuf)
    require(deflater.finished(), "BGZF block did not fit the deflate buffer")
    deflater.end()
    val crc = new CRC32
    crc.update(data, off, len)
    val bsize = clen + 12 + 6 + 8 // header + XLEN extra + footer
    require(bsize <= 65536, "compressed BGZF block exceeds BSIZE range")
    val out = new Array[Byte](bsize)
    val h = Array(0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff).map(_.toByte)
    System.arraycopy(h, 0, out, 0, 10)
    writeU16(out, 10, 6) // XLEN
    out(12) = 'B'; out(13) = 'C'
    writeU16(out, 14, 2) // subfield length
    writeU16(out, 16, bsize - 1) // BSIZE = block length - 1
    System.arraycopy(cbuf, 0, out, 18, clen)
    writeU32(out, 18 + clen, crc.getValue)
    writeU32(out, 18 + clen + 4, len.toLong)
    out
  }

  /** Whole-payload compress: chunk into ≤MaxBlockData blocks + EOF marker. */
  def compress(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    var off = 0
    while (off < data.length) {
      val len = math.min(MaxBlockData, data.length - off)
      out.write(deflateBlock(data, off, len))
      off += len
    }
    out.write(EofMarker)
    out.toByteArray
  }

  /** Inflate every member block back-to-back. Walks the BC/BSIZE chain —
    * the same hop a future virtual-offset splitter would take — rather than
    * streaming through GZIPInputStream, so malformed chains fail loudly.
    */
  def inflate(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 3)
    var pos = 0
    while (pos < data.length) {
      require(data.length - pos >= 18, s"truncated BGZF block at $pos")
      require((data(pos) & 0xff) == 0x1f && (data(pos + 1) & 0xff) == 0x8b,
        s"bad gzip magic at $pos")
      val xlen = readU16(data, pos + 10)
      // scan extra subfields for BC
      var sf = pos + 12
      val sfEnd = pos + 12 + xlen
      var bsize = -1
      while (sf < sfEnd && bsize < 0) {
        val slen = readU16(data, sf + 2)
        if (data(sf) == 'B' && data(sf + 1) == 'C') bsize = readU16(data, sf + 4)
        sf += 4 + slen
      }
      require(bsize >= 0, s"BGZF BC subfield missing at $pos")
      val blockLen = bsize + 1
      val cdataOff = pos + 12 + xlen
      val cdataLen = blockLen - 12 - xlen - 8
      val isize = readU32(data, pos + blockLen - 4).toInt
      if (isize > 0) {
        val inflater = new Inflater(true)
        inflater.setInput(data, cdataOff, cdataLen)
        val ubuf = new Array[Byte](isize)
        var got = 0
        while (got < isize && !inflater.finished())
          got += inflater.inflate(ubuf, got, isize - got)
        inflater.end()
        require(got == isize, s"BGZF block at $pos inflated $got != ISIZE $isize")
        out.write(ubuf)
      }
      pos += blockLen
    }
    out.toByteArray
  }

  private def writeU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def writeU32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private[io] def readU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private[io] def readU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
}
