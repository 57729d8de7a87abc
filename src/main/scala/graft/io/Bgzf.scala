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

  /** Whole-payload compress: chunk into ≤`blockData` blocks + EOF marker.
    * `blockData` below the default shrinks blocks — more of them per file,
    * which is how tests force records to straddle block boundaries.
    */
  def compress(data: Array[Byte], blockData: Int = MaxBlockData): Array[Byte] = {
    require(blockData > 0 && blockData <= MaxBlockData,
      s"blockData must be in (0, $MaxBlockData], got $blockData")
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    var off = 0
    while (off < data.length) {
      val len = math.min(blockData, data.length - off)
      out.write(deflateBlock(data, off, len))
      off += len
    }
    out.write(EofMarker)
    out.toByteArray
  }

  /** Parse + inflate ONE member at `off`; returns (payload, blockLength).
    * Validates the BSIZE chain arithmetic, ISIZE, and the CRC32 footer, so
    * a false sync candidate (gzip magic appearing inside compressed data)
    * is rejected with overwhelming probability.
    */
  def inflateBlockAt(data: Array[Byte], off: Int): (Array[Byte], Int) = {
    require(data.length - off >= 18, s"truncated BGZF block at $off")
    require((data(off) & 0xff) == 0x1f && (data(off + 1) & 0xff) == 0x8b,
      s"bad gzip magic at $off")
    val xlen = readU16(data, off + 10)
    // scan extra subfields for BC
    var sf = off + 12
    val sfEnd = off + 12 + xlen
    var bsize = -1
    while (sf < sfEnd && bsize < 0) {
      require(sf + 4 <= data.length, s"truncated BGZF extra field at $off")
      val slen = readU16(data, sf + 2)
      if (data(sf) == 'B' && data(sf + 1) == 'C') bsize = readU16(data, sf + 4)
      sf += 4 + slen
    }
    require(bsize >= 0, s"BGZF BC subfield missing at $off")
    val blockLen = bsize + 1
    require(off + blockLen <= data.length, s"BGZF block at $off overruns input")
    val cdataOff = off + 12 + xlen
    val cdataLen = blockLen - 12 - xlen - 8
    require(cdataLen >= 0, s"BGZF block at $off has negative cdata length")
    val isize = readU32(data, off + blockLen - 4).toInt
    val ubuf =
      if (isize == 0) Array.emptyByteArray
      else {
        val inflater = new Inflater(true)
        inflater.setInput(data, cdataOff, cdataLen)
        val b = new Array[Byte](isize)
        var got = 0
        while (got < isize && !inflater.finished())
          got += inflater.inflate(b, got, isize - got)
        inflater.end()
        require(got == isize, s"BGZF block at $off inflated $got != ISIZE $isize")
        b
      }
    val crc = new CRC32
    crc.update(ubuf)
    require(crc.getValue == readU32(data, off + blockLen - 8),
      s"BGZF block at $off fails CRC")
    (ubuf, blockLen)
  }

  /** Inflate every member block back-to-back. Walks the BC/BSIZE chain —
    * the same hop the virtual-offset splitter takes — rather than
    * streaming through GZIPInputStream, so malformed chains fail loudly.
    */
  def inflate(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 3)
    var pos = 0
    while (pos < data.length) {
      val (ubuf, blockLen) = inflateBlockAt(data, pos)
      out.write(ubuf)
      pos += blockLen
    }
    out.toByteArray
  }

  /** Read ONE member from a stream positioned at a block boundary; None at
    * clean EOF (zero bytes available). Reads exactly the block's bytes, so
    * the stream lands on the next boundary.
    */
  def readBlockFrom(in: java.io.InputStream): Option[(Array[Byte], Int)] = {
    val head = new Array[Byte](12)
    if (!readFully(in, head, 0, 12)) None
    else {
      require((head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b,
        "bad gzip magic mid-stream")
      val xlen = readU16(head, 10)
      val blockHead = java.util.Arrays.copyOf(head, 12 + xlen)
      require(readFully(in, blockHead, 12, xlen), "truncated BGZF extra field")
      var sf = 12
      var bsize = -1
      while (sf < 12 + xlen && bsize < 0) {
        val slen = readU16(blockHead, sf + 2)
        if (blockHead(sf) == 'B' && blockHead(sf + 1) == 'C')
          bsize = readU16(blockHead, sf + 4)
        sf += 4 + slen
      }
      require(bsize >= 0, "BGZF BC subfield missing mid-stream")
      val blockLen = bsize + 1
      val block = java.util.Arrays.copyOf(blockHead, blockLen)
      require(readFully(in, block, 12 + xlen, blockLen - 12 - xlen),
        "truncated BGZF block body")
      Some(inflateBlockAt(block, 0))
    }
  }

  /** Fill buf[off, off+len); true on success, false if the stream was at
    * EOF before the first byte, error on a partial read.
    */
  private def readFully(
      in: java.io.InputStream, buf: Array[Byte], off: Int, len: Int): Boolean = {
    var got = 0
    while (got < len) {
      val n = in.read(buf, off + got, len - got)
      if (n < 0) {
        if (got == 0) return false
        throw new IllegalStateException(
          s"stream ended $got bytes into a $len-byte BGZF read")
      }
      got += n
    }
    true
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
