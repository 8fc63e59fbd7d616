package graft.sources

import java.util.zip.{Inflater, InflaterInputStream}

import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}

/** Central-directory zip access over any Hadoop filesystem — the
  * decompression-free metadata path of the `graft-zip` connector
  * (reference lifecycle: Land-Registry-Download/
  * minio_extract_s3_zip_files.py lists archive entries before
  * selecting its target; listing must not cost an inflate).
  *
  * A zip's table of contents lives at the END of the file (the
  * central directory, addressed by the end-of-central-directory
  * record), so any FS with a seekable read — which Hadoop's
  * `FSDataInputStream` contract guarantees on every scheme — can
  * enumerate entry names and declared sizes by reading a few KB of
  * tail, and inflate ONLY the entries a query actually consumes by
  * seeking straight to each local header. This extends the
  * inflate-nothing census that `java.util.zip.ZipFile` gave local
  * files to `hdfs:`/`s3a:`/any mounted scheme, with one code path.
  *
  * Zip64 is handled (EOCD64 locator + record, per-entry 0x0001 extra
  * fields): a 100 TB feed's multi-GB archives overflow the classic
  * 32-bit offsets as a matter of course.
  *
  * Parsing is STRICT and total: any structural surprise (no EOCD in
  * the tail window, truncated records, signature mismatch) returns
  * None rather than throwing, and the connector falls back to the
  * sequential `ZipInputStream` walk — which reproduces the
  * binaryFile plan's quarantine behavior for garbage bytes exactly.
  */
private[sources] object SeekableZip {

  /** One central-directory record: what a metadata census returns and
    * what a payload read needs (method + sizes + local header seek
    * target). Sizes come from the CD, which is authoritative even for
    * streamed archives whose local headers deferred them to data
    * descriptors. */
  case class CdEntry(name: String, method: Int, compressedSize: Long,
                     uncompressedSize: Long, localHeaderOffset: Long) {
    def isDirectory: Boolean = name.endsWith("/")
  }

  private val EOCD_SIG = 0x06054b50L
  private val EOCD64_LOC_SIG = 0x07064b50L
  private val EOCD64_SIG = 0x06064b50L
  private val CEN_SIG = 0x02014b50L
  private val LOC_SIG = 0x04034b50L

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (u16(b, off).toLong) | (u16(b, off + 2).toLong << 16)
  private def u64(b: Array[Byte], off: Int): Long =
    u32(b, off) | (u32(b, off + 4) << 32)

  private def readFully(in: FSDataInputStream, pos: Long, len: Int): Array[Byte] = {
    val b = new Array[Byte](len)
    in.readFully(pos, b) // positioned read: no seek-state races
    b
  }

  /** Parse the central directory of the archive at `p` (`fileLen` from
    * the planner's FileStatus — no extra RPC). None = not a parsable
    * archive; callers fall back to the streaming walk. */
  def centralDirectory(fs: FileSystem, p: Path, fileLen: Long): Option[Seq[CdEntry]] = {
    if (fileLen < 22) return None
    val in = fs.open(p)
    try centralDirectory(in, fileLen)
    catch { case _: Exception => None }
    finally in.close()
  }

  private[sources] def centralDirectory(in: FSDataInputStream,
                                        fileLen: Long): Option[Seq[CdEntry]] = {
    // EOCD lives in the last 22..(22+65535) bytes (trailing archive
    // comment is at most 64 KB); scan the tail window backward for
    // the signature whose comment length reaches the file end
    val tailLen = math.min(fileLen, 22L + 0xffff).toInt
    val tailPos = fileLen - tailLen
    val tail = readFully(in, tailPos, tailLen)
    var i = tailLen - 22
    var eocd = -1
    while (i >= 0 && eocd < 0) {
      if (u32(tail, i) == EOCD_SIG &&
          tailPos + i + 22 + u16(tail, i + 20) == fileLen) eocd = i
      else i -= 1
    }
    if (eocd < 0) return None
    var nEntries: Long = u16(tail, eocd + 10).toLong
    var cdSize: Long = u32(tail, eocd + 12)
    var cdOffset: Long = u32(tail, eocd + 16)
    // zip64: sentinel values route through the EOCD64 locator (20
    // bytes immediately before the EOCD)
    if (nEntries == 0xffff || cdSize == 0xffffffffL || cdOffset == 0xffffffffL) {
      val locPos = tailPos + eocd - 20
      if (locPos < 0) return None
      val loc = readFully(in, locPos, 20)
      if (u32(loc, 0) != EOCD64_LOC_SIG) return None
      val e64Pos = u64(loc, 8)
      if (e64Pos < 0 || e64Pos + 56 > fileLen) return None
      val e64 = readFully(in, e64Pos, 56)
      if (u32(e64, 0) != EOCD64_SIG) return None
      nEntries = u64(e64, 32)
      cdSize = u64(e64, 40)
      cdOffset = u64(e64, 48)
    }
    if (cdOffset < 0 || cdSize < 0 || cdOffset + cdSize > fileLen ||
        cdSize > Int.MaxValue - 8) return None
    val cd = readFully(in, cdOffset, cdSize.toInt)
    val out = Seq.newBuilder[CdEntry]
    var pos = 0
    var seen = 0L
    while (seen < nEntries) {
      if (pos + 46 > cd.length || u32(cd, pos) != CEN_SIG) return None
      val method = u16(cd, pos + 10)
      var csize = u32(cd, pos + 20)
      var usize = u32(cd, pos + 24)
      val nameLen = u16(cd, pos + 28)
      val extraLen = u16(cd, pos + 30)
      val commentLen = u16(cd, pos + 32)
      var lho = u32(cd, pos + 42)
      if (pos + 46 + nameLen + extraLen + commentLen > cd.length) return None
      val name = new String(cd, pos + 46, nameLen, "UTF-8")
      // zip64 extra field (id 0x0001): fields appear IN ORDER, only
      // for the dimensions whose classic field is the sentinel
      if (csize == 0xffffffffL || usize == 0xffffffffL || lho == 0xffffffffL) {
        var ep = pos + 46 + nameLen
        val eEnd = ep + extraLen
        var found = false
        while (ep + 4 <= eEnd && !found) {
          val id = u16(cd, ep); val sz = u16(cd, ep + 2)
          if (id == 0x0001) {
            var fp = ep + 4
            if (usize == 0xffffffffL) { usize = u64(cd, fp); fp += 8 }
            if (csize == 0xffffffffL) { csize = u64(cd, fp); fp += 8 }
            if (lho == 0xffffffffL) { lho = u64(cd, fp); fp += 8 }
            found = true
          } else ep += 4 + sz
        }
        if (!found) return None
      }
      out += CdEntry(name, method, csize, usize, lho)
      pos += 46 + nameLen + extraLen + commentLen
      seen += 1
    }
    Some(out.result())
  }

  /** Open ONE entry's payload: seek to its local header, step over the
    * (possibly drifted) name+extra there, and hand back a bounded
    * stream — stored bytes verbatim, deflated bytes through a raw
    * Inflater. Closing the returned stream releases the Inflater's
    * native buffer but leaves `in` open for the next entry (the
    * reader owns the archive stream). */
  def entryStream(in: FSDataInputStream, e: CdEntry): java.io.InputStream = {
    val head = readFully(in, e.localHeaderOffset, 30)
    if (u32(head, 0) != LOC_SIG)
      throw new java.util.zip.ZipException(
        s"bad local header at ${e.localHeaderOffset} for ${e.name}")
    // the LOCAL name/extra lengths, not the CD's: writers may store
    // different extra data in the two places
    val dataPos = e.localHeaderOffset + 30 + u16(head, 26) + u16(head, 28)
    in.seek(dataPos)
    val bounded = new BoundedStream(in, e.compressedSize)
    e.method match {
      case 0 => bounded // stored
      case 8 =>
        val rawInf = new Inflater(true)
        new InflaterInputStream(bounded, rawInf, 64 * 1024) {
          override def close(): Unit = rawInf.end() // keep `in` open
        }
      case m => throw new java.util.zip.ZipException(
        s"unsupported compression method $m for ${e.name}")
    }
  }

  /** Reads at most `limit` bytes from `in` and reports EOF after;
    * close() is a no-op (the archive stream outlives each entry). */
  private final class BoundedStream(in: java.io.InputStream, limit: Long)
      extends java.io.InputStream {
    private var remaining = limit
    override def read(): Int =
      if (remaining <= 0) -1
      else { val b = in.read(); if (b >= 0) remaining -= 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (remaining <= 0) return -1
      val n = in.read(b, off, math.min(len.toLong, remaining).toInt)
      if (n > 0) remaining -= n
      n
    }
    override def close(): Unit = ()
  }
}
