package graft.codec

import java.io.{ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import scala.collection.immutable.ListMap

/** One WARC record: version line, dynamic string-keyed headers, opaque
  * payload. Mirrors the reference's universal record shape
  * (/root/reference/write.go:39-43, /root/reference/header.go:6).
  */
final case class WarcRecord(
    version: String,
    headers: Map[String, String],
    content: Array[Byte]
) {
  def warcType: String = headers.getOrElse("WARC-Type", "")
  def targetUri: String = headers.getOrElse("WARC-Target-URI", "")
  def contentLength: Long =
    headers.get("Content-Length").map(_.trim.toLong).getOrElse(content.length.toLong)
  def blockDigest: String = headers.getOrElse("WARC-Block-Digest", "")
  /** Recomputed `sha1:<base32>` digest of the block bytes. */
  def computedBlockDigest: String = "sha1:" + Digests.sha1Base32(content)
}

/** A record whose payload lives in a spool (memory ≤ threshold, temp file
  * beyond) instead of an array — the >2 GB / low-heap scan shape. The
  * block digest is computed during the scan, not from a buffer. */
final case class SpooledWarcRecord(
    version: String,
    headers: Map[String, String],
    payload: SpooledPayload,
    blockSha1: Array[Byte]
) {
  def warcType: String = headers.getOrElse("WARC-Type", "")
  def targetUri: String = headers.getOrElse("WARC-Target-URI", "")
  def contentLength: Long = payload.size
  def blockDigest: String = headers.getOrElse("WARC-Block-Digest", "")
  def computedBlockDigest: String = "sha1:" + Digests.base32(blockSha1)
}

/** Parse / serialize semantics of the reference's record scan + writer:
  *  - parse: version line (CRLF), `key: value` header lines until a blank
  *    line, exactly `Content-Length` payload bytes, then two empty-line
  *    boundaries; malformed header lines are dropped; early EOF or a
  *    non-empty boundary is an error (/root/reference/read.go:67-136,
  *    /root/reference/utils.go:51-57).
  *  - serialize: version + CRLF, headers, blank line, payload, CRLF CRLF
  *    (/root/reference/write.go:55-115). The reference writes headers in
  *    map-iteration order (non-deterministic); we sort keys so output is
  *    reproducible — its own reader and verify tool accept any order.
  */
object WarcCodec {

  final class WarcFormatException(msg: String) extends RuntimeException(msg)

  /** Reads one CRLF- (or LF-) terminated line as ISO-8859-1-safe bytes →
    * String. Returns null at EOF before any byte is read. */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var c = in.read()
    if (c == -1) return null
    while (c != -1 && c != '\n') {
      buf.write(c)
      c = in.read()
    }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1 else bytes.length
    new String(bytes, 0, n, UTF_8)
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    if (n > Int.MaxValue) throw new WarcFormatException(s"record too large: $n")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n.toInt - off)
      if (r == -1) throw new EOFException(s"early EOF: got $off of $n payload bytes")
      off += r
    }
    out
  }

  /** Version line + header block + declared Content-Length; null at a
    * clean end-of-stream boundary. */
  private def readHead(in: InputStream): (String, Map[String, String], Long) = {
    var version = readLine(in)
    // tolerate extra blank lines between records (some writers emit them)
    while (version != null && version.isEmpty) version = readLine(in)
    if (version == null) return null
    if (!version.startsWith("WARC/"))
      throw new WarcFormatException(s"bad version line: '$version'")
    var headers = ListMap.empty[String, String]
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val idx = line.indexOf(':')
      if (idx > 0) { // malformed (no colon) header lines are dropped
        val k = line.substring(0, idx)
        val v = line.substring(idx + 1).trim
        headers = headers.updated(k, v)
      }
      line = readLine(in)
    }
    if (line == null) throw new EOFException("EOF inside header block")
    val cl = headers.get("Content-Length").map(_.trim.toLong).getOrElse(
      throw new WarcFormatException("missing Content-Length"))
    (version, headers, cl)
  }

  /** Two empty-line boundaries required (/root/reference/read.go:120-133). */
  private def readBoundary(in: InputStream): Unit = {
    var i = 0
    while (i < 2) {
      val b = readLine(in)
      if (b == null) throw new EOFException("early EOF at record boundary")
      if (b.nonEmpty) throw new WarcFormatException(s"non-empty record boundary: '$b'")
      i += 1
    }
  }

  /** Read one record; None at a clean end-of-stream boundary. */
  def readRecord(in: InputStream): Option[WarcRecord] = {
    val head = readHead(in)
    if (head == null) return None
    val (version, headers, cl) = head
    val content = readFully(in, cl)
    readBoundary(in)
    Some(WarcRecord(version, headers, content))
  }

  /** Spooled record scan for the tool path: the payload streams into a
    * SpooledPayload (in-memory ≤ threshold, temp file beyond — the
    * reference's spooledtempfile shape, /root/reference/spooled.go:18-22)
    * while the SHA-1 block digest accumulates on the fly, so records
    * larger than the heap — or than the 2 GB array cap that bounds
    * `readRecord` — verify and extract in bounded memory. Caller must
    * `payload.close()` each record. */
  def readRecordSpooled(
      in: InputStream,
      threshold: Int = Spool.DefaultThreshold,
      spoolDir: Option[java.nio.file.Path] = None): Option[SpooledWarcRecord] = {
    val head = readHead(in)
    if (head == null) return None
    val (version, headers, cl) = head
    val payload = new SpooledPayload(threshold, spoolDir)
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
    val buf = new Array[Byte](64 << 10)
    var remaining = cl
    while (remaining > 0) {
      val r = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
      if (r == -1) throw new EOFException(
        s"early EOF: got ${cl - remaining} of $cl payload bytes")
      sha1.update(buf, 0, r)
      payload.write(buf, 0, r)
      remaining -= r
    }
    readBoundary(in)
    Some(SpooledWarcRecord(version, headers, payload, sha1.digest()))
  }

  /** Parse a whole stream into records. Buffers the input once — the
    * header scanner reads byte-at-a-time, which must never hit the
    * decompressor directly. */
  def readAll(in: InputStream): Vector[WarcRecord] = {
    val buffered = in match {
      case b: java.io.BufferedInputStream => b
      case b: java.io.ByteArrayInputStream => b: InputStream
      case other => new java.io.BufferedInputStream(other, 1 << 16)
    }
    val out = Vector.newBuilder[WarcRecord]
    var r = readRecord(buffered)
    while (r.isDefined) {
      out += r.get
      r = readRecord(buffered)
    }
    out.result()
  }

  def parseAll(bytes: Array[Byte]): Vector[WarcRecord] =
    readAll(new java.io.ByteArrayInputStream(bytes))

  /** Serialize with deterministic (sorted) header order. */
  def serialize(rec: WarcRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream(rec.content.length + 512)
    out.write((rec.version + "\r\n").getBytes(UTF_8))
    rec.headers.toSeq.sortBy(_._1).foreach { case (k, v) =>
      out.write(s"$k: $v\r\n".getBytes(UTF_8))
    }
    out.write("\r\n".getBytes(UTF_8))
    out.write(rec.content)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** Fill defaulted headers the way the reference writer does
    * (/root/reference/write.go:61-85): WARC-Date (RFC3339Nano), WARC-Type
    * (`resource`), WARC-Record-ID (`<urn:uuid:…>`), Content-Length,
    * WARC-Block-Digest (`sha1:` + base32). Record IDs are derived
    * deterministically from content+headers so tests are reproducible
    * (reference uses random uuids, F7 in SURVEY.md §2.7). */
  def withDefaults(rec: WarcRecord, now: Instant): WarcRecord = {
    var h = rec.headers
    if (!h.contains("WARC-Date")) h = h.updated("WARC-Date", formatRfc3339Nano(now))
    if (!h.contains("WARC-Type")) h = h.updated("WARC-Type", "resource")
    if (!h.contains("WARC-Record-ID")) {
      val seed = Digests.sha1(rec.content ++ h.toSeq.sorted.mkString("|").getBytes(UTF_8))
      val hex = seed.take(16).map(b => f"${b & 0xff}%02x").mkString
      val uuid = s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-${hex.substring(16, 20)}-${hex.substring(20, 32)}"
      h = h.updated("WARC-Record-ID", s"<urn:uuid:$uuid>")
    }
    h = h.updated("Content-Length", rec.content.length.toString)
    if (!h.contains("WARC-Block-Digest"))
      h = h.updated("WARC-Block-Digest", "sha1:" + Digests.sha1Base32(rec.content))
    rec.copy(headers = h)
  }

  /** Deterministic record id for a (target-uri, warc-date) pair — the
    * engine's replacement for the reference's random uuids (F7): the same
    * capture always gets the same `<urn:uuid:…>`, so a revisit record can
    * compute its first capture's `WARC-Refers-To` id
    * (/root/reference/dialer.go:521-523) without re-reading that record. */
  def recordIdFor(targetUri: String, warcDate: String): String = {
    val seed = Digests.sha1(s"record-id|$targetUri|$warcDate".getBytes(UTF_8))
    val hex = seed.take(16).map(b => f"${b & 0xff}%02x").mkString
    s"<urn:uuid:${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-${hex.substring(16, 20)}-${hex.substring(20, 32)}>"
  }

  /** Go RFC3339Nano: fractional seconds with trailing zeros trimmed, no
    * dot when the fraction is zero (SURVEY.md F6). */
  def formatRfc3339Nano(t: Instant): String = {
    val base = java.time.format.DateTimeFormatter
      .ofPattern("uuuu-MM-dd'T'HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(t)
    val nanos = t.getNano
    if (nanos == 0) base + "Z"
    else {
      var frac = f"$nanos%09d"
      while (frac.endsWith("0")) frac = frac.substring(0, frac.length - 1)
      s"$base.${frac}Z"
    }
  }
}
