package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.GZIPInputStream

/** Parsed HTTP message (request or response). Header lookup is
  * case-insensitive (HTTP semantics); original casing preserved in `headers`.
  */
final case class HttpMessage(
    startLine: String,
    headers: Seq[(String, String)],
    body: Array[Byte]
) {
  def header(name: String): Option[String] = {
    val lower = name.toLowerCase
    headers.collectFirst { case (k, v) if k.toLowerCase == lower => v }
  }
  def status: Int = {
    val parts = startLine.split(" ", 3)
    if (parts.length >= 2 && parts(0).startsWith("HTTP/")) parts(1).toInt else -1
  }
  def isChunked: Boolean =
    header("Transfer-Encoding").exists(_.toLowerCase.contains("chunked"))
  def isGzipped: Boolean =
    header("Content-Encoding").exists(_.toLowerCase.contains("gzip"))
}

/** HTTP-over-bytes parse path — the byte-identical text contract
  * (SURVEY.md P8): split stored block bytes at the first `\r\n\r\n`,
  * chunked-decode when `Transfer-Encoding: chunked`, gunzip when
  * `Content-Encoding: gzip` and decompression is requested
  * (/root/reference/dialer.go:447,534-581; /root/reference/transport.go:27-32;
  * /root/reference/cmd/extract.go:250-259).
  */
object HttpCodec {

  final class HttpFormatException(msg: String) extends RuntimeException(msg)

  private final val Http9Methods = Set(
    "GET", "HEAD", "POST", "PUT", "DELETE", "CONNECT", "OPTIONS", "TRACE", "PATCH")

  /** Predicate over a first line: is this an HTTP/1.x request line?
    * (/root/reference/utils.go:59-73) */
  def isHttpRequestLine(line: String): Boolean = {
    val sp = line.indexOf(' ')
    sp > 0 && Http9Methods.contains(line.substring(0, sp)) &&
      (line.endsWith("HTTP/1.0") || line.endsWith("HTTP/1.1"))
  }

  /** Index just past the first CRLFCRLF, or -1. */
  def endOfHeaders(bytes: Array[Byte]): Int = {
    var i = 0
    val n = bytes.length
    while (i + 3 < n) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' && bytes(i + 2) == '\r' && bytes(i + 3) == '\n')
        return i + 4
      i += 1
    }
    -1
  }

  /** Parse raw HTTP message bytes; body is the raw (still-encoded) bytes
    * after the header block, truncated to Content-Length when present and
    * not chunked. */
  def parse(block: Array[Byte]): HttpMessage = {
    val eoh = endOfHeaders(block)
    if (eoh < 0) throw new HttpFormatException("no end-of-headers CRLFCRLF found")
    val head = new String(block, 0, eoh - 4, ISO_8859_1)
    val lines = head.split("\r\n", -1)
    if (lines.isEmpty) throw new HttpFormatException("empty header block")
    val startLine = lines(0)
    val headers = lines.drop(1).toSeq.flatMap { line =>
      val idx = line.indexOf(':')
      if (idx > 0) Some(line.substring(0, idx) -> line.substring(idx + 1).trim)
      else None
    }
    val raw = java.util.Arrays.copyOfRange(block, eoh, block.length)
    val msg = HttpMessage(startLine, headers, raw)
    if (msg.isChunked) msg
    else
      msg.header("Content-Length").map(_.trim.toLong) match {
        case Some(cl) if cl >= 0 && cl <= raw.length =>
          msg.copy(body = java.util.Arrays.copyOf(raw, cl.toInt))
        case _ => msg
      }
  }

  /** Decode `Transfer-Encoding: chunked` body bytes. */
  def decodeChunked(body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length)
    var i = 0
    def line(): String = {
      val start = i
      while (i < body.length && body(i) != '\n') i += 1
      val end = if (i > start && body(i - 1) == '\r') i - 1 else i
      i += 1 // skip \n
      new String(body, start, end - start, ISO_8859_1)
    }
    var done = false
    while (!done && i < body.length) {
      val sizeLine = line()
      val semi = sizeLine.indexOf(';')
      val hexStr = (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim
      if (hexStr.isEmpty) {
        // tolerate stray blank line
      } else {
        val size = java.lang.Long.parseLong(hexStr, 16).toInt
        if (size == 0) {
          // trailers until blank line
          var t = line()
          while (t.nonEmpty && i < body.length) t = line()
          done = true
        } else {
          if (i + size > body.length)
            throw new HttpFormatException(s"chunk overruns body: $size at $i")
          out.write(body, i, size)
          i += size
          // consume CRLF after chunk data
          if (i < body.length && body(i) == '\r') i += 1
          if (i < body.length && body(i) == '\n') i += 1
        }
      }
    }
    out.toByteArray
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    // inflater buffer sized to the payload (default 512 costs ~1.5× on
    // the hot extraction path)
    val bufSize = math.max(4096, math.min(bytes.length, 1 << 16))
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes), bufSize)
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](8192)
    var r = in.read(buf)
    while (r != -1) {
      out.write(buf, 0, r)
      r = in.read(buf)
    }
    in.close()
    out.toByteArray
  }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  /** The full reference decode path: parse → chunked-decode → gunzip.
    * The result bytes must equal the reference's `resp.Body` — this is the
    * byte-identical text contract (BASELINE.json `input_hint`). */
  def decodedBody(block: Array[Byte]): Array[Byte] = {
    val msg = parse(block)
    val dechunked = if (msg.isChunked) decodeChunked(msg.body) else msg.body
    if (msg.isGzipped) gunzip(dechunked) else dechunked
  }

  /** Decoded body as UTF-8 text. */
  def extractText(block: Array[Byte]): String = new String(decodedBody(block), UTF_8)

  /** Serialize a simple HTTP/1.1 response (used by the deterministic pages
    * generator; header order is the given order). */
  def buildResponse(
      status: Int,
      reason: String,
      headers: Seq[(String, String)],
      body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(s"HTTP/1.1 $status $reason\r\n")
    headers.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append("\r\n")
    val head = sb.toString.getBytes(ISO_8859_1)
    val out = new Array[Byte](head.length + body.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out
  }

  /** Chunked-encode a body with a fixed chunk size (deterministic). */
  def chunkEncode(body: Array[Byte], chunkSize: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 64)
    var i = 0
    while (i < body.length) {
      val n = math.min(chunkSize, body.length - i)
      out.write(s"${n.toHexString}\r\n".getBytes(ISO_8859_1))
      out.write(body, i, n)
      out.write("\r\n".getBytes(ISO_8859_1))
      i += n
    }
    out.write("0\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }
}
