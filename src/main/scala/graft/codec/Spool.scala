package graft.codec

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, InputStream, OutputStream}
import java.nio.file.{Files, Path}

/** Reference-shaped spooled payload store
  * (/root/reference/pkg/spooledtempfile/spooled.go): bytes accumulate in
  * memory up to `threshold` (1 MB default, 64 KB initial buffer,
  * spooled.go:18-20), then spill to a temp file — so a record payload
  * larger than the JVM heap, or than the JVM's 2 GB array cap, streams
  * through with bounded memory. Unlike the reference's write-then-read-once
  * lifecycle (spooled.go:186-188), `inputStream()` may be called repeatedly
  * (each call gets an independent stream); writes after the first read are
  * rejected like the reference.
  *
  * This deliberately exists ONLY on the single-process tool path
  * (WarcTool verify/extract): inside Spark, payloads are BINARY columns
  * and Tungsten owns memory/spill (SURVEY.md T7 — do not reimplement).
  */
final class SpooledPayload(threshold: Int, spoolDir: Option[Path]) extends OutputStream {

  private var mem: Array[Byte] = new Array[Byte](math.min(math.max(threshold, 16), 64 << 10))
  private var memLen: Int = 0
  private var file: Path = _
  private var fileOut: OutputStream = _
  private var count: Long = 0L
  private var reading = false

  /** Total bytes written (valid at any point). */
  def size: Long = count

  /** True while the payload has not spilled. */
  def inMemory: Boolean = file == null

  private def spill(): Unit = {
    file = spoolDir match {
      case Some(d) => Files.createTempFile(d, "graft-spool-", ".tmp")
      case None => Files.createTempFile("graft-spool-", ".tmp")
    }
    file.toFile.deleteOnExit()
    fileOut = new BufferedOutputStream(Files.newOutputStream(file), 64 << 10)
    fileOut.write(mem, 0, memLen)
    mem = null
    memLen = 0
  }

  override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    if (reading) throw new IllegalStateException("write after read on spooled payload")
    if (fileOut == null && count + len > threshold) spill()
    if (fileOut != null) fileOut.write(b, off, len)
    else {
      if (memLen + len > mem.length) {
        var cap = math.max(mem.length * 2, memLen + len)
        cap = math.min(cap.toLong, threshold.toLong + 64).toInt
        mem = java.util.Arrays.copyOf(mem, cap)
      }
      System.arraycopy(b, off, mem, memLen, len)
      memLen += len
    }
    count += len
  }

  override def flush(): Unit = if (fileOut != null) fileOut.flush()

  /** A fresh stream over the payload; finishes any pending file writes. */
  def inputStream(): InputStream = {
    reading = true
    if (fileOut != null) { fileOut.close(); fileOut = null }
    if (file == null) new ByteArrayInputStream(mem, 0, memLen)
    else new BufferedInputStream(Files.newInputStream(file), 64 << 10)
  }

  /** Materialize (only safe for payloads known to fit an array). */
  def toByteArray: Array[Byte] = {
    if (count > Int.MaxValue - 8)
      throw new IllegalStateException(s"payload too large to materialize: $count")
    if (inMemory && fileOut == null) java.util.Arrays.copyOf(mem, memLen)
    else {
      val out = new Array[Byte](count.toInt)
      val in = inputStream()
      try {
        var off = 0
        while (off < out.length) {
          val r = in.read(out, off, out.length - off)
          if (r == -1) throw new java.io.EOFException("spool truncated")
          off += r
        }
      } finally in.close()
      out
    }
  }

  /** Copy the payload to `out` without materializing. */
  def writeTo(out: OutputStream): Unit = {
    val in = inputStream()
    try {
      val buf = new Array[Byte](64 << 10)
      var r = in.read(buf)
      while (r != -1) { out.write(buf, 0, r); r = in.read(buf) }
    } finally in.close()
  }

  /** Release the temp file (idempotent). */
  override def close(): Unit = {
    if (fileOut != null) { fileOut.close(); fileOut = null }
    if (file != null) { Files.deleteIfExists(file); file = null }
    mem = null
  }
}

object Spool {
  /** The reference's in-memory threshold (spooled.go:20). */
  val DefaultThreshold: Int = 1 << 20
}
