package graft.sources

import graft.codec.{Digests, HttpCodec, WarcCodec, WarcRecord}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.zip.GZIPOutputStream

/** Distributed WARC read/write — the reference's core competency as Spark
  * source/sink.
  *
  * Write side mirrors the rotator semantics (/root/reference/warc.go:90-258):
  *  - one file per task+serial, named `<prefix>-<ts>-<serial>-<part>.warc.gz`
  *  - files are written as `.open` and atomically renamed on close
  *    (/root/reference/warc.go:233-251)
  *  - each record is its own gzip member (fresh gzip stream per record,
  *    /root/reference/warc.go:200-219) so readers can seek to members
  *  - every file starts with a warcinfo record carrying the filename
  *    (/root/reference/write.go:118-145)
  *  - rotation at `recordsPerFile` (the size-based rotation analog)
  *
  * Read side: multi-file parallel scan (one task per file via Spark's
  * binaryFile source) + the byte-exact record parser (S1-S3).
  */
object WarcIO {

  final case class PageWarc(url: String, warc_ts: java.sql.Timestamp,
                            html: Array[Byte], text: String, lang: String)

  /** Serialize one page as a response record with reference-default
    * headers; deterministic given the row. */
  def pageToRecord(url: String, ts: java.sql.Timestamp, html: Array[Byte]): WarcRecord = {
    val base = WarcRecord("WARC/1.1", Map(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> url,
      "WARC-Date" -> WarcCodec.formatRfc3339Nano(Instant.ofEpochMilli(ts.getTime)),
      "Content-Type" -> "application/http; msgtype=response",
      "WARC-Payload-Digest" -> ("sha1:" + Digests.sha1Base32(
        try HttpCodec.parse(html).body catch { case _: Exception => html }))
    ), html)
    WarcCodec.withDefaults(base, Instant.ofEpochMilli(ts.getTime))
  }

  private def warcinfo(filename: String, now: Instant): WarcRecord = {
    val body = ("software: graft/0.1\r\nformat: WARC File Format 1.1\r\n").getBytes(UTF_8)
    WarcCodec.withDefaults(WarcRecord("WARC/1.1", Map(
      "WARC-Type" -> "warcinfo",
      "WARC-Filename" -> filename,
      "Content-Type" -> "application/warc-fields",
      "WARC-Date" -> WarcCodec.formatRfc3339Nano(now)
    ), body), now)
  }

  /** Revisit record for a dup capture (J4,
    * /root/reference/dialer.go:516-623): content truncated to the HTTP
    * headers, refers-to pointers + identical-payload-digest profile. */
  def revisitRecord(url: String, ts: java.sql.Timestamp, html: Array[Byte],
                    payloadDigest: String, refersToUrl: String,
                    refersToTs: java.sql.Timestamp): WarcRecord = {
    val eoh = HttpCodec.endOfHeaders(html)
    val truncated = if (eoh > 0) java.util.Arrays.copyOf(html, eoh) else html
    WarcCodec.withDefaults(WarcRecord("WARC/1.1", Map(
      "WARC-Type" -> "revisit",
      "WARC-Target-URI" -> url,
      "WARC-Date" -> WarcCodec.formatRfc3339Nano(Instant.ofEpochMilli(ts.getTime)),
      "WARC-Refers-To-Target-URI" -> refersToUrl,
      "WARC-Refers-To-Date" -> WarcCodec.formatRfc3339Nano(Instant.ofEpochMilli(refersToTs.getTime)),
      "WARC-Profile" -> "http://netpreservation.org/warc/1.1/revisit/identical-payload-digest",
      "WARC-Truncated" -> "length",
      "WARC-Payload-Digest" -> ("sha1:" + payloadDigest),
      "Content-Type" -> "application/http; msgtype=response"
    ), truncated), Instant.ofEpochMilli(ts.getTime))
  }

  /** Write a crawl round's fetched rows (Crawl.round output shape) as WARC:
    * non-revisits become response records, revisits become truncated
    * revisit records referencing the first capture. */
  def writeFetched(fetched: DataFrame, dir: String, prefix: String = "GRAFT",
                   recordsPerFile: Int = 1000): Long = {
    val projected = fetched.select(
      col("url_norm"), col("page_ts"), col("html"), col("is_revisit"),
      col("payload_digest"), col("refers_to_url"), col("refers_to_ts"))
    writeRecordFiles(projected, dir, prefix, recordsPerFile) { row =>
      if (row.getBoolean(3))
        revisitRecord(row.getString(0), row.getTimestamp(1), row.getAs[Array[Byte]](2),
          row.getString(4), row.getString(5), row.getTimestamp(6))
      else pageToRecord(row.getString(0), row.getTimestamp(1), row.getAs[Array[Byte]](2))
    }
  }

  /** Write a pages DataFrame (url, warc_ts, html, …) as rotated .warc.gz
    * files under `dir`. Returns the file count. One writer per partition —
    * the writer-pool parallelism model (repartition upstream to choose N). */
  def writePages(pages: DataFrame, dir: String, prefix: String = "GRAFT",
                 recordsPerFile: Int = 1000): Long =
    writeRecordFiles(pages.select(col("url"), col("warc_ts"), col("html")),
      dir, prefix, recordsPerFile) { row =>
      pageToRecord(row.getString(0), row.getTimestamp(1), row.getAs[Array[Byte]](2))
    }

  /** Shared rotated-file writer: one writer per partition, `.open` rename
    * discipline, per-record gzip members, warcinfo per file. */
  private def writeRecordFiles(df: DataFrame, dir: String, prefix: String,
                               recordsPerFile: Int)(
      rowToRecord: org.apache.spark.sql.Row => WarcRecord): Long = {
    val spark = df.sparkSession
    new java.io.File(dir).mkdirs()
    val written = spark.sparkContext.longAccumulator("warc_files")
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        var serial = 0
        var count = 0
        var out: BufferedOutputStream = null
        var openPath: java.io.File = null
        var finalPath: java.io.File = null
        def gzMember(rec: WarcRecord): Unit = {
          // fresh gzip member per record (seekable members)
          val gz = new GZIPOutputStream(out)
          gz.write(WarcCodec.serialize(rec))
          gz.finish()
        }
        def openFile(firstTs: Instant): Unit = {
          val name = f"$prefix-${java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss").withZone(java.time.ZoneOffset.UTC).format(firstTs)}-$serial%05d-$part%05d.warc.gz"
          finalPath = new java.io.File(dir, name)
          openPath = new java.io.File(dir, name + ".open")
          out = new BufferedOutputStream(new FileOutputStream(openPath), 1 << 16)
          gzMember(warcinfo(name, firstTs))
        }
        def closeFile(): Unit = if (out != null) {
          out.close()
          openPath.renameTo(finalPath)
          written.add(1L)
          out = null; serial += 1; count = 0
        }
        try {
          it.foreach { row =>
            val rec = rowToRecord(row)
            if (out == null) {
              val ts = rec.headers.get("WARC-Date")
                .map(d => Instant.parse(d))
                .getOrElse(Instant.ofEpochSecond(graft.sources.PagesGen.BaseEpochSec))
              openFile(ts)
            }
            gzMember(rec)
            count += 1
            if (count >= recordsPerFile) closeFile()
          }
        } finally closeFile()
      }
    written.value
  }

  /** Parallel WARC scan: one task per file, streaming multi-member gzip
    * parse, hot headers hoisted to columns (SURVEY.md §1.2). */
  def readRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .load(dir + "/*.warc.gz")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    files.flatMap { case (path, bytes) =>
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes), 1 << 16)
      try WarcCodec.readAll(in).map { r =>
        (path, r.version, r.warcType, r.targetUri,
          r.headers.getOrElse("WARC-Date", ""), r.contentLength,
          r.blockDigest, r.computedBlockDigest, r.headers, r.content)
      } finally in.close()
    }.toDF("path", "version", "warc_type", "target_uri", "warc_date",
      "content_length", "block_digest", "computed_digest", "headers", "content")
  }
}
