package graft.tools

import graft.codec.{Codecs, Digests, HttpCodec, WarcCodec}
import java.io.FileInputStream

/** CLI mirroring the reference's `warc verify` / `warc extract` commands
  * (/root/reference/cmd/verify.go:36-165, /root/reference/cmd/extract.go:24-75)
  * as a local smoke tool. The distributed versions of these pipelines live
  * in graft.operators; this tool is the single-file surface for driving the
  * codec kernel end-to-end.
  *
  * Usage:
  *   verify <file.warc[.gz]> …    recompute + check block digests per record
  *   extract <file.warc[.gz]> <outDir>   write each response's decoded body
  */
object WarcTool {

  /** Magic-byte sniffing — a mis-named or foreign WARC (gzip/zstd/bzip2/xz)
    * opens correctly regardless of extension
    * (/root/reference/decompression-reader.go:28-66). */
  private def open(path: String): java.io.InputStream =
    Codecs.sniffStream(new java.io.BufferedInputStream(new FileInputStream(path), 1 << 16))

  def main(args: Array[String]): Unit = args.toList match {
    case "verify" :: files if files.nonEmpty =>
      var total = 0
      var bad = 0
      files.foreach { f =>
        val in = open(f)
        try {
          WarcCodec.readAll(in).foreach { r =>
            total += 1
            val ok = r.blockDigest.isEmpty || r.blockDigest == r.computedBlockDigest
            if (!ok) bad += 1
            println(f"${r.warcType}%-10s cl=${r.contentLength}%-8d digest=${if (ok) "OK" else s"MISMATCH ${r.computedBlockDigest} != ${r.blockDigest}"} uri=${r.targetUri}")
          }
        } finally in.close()
      }
      println(s"checked $total records, $bad digest mismatches")
      if (bad > 0) sys.exit(1)

    case "extract" :: file :: outDir :: Nil =>
      val dir = new java.io.File(outDir)
      dir.mkdirs()
      val in = open(file)
      var counts = Map.empty[String, Int].withDefaultValue(0)
      try {
        WarcCodec.readAll(in)
          .filter(r => r.headers.getOrElse("Content-Type", "").contains("msgtype=response"))
          .filter(_.warcType != "revisit")
          .foreach { r =>
            val msg = HttpCodec.parse(r.content)
            val body = HttpCodec.decodedBody(r.content)
            val ct = msg.header("Content-Type").getOrElse("unknown").split(";")(0).trim
            counts = counts.updated(ct, counts(ct) + 1)
            val name = r.targetUri.split("/").lastOption.filter(_.nonEmpty)
              .getOrElse("index").replace("/", "_").take(200)
            val out = new java.io.File(dir, s"${Digests.sha1Base32(r.targetUri).take(8)}-$name")
            java.nio.file.Files.write(out.toPath, body)
            println(s"wrote ${out.getPath} (${body.length} B, $ct)")
          }
      } finally in.close()
      counts.toSeq.sortBy(_._1).foreach { case (ct, n) => println(s"$ct: $n") }

    case "write" :: nStr :: outDir :: rest =>
      // distributed sink drive: synthetic pages → rotated .warc.gz files
      val n = nStr.toLong
      val perFile = rest.headOption.map(_.toInt).getOrElse(200)
      val spark = graft.GraftSession.local(8)
      val pages = graft.sources.PagesGen.pages(spark, n, 20, 42L).toDF()
      val files = graft.sources.WarcIO.writePages(pages, outDir, recordsPerFile = perFile)
      val back = graft.sources.WarcIO.readRecords(spark, outDir)
      val bad = back.filter(org.apache.spark.sql.functions.col("block_digest") =!=
        org.apache.spark.sql.functions.col("computed_digest")).count()
      println(s"wrote $files warc files, ${back.count()} records read back, $bad digest mismatches")
      spark.stop()
      if (bad > 0) sys.exit(1)

    case _ =>
      System.err.println("usage: WarcTool verify <file>… | extract <file> <outDir> | write <n> <outDir> [recordsPerFile]")
      sys.exit(2)
  }
}
