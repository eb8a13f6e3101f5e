package graft.sources

import graft.GraftSession
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class WarcIOSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  test("pages → rotated .warc.gz → parse back: byte-identical roundtrip") {
    val dir = Files.createTempDirectory("graft-warc").toString
    val pages = PagesGen.pages(spark, 500, 10, 42L).toDF().repartition(3)
    val nFiles = WarcIO.writePages(pages, dir, recordsPerFile = 100)
    assert(nFiles >= 3, s"expected rotation across tasks, got $nFiles files")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".open")),
      "all files must be atomically renamed from .open")

    val back = WarcIO.readRecords(spark, dir).cache()
    val info = back.filter(col("warc_type") === "warcinfo")
    assert(info.count() == nFiles, "one warcinfo per file")
    val responses = back.filter(col("warc_type") === "response")
    assert(responses.count() == 500L)
    // every record re-digests to its stored block digest
    assert(back.filter(col("block_digest") =!= col("computed_digest")).count() == 0L)
    // payload decode is byte-identical to the original text column
    // (urls repeat across pages with different bodies, so compare the
    // multiset of text digests rather than joining on url)
    def digestCounts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("d")).count().as[(String, Long)].collect().toMap
    val got = digestCounts(responses
      .select(sha2(http_extract_text(col("content")), 256).as("d")))
    val want = digestCounts(pages.select(sha2(col("text"), 256).as("d")))
    assert(got == want, "extracted text multiset must match original bytes")
  }

  test("crawl round → WARC: revisits written as truncated refers-to records") {
    import graft.operators.{Crawl, Frontier}
    val dir = Files.createTempDirectory("graft-warc3").toString
    // low dedupe threshold so the generator's dup-body clusters revisit
    val cfg = Frontier.Config(defaultBudget = 1000, sizeThreshold = 100)
    val pages = PagesGen.pages(spark, 2000, 10, 42L).toDF()
    val web = Crawl.asWeb(pages)
    val frontier = Frontier.canonicalize(pages)
      .select(col("url_norm").as("url"))
      .withColumn("depth", lit(0))
      .withColumn("warc_ts", lit(new java.sql.Timestamp(PagesGen.BaseEpochSec * 1000L)))
    val out = Crawl.round(frontier, None, web, None, None, cfg, withCounters = true)
    assert(out.counters("revisits") > 0, "generator dup clusters must produce revisits")
    val n = WarcIO.writeFetched(out.fetched, dir, recordsPerFile = 500)
    assert(n >= 1)
    val back = WarcIO.readRecords(spark, dir).cache()
    assert(back.filter(col("block_digest") =!= col("computed_digest")).count() == 0L)
    val revisits = back.filter(col("warc_type") === "revisit")
    assert(revisits.count() == out.counters("revisits"))
    val rv = revisits.select("headers", "content")
      .as[(Map[String, String], Array[Byte])].head()
    assert(rv._1.contains("WARC-Refers-To-Target-URI"))
    // exact reference profile URI (/root/reference/dialer.go:525)
    assert(rv._1("WARC-Profile") ==
      "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest")
    assert(rv._1("WARC-Truncated") == "length")
    // content truncated at end of HTTP headers
    assert(graft.codec.HttpCodec.endOfHeaders(rv._2) == rv._2.length || rv._2.isEmpty)
    val responses = back.filter(col("warc_type") === "response").count()
    assert(responses == out.counters("fetched") - out.counters("revisits"))

    // fetch PAIRS (J1): every capture has a request record whose
    // WARC-Concurrent-To names its response/revisit record, written
    // response-first into the same file (dialer.go:352-354,380-388)
    val requests = back.filter(col("warc_type") === "request")
    assert(requests.count() == out.counters("fetched"), "one request per fetch")
    val mainIds = back.filter(col("warc_type").isin("response", "revisit"))
      .select("headers").as[Map[String, String]].collect()
      .map(_("WARC-Record-ID")).toSet
    requests.select("headers", "content").as[(Map[String, String], Array[Byte])]
      .collect().foreach { case (h, bytes) =>
        assert(mainIds.contains(h("WARC-Concurrent-To")), "dangling WARC-Concurrent-To")
        val line = new String(bytes, "ISO-8859-1").split("\r\n")(0)
        assert(graft.codec.HttpCodec.isHttpRequestLine(line), s"bad request line: $line")
      }

    // every revisit's WARC-Refers-To must name an actual response record in
    // the archive (/root/reference/dialer.go:521-523), and that record's
    // payload digest must equal the revisit's (identical-payload-digest)
    val byId = back.filter(col("warc_type") === "response")
      .select("headers").as[Map[String, String]].collect()
      .map(h => h("WARC-Record-ID") -> h("WARC-Payload-Digest")).toMap
    val allRevisits = revisits.select("headers").as[Map[String, String]].collect()
    assert(allRevisits.nonEmpty)
    allRevisits.foreach { h =>
      val refId = h("WARC-Refers-To")
      assert(byId.contains(refId), s"dangling WARC-Refers-To $refId")
      assert(byId(refId) == h("WARC-Payload-Digest"),
        "revisit payload digest must match its referred response record")
    }
  }

  test("zstd compression: end-to-end write + sniffing read, ± dictionary") {
    import graft.codec.Codecs
    for (dict <- Seq(None, Some(("payload doc example " * 300).getBytes("UTF-8")))) {
      val dir = Files.createTempDirectory("graft-zstd").toString
      val pages = PagesGen.pages(spark, 200, 10, 42L).toDF().repartition(2)
      val n = WarcIO.writePages(pages, dir, recordsPerFile = 60,
        compression = Codecs.ZstdCompression(dict))
      assert(n >= 2)
      assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".warc.zst")))
      val back = WarcIO.readRecords(spark, dir).cache()
      assert(back.filter(col("warc_type") === "response").count() == 200L)
      assert(back.filter(col("block_digest") =!= col("computed_digest")).count() == 0L)
    }
  }

  test("size-based rotation caps compressed file size") {
    val dir = Files.createTempDirectory("graft-rot").toString
    val pages = PagesGen.pages(spark, 400, 10, 42L).toDF().coalesce(1)
    WarcIO.writePages(pages, dir, recordsPerFile = Int.MaxValue, maxFileBytes = 64 * 1024)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.length >= 2, "size rotation must split output")
    // each file ≤ cap + one record of slack (rotation happens after the
    // record that crosses the threshold, like the reference's check-then-write)
    assert(files.forall(_.length <= 64 * 1024 + 512 * 1024))
  }

  test("WARC archives feed the engine: recordsToPages round-trips the pages table") {
    val dir = Files.createTempDirectory("graft-ingest").toString
    val pages = PagesGen.pages(spark, 300, 10, 42L).toDF()
    WarcIO.writePages(pages, dir, recordsPerFile = 100)
    val back = WarcIO.recordsToPages(WarcIO.readRecords(spark, dir)).cache()
    assert(back.count() == 300L)
    // url + timestamp + extracted text survive the full write→read→ingest loop
    val orig = pages.select(col("url"), col("warc_ts"), sha2(col("text"), 256).as("d"))
      .as[(String, java.sql.Timestamp, String)].collect().toSet
    val got = back.select(col("url"), col("warc_ts"), sha2(col("text"), 256).as("d"))
      .as[(String, java.sql.Timestamp, String)].collect().toSet
    assert(got == orig, "pages → WARC → pages must be lossless on (url, ts, text)")
    // and the ingested table drives the frontier directly
    val canon = graft.operators.Frontier.canonicalize(back)
    assert(canon.count() > 0)
  }

  test("CDX crawl: remote hits become revisits without WARC-Refers-To") {
    import graft.operators.{Crawl, Frontier}
    val dir = Files.createTempDirectory("graft-cdxwarc").toString
    val cfg = Frontier.Config(defaultBudget = 1000, sizeThreshold = 100)
    val pages = PagesGen.pages(spark, 500, 10, 42L).toDF()
    val web = Crawl.asWeb(pages).cache()
    // remote index: every page with a text longer than threshold whose
    // doc id is even is "already archived elsewhere"
    val cdx = web.filter(length(col("text")) >= 100)
      .filter(xxhash64(col("url_norm")) % 2 === 0)
      .select(
        graft.functions.GraftFunctions.sha1_base32(encode(col("text"), "UTF-8")).as("payload_digest"),
        concat(lit("https://other-archive.example/"), col("url_norm")).as("target_uri"),
        col("page_ts").as("capture_ts"),
        lit("text/html").as("record_type"))
    val frontier = Frontier.canonicalize(pages).select(col("url_norm").as("url"))
      .withColumn("depth", lit(0))
      .withColumn("warc_ts", lit(new java.sql.Timestamp(PagesGen.BaseEpochSec * 1000L)))
    val out = Crawl.round(frontier, None, web, None, None, cfg,
      withCounters = true, cdx = Some(cdx))
    assert(out.counters("revisits") > 0)
    val srcCounts = out.fetched.groupBy("dedupe_source").count()
      .as[(String, Long)].collect().toMap
    assert(srcCounts.getOrElse("cdx", 0L) > 0, "remote dedupe must fire")
    WarcIO.writeFetched(out.fetched, dir, recordsPerFile = 500)
    val revisits = WarcIO.readRecords(spark, dir)
      .filter(col("warc_type") === "revisit")
      .select("headers").as[Map[String, String]].collect()
    assert(revisits.nonEmpty)
    val (localRev, cdxRev) = revisits.partition(_.contains("WARC-Refers-To"))
    assert(cdxRev.nonEmpty, "cdx revisits must omit WARC-Refers-To")
    cdxRev.foreach { h =>
      assert(h("WARC-Refers-To-Target-URI").startsWith("https://other-archive.example/"))
    }
    // local revisits (if any) keep the resolvable record id
    localRev.foreach(h => assert(h("WARC-Refers-To").startsWith("<urn:uuid:")))
  }

  test("warcinfo + filename discipline matches reference shape") {
    val dir = Files.createTempDirectory("graft-warc2").toString
    WarcIO.writePages(PagesGen.pages(spark, 20, 5, 42L).toDF().coalesce(1), dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz")).head
    assert(f.getName.matches("GRAFT-\\d{14}-\\d{5}-\\d{5}\\.warc\\.gz"))
    val recs = WarcIO.readRecords(spark, dir)
    val wi = recs.filter(col("warc_type") === "warcinfo")
      .select("headers").as[Map[String, String]].head()
    assert(wi("WARC-Filename") == f.getName)
    assert(wi("Content-Type") == "application/warc-fields")
  }
}
