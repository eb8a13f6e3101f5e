package graft.codec

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Property tests for the framing-critical codecs: WARC records must
  * roundtrip for ANY payload bytes (including payloads that contain record
  * boundaries, version lines and gzip magic — Content-Length framing, not
  * sentinel scanning, is the contract, /root/reference/read.go:101-111),
  * through every compression codec, and URL normalization must be
  * idempotent. */
class CodecPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, min: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$name: $res")
  }

  // payloads biased toward framing hazards
  private val hazardChunks: Gen[Array[Byte]] = Gen.oneOf(
    "\r\n\r\n".getBytes(UTF_8), "\r\n".getBytes(UTF_8),
    "WARC/1.1\r\n".getBytes(UTF_8), "Content-Length: 7\r\n".getBytes(UTF_8),
    Array[Byte](0x1f, 0x8b.toByte, 8, 0), Array[Byte](0, -1, 127, -128))
  private val payloadGen: Gen[Array[Byte]] = Gen.sized { _ =>
    Gen.listOf(Gen.oneOf(
      hazardChunks,
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)))
      .map(_.flatten.toArray)
  }

  private val headerKeyGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('-'))).map(_.mkString.take(30))
  private val headerValGen: Gen[String] =
    Gen.listOf(Gen.choose(' ', '~')).map(_.mkString.take(60).trim)
  private val headersGen: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(headerKeyGen, headerValGen)).map(_.filter { case (k, v) =>
      k.nonEmpty && !k.contains(":") && v.nonEmpty })

  private val recordGen: Gen[WarcRecord] = for {
    h <- headersGen
    p <- payloadGen
  } yield WarcCodec.withDefaults(
    WarcRecord("WARC/1.1", h + ("WARC-Type" -> "resource"), p),
    java.time.Instant.ofEpochSecond(1647748545L))

  test("WARC serialize/parse roundtrips any payload bytes and headers") {
    check("roundtrip", Prop.forAll(recordGen) { rec =>
      val back = WarcCodec.parseAll(WarcCodec.serialize(rec))
      back.size == 1 &&
        back.head.headers == rec.headers &&
        java.util.Arrays.equals(back.head.content, rec.content) &&
        back.head.blockDigest == back.head.computedBlockDigest
    })
  }

  test("multi-record streams preserve count and order through every codec") {
    val recsGen = Gen.nonEmptyListOf(recordGen).map(_.take(8))
    val codecs = Seq(Codecs.NoCompression, Codecs.GzipCompression,
      Codecs.ZstdCompression(None),
      Codecs.ZstdCompression(Some(("warc dict " * 50).getBytes(UTF_8))))
    check("streams", Prop.forAll(recsGen, Gen.choose(0, 3)) { (recs, ci) =>
      val bos = new java.io.ByteArrayOutputStream()
      val w = Codecs.memberWriter(bos, codecs(ci))
      recs.foreach(r => w.writeMember(WarcCodec.serialize(r)))
      w.close()
      val back = WarcCodec.readAll(
        Codecs.sniffStream(new java.io.ByteArrayInputStream(bos.toByteArray)))
      back.size == recs.size &&
        back.zip(recs).forall { case (b, r) => java.util.Arrays.equals(b.content, r.content) }
    }, min = 60)
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "Https")
    host <- Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaLowerChar, Gen.oneOf('A', 'Z', '0', '-', '.')))
      .map(_.mkString.take(30))
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOf(Gen.oneOf("a", "b%41", ".", "..", "doc", "%2e", "x y", "index.html"))
    q <- Gen.oneOf("", "?b=2&a=1", "?x")
    f <- Gen.oneOf("", "#frag")
  } yield s"$scheme://$host$port/${segs.mkString("/")}$q$f"

  test("URL normalization is idempotent on url-shaped input") {
    check("idempotent", Prop.forAll(urlGen) { u =>
      val once = UrlNormalizer.normalize(u)
      !UrlNormalizer.isValid(once) || UrlNormalizer.normalize(once) == once
    }, min = 300)
  }

  test("normalization equivalence classes: case/port/dot-segment variants collapse") {
    check("equiv", Prop.forAll(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(20))) { h =>
      val base = s"https://$h.example/a/b"
      val variants = Seq(
        s"HTTPS://${h.toUpperCase}.EXAMPLE/a/b",
        s"https://$h.example:443/a/b",
        s"https://$h.example/a/./b",
        s"https://$h.example/c/../a/b",
        s"https://$h.example/a/b#frag")
      val want = UrlNormalizer.normalize(base)
      variants.forall(v => UrlNormalizer.normalize(v) == want)
    }, min = 50)
  }
}
