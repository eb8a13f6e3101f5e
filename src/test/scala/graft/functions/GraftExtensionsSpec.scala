package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("extensions install the function surface for plain SQL sessions") {
    // force a fresh SparkSession (shared SparkContext is fine) so
    // withExtensions actually applies
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT url_normalize('HTTPS://Example.COM:443/a/../b#f') AS u,
          |       url_host('HTTP://Foo.Example/x') AS h,
          |       sha1_base32(encode('hello world', 'utf-8')) AS d,
          |       http_extract_text(encode(concat('HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi'), 'iso-8859-1')) AS t,
          |       cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
          |""".stripMargin).head()
      assert(row.getString(0) == "https://example.com/b")
      assert(row.getString(1) == "foo.example")
      assert(row.getString(2) == "FKXGYNOJJ7H3IFO35FPUBC445EPOQRXN")
      assert(row.getString(3) == "hi")
      assert(math.abs(row.getDouble(4) - 1.0) < 1e-12)
      // round-4 surface: tokenizer + LM kernels reachable from plain SQL
      val row2 = spark.sql(
        """SELECT bpe_count('hello world') AS n,
          |       bpe_ids('hello world') AS ids,
          |       lm_slog_sum('ab') AS lm,
          |       lang_id('the cat and the dog is in that house') AS lang
          |""".stripMargin).head()
      assert(row2.getInt(0) > 0)
      assert(row2.getString(1).split(",").length == row2.getInt(0),
        "bpe_ids length must equal bpe_count")
      assert(row2.getLong(2) == graft.codec.Lm.defaultSlog(0)(1))
      assert(row2.getString(3) == "en")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
