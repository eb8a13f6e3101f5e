package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Bench-harness integrity: a query that crashes at bench time must be
  * RECORDED in the bench JSON, never silently timed as a healthy ~0 s run
  * (the correctness gate only sees wrong answers, not bench-only crashes —
  * OOM at scale, a bad path — so the bench must self-report). */
class BenchSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(2)

  val ok: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).select(col("id"))
  val boom: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("synthetic bench failure")
  test("timeQueries records plan-time and run-time failures per query") {
    val results = Bench.timeQueries(spark, "/unused",
      Map("a_ok" -> ok, "b_boom" -> boom))
    assert(results.map(_._1) == Seq("a_ok", "b_boom"))
    assert(results.find(_._1 == "a_ok").get._3.isEmpty)
    val err = results.find(_._1 == "b_boom").get._3
    assert(err.isDefined && err.get.contains("IllegalStateException"))
  }

  test("errorsJson is empty on a healthy run, populated and escaped on failure") {
    val healthy = Bench.timeQueries(spark, "/unused", Map("a_ok" -> ok))
    assert(Bench.errorsJson(healthy) == "{}")
    val quoteBoom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("he said \"no\"\nand left")
    val failed = Bench.timeQueries(spark, "/unused", Map("q" -> quoteBoom))
    val json = Bench.errorsJson(failed)
    assert(json.startsWith("{\"q\":"))
    assert(json.contains("\\\"no\\\""), "quotes must be escaped")
    assert(json.contains("\\n"), "newlines must be escaped")
    // and the whole thing parses as JSON (jackson is on the Spark classpath)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    assert(node.get("q").asText.contains("he said \"no\""))
  }
}
