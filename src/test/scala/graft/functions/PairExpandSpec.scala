package graft.functions

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the streaming pair generator (PairExpand) beyond what
  * DedupSpec exercises through selfPairs/crossPairs: non-long element
  * types, empty/null arrays, the SQL registration, and the row-reuse
  * discipline (a retained collect must see DISTINCT pair values, which
  * fails if GenerateExec ever stopped copying generated rows). */
class PairExpandSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._
  import GraftFunctions.pair_expand

  test("diagonal emits the exact triangle; cross emits the full product") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(10L, 20L))).toDF("as", "bs")
    val tri = df.select(pair_expand(col("as"), col("as"), lit(true)).as(Seq("x", "y")))
      .as[(Long, Long)].collect().toSet
    assert(tri == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    val cross = df.select(pair_expand(col("as"), col("bs"), lit(false)).as(Seq("x", "y")))
      .as[(Long, Long)].collect().toSet
    assert(cross == (for (a <- 1L to 4L; b <- Seq(10L, 20L)) yield (a, b)).toSet)
  }

  test("string elements take the generic path") {
    val df = Seq((Seq("a", "b", "c"), true)).toDF("as", "d")
    val got = df.select(pair_expand(col("as"), col("as"), col("d")).as(Seq("x", "y")))
      .as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("empty, singleton-diagonal, and null arrays emit no rows") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L), false),
      (Seq(1L, 2L), Seq.empty[Long], false),
      (Seq(7L), Seq(7L), true),
      (null, Seq(1L), false)
    ).toDF("as", "bs", "d")
    val got = df.select(pair_expand(col("as"), col("bs"), col("d")).as(Seq("x", "y")))
    assert(got.count() == 0L)
  }

  test("large diagonal: every pair distinct (row reuse never leaks)") {
    val n = 500L
    val df = Seq(Tuple1((0L until n).toSeq)).toDF("as")
    val got = df.select(pair_expand(col("as"), col("as"), lit(true)).as(Seq("x", "y")))
      .as[(Long, Long)].collect()
    assert(got.length == (n * (n - 1) / 2).toInt)
    assert(got.toSet.size == got.length, "reused generator row leaked into retained output")
    assert(got.forall { case (x, y) => x < y })
  }

  test("SQL registration: LATERAL-style select works") {
    GraftFunctions.registerAll(spark)
    Seq((Seq(1L, 2L, 3L), Seq(5L))).toDF("as", "bs").createOrReplaceTempView("pe_in")
    val got = spark.sql(
      "SELECT p.x, p.y FROM pe_in LATERAL VIEW pair_expand(as, bs, false) p AS x, y")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 5L), (2L, 5L), (3L, 5L)))
  }
}
