package graft.state

import graft.GraftSession
import graft.operators.{Crawl, Frontier}
import graft.sources.PagesGen
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class TableIOSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  test("snapshot commit / read / time travel / counters") {
    val dir = Files.createTempDirectory("graft-tbl").toString
    val t = s"$dir/t"
    val s0 = TableIO.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t, Map("n" -> 2L))
    assert(s0.id == 0L && s0.rowCount == 2L)
    val s1 = TableIO.commit(Seq((3L, "c")).toDF("k", "v"), t, Map("n" -> 1L))
    assert(s1.id == 1L && s1.parentId.contains(0L))
    assert(TableIO.latestSnapshotId(t).contains(1L))
    assert(TableIO.read(spark, t, None).get.count() == 1L)
    assert(TableIO.read(spark, t, Some(0L)).get.count() == 2L) // time travel
    assert(TableIO.readManifest(t, 0L).counters == Map("n" -> 2L))
    // per-partition lineage: the manifest knows which files carry which
    // rows, and they sum to the snapshot's rowCount
    val m0 = TableIO.readManifest(t, 0L)
    assert(m0.files.nonEmpty && m0.files.keys.forall(_.endsWith(".parquet")))
    assert(m0.files.values.sum == m0.rowCount)
    assert(TableIO.readManifest(t, 1L).files.values.sum == 1L)
    assert(TableIO.read(spark, s"$dir/nope", None).isEmpty)
  }

  test("crawl resumes exactly from a committed snapshot") {
    val N = 1500L
    val pages = PagesGen.pages(spark, N, 10, 42L).toDF()
    val web = Crawl.asWeb(pages).cache()
    val seeds = PagesGen.seeds(N, 40, 10, 42L)
    val cfg = Frontier.Config(defaultBudget = 3, saltBuckets = 4)

    // uninterrupted 3 rounds
    val full = Crawl.crawl(spark, web, seeds, 3, None, None, cfg)

    // 2 rounds, then resume 1 round from the snapshot state
    val dir = Files.createTempDirectory("graft-crawl").toString
    val part1 = Crawl.crawl(spark, web, seeds, 2, None, None, cfg, Some(dir))
    assert(part1.rounds.length == 2)
    val part2 = Crawl.crawl(spark, web, seeds, 1, None, None, cfg, Some(dir))
    assert(part2.rounds.length == 1)
    assert(part1.rounds ++ part2.rounds == full.rounds,
      "resumed counters must equal the uninterrupted run")
  }
}
