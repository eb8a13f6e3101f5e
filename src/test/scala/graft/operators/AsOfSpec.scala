package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed AS-OF join vs a brute-force oracle, plus the SURT key
  * and stratified-sampling operators added alongside it. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  test("asofJoin equals brute force, including ties and unmatched probes") {
    // deterministic pseudo-random history: 40 keys × up to 12 captures
    val captures = for {
      k <- 0 until 40
      j <- 0 until (1 + (k * 7) % 12)
    } yield (s"k$k", 100L + ((k * 131 + j * 977) % 1000), s"v$k-$j")
    val probes = for {
      k <- 0 until 45 // keys 40..44 have NO captures
      j <- 0 until 3
    } yield (s"k$k", 80L + ((k * 313 + j * 557) % 1100))

    val pDf = probes.toDF("k", "ts")
    val cDf2 = captures.toDF("k", "cap_ts", "v")
    val got2 = AsOf.asofJoin(pDf, cDf2, "k", "ts", "cap_ts")
      .select("k", "ts", "v", "asof_cap_ts")
      .as[(String, Long, String, Option[Long])].collect().toSet

    val byKey = captures.groupBy(_._1)
    val want = probes.map { case (k, ts) =>
      val best = byKey.getOrElse(k, Seq.empty).filter(_._2 <= ts)
      if (best.isEmpty) (k, ts, null: String, None: Option[Long])
      else {
        // tie-break: max (ts, payload-struct) — payload starts with cap_ts
        val b = best.maxBy(c => (c._2, c._3))
        (k, ts, b._3, Some(b._2))
      }
    }.toSet
    assert(got2 == want)

    // exact-tie semantics: a capture AT the probe time is matched (<=)
    val p1 = Seq(("a", 50L)).toDF("k", "ts")
    val c1 = Seq(("a", 50L, "hit"), ("a", 49L, "older")).toDF("k", "cap_ts", "v")
    assert(AsOf.asofJoin(p1, c1, "k", "ts", "cap_ts").select("v").as[String].head() == "hit")

    // colliding value columns are rejected, not silently renamed
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(pDf, captures.toDF("k", "cap_ts", "ts"), "k", "ts", "cap_ts")
    }
  }

  test("asofJoin plan: one exchange on the key, no join operator") {
    val pDf = (0 until 100).map(i => (s"k${i % 10}", i.toLong)).toDF("k", "ts")
    val cDf = (0 until 300).map(i => (s"k${i % 10}", i.toLong, i)).toDF("k", "cap_ts", "v")
    val plan = AsOf.asofJoin(pDf, cDf, "k", "ts", "cap_ts").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not expand via a join:\n$plan")
    assert(plan.contains("Window"), "ordered window pass expected")
  }

  test("url_surt: reversed host labels, path, query; fragment and default port dropped") {
    import graft.functions.GraftFunctions.url_surt
    val cases = Seq(
      "https://www.Example.COM/a/b" -> "com,example,www)/a/b",
      "http://sub.deep.example.org:80/x?b=2#frag" -> "org,example,deep,sub)/x?b=2",
      "https://example.com" -> "com,example)/",
      "https://example.com:443/./p/../q" -> "com,example)/q")
    val got = cases.map(_._1).toDF("url").select(url_surt(col("url"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g == w) }
  }

  test("curate: funnel counters observable and monotone, stages compose") {
    val docs = (0L until 600L).map { i =>
      val text =
        if (i % 10 == 0) "short doc"                             // fails quality
        else if (i % 7 < 2) s"duplicate body ${i % 7} " * 40     // dedup clusters
        else s"unique body $i with plenty of distinct words " * 8
      (i, if (i % 2 == 0) "en" else "de", text)
    }.toDF("doc_id", "lang", "text")
    // eval set shares a 13-gram with the duplicate-body cluster 0 texts
    val eval = Seq(("duplicate body 0 " * 10).trim).toDF("text")
    val out = TrainingData.curate(docs, Some(eval),
      TrainingData.CurationConfig(minTokens = 20,
        langRates = Map("en" -> 1.0, "de" -> 0.5), contamN = 13, salt = "t"))
    // execute `out` itself: observed metrics populate only on the
    // executed Dataset's own QueryExecution
    val kept = out.collect().map(_.getAs[Long]("doc_id")).toSet
    val m = out.queryExecution.observedMetrics
    def c(n: String): Long = m(n).getAs[Long]("rows")
    assert(c("curation_input") == 600L)
    assert(c("curation_quality") == 540L, "60 short docs fail the token gate")
    assert(c("curation_dedup") < c("curation_quality"),
      "duplicate bodies must collapse to their first doc")
    assert(c("curation_decontam") == c("curation_dedup") - 1,
      "exactly the cluster-0 keeper shares an eval 13-gram")
    assert(c("curation_out") == kept.size.toLong)
    assert(c("curation_out") < c("curation_decontam"), "mix must subsample de")
    // survivors: no short docs, at most one doc per duplicate body, no
    // doc from the contaminated cluster
    assert(kept.forall(_ % 10 != 0))
    assert(!kept.exists(i => i % 10 != 0 && i % 7 == 0), "cluster 0 is contaminated")
    val cluster1 = kept.filter(i => i % 10 != 0 && i % 7 == 1)
    assert(cluster1.subsetOf(Set(1L)),
      "cluster 1 may keep at most its first doc (the mix can drop even that)")
  }

  test("stratifiedSample: deterministic, rate-accurate, salt-independent draws") {
    val docs = (0L until 20000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 0.5, "de" -> 0.1)
    val a = Mixing.stratifiedSample(docs, "lang", rates, salt = "s1")
      .select("doc_id").as[Long].collect().sorted
    val b = Mixing.stratifiedSample(docs.repartition(13), "lang", rates, salt = "s1")
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b), "sample must be independent of partitioning")
    val en = a.count(_ % 3 == 0).toDouble / (20000 / 3 + 1)
    val de = a.count(_ % 3 != 0).toDouble / (20000 - 20000 / 3 - 1)
    assert(math.abs(en - 0.5) < 0.02, s"en rate $en")
    assert(math.abs(de - 0.1) < 0.02, s"de rate $de")
    // a different salt draws a (mostly) different sample at the same rates
    val c = Mixing.stratifiedSample(docs, "lang", rates, salt = "s2")
      .select("doc_id").as[Long].collect().toSet
    val overlap = a.count(c.contains).toDouble / a.length
    assert(overlap < 0.7, s"independent draws should overlap ~rate, got $overlap")
    // unknown strata default to 0 (dropped)
    assert(Mixing.stratifiedSample(docs.withColumn("lang", lit("xx")), "lang", rates).count() == 0)
  }
}
