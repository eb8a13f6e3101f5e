package graft.tools

import graft.{Bench, GraftSession}

/** Scaling-efficiency evidence (BASELINE.json north_rule: throughput
  * scaling ≥0.8 from N to 4N executors; sandbox stand-in per driver
  * instruction: the same job at local[8] vs local[32] on the same input).
  *
  * Runs the headline frontier round at both parallelism levels (one warmup
  * + median of 3 at each), prints one JSON line and appends to
  * BENCH_SCALING.json.
  */
object ScalingBench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def runAt(cores: Int, nPages: Long): (Double, Double) = {
    val spark = GraftSession.local(cores)
    try {
      Bench.headline(spark, math.min(nPages, 20000L)) // warmup
      val runs = (1 to 3).map(_ => Bench.headline(spark, nPages))
      (median(runs.map(_.urlsPerSec)), median(runs.map(_.extractMBps)))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nPages = args.lift(0).map(_.toLong).getOrElse(150000L)
    val (lo, hi) = (8, 32)
    val (uLo, mLo) = runAt(lo, nPages)
    val (uHi, mHi) = runAt(hi, nPages)
    val effU = (uHi / uLo) / (hi.toDouble / lo)
    val effM = (mHi / mLo) / (hi.toDouble / lo)
    val json =
      f"""{"pages":$nPages,"cores_lo":$lo,"cores_hi":$hi,"urls_per_sec_lo":$uLo%.0f,"urls_per_sec_hi":$uHi%.0f,"extract_mbps_lo":$mLo%.1f,"extract_mbps_hi":$mHi%.1f,"scaling_eff_urls":$effU%.3f,"scaling_eff_extract":$effM%.3f}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SCALING.json"), json + "\n")
  }
}
