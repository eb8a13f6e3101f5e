package graft.tools

/** Standalone single-thread WARC codec micro-bench (the BASELINE.md
  * read/write MB/s basis) — run it N times in one JVM to separate JIT
  * warmup and VM-noise effects from real regressions:
  * `runMain graft.tools.CodecBench [passes]`. */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 3
    (1 to passes).foreach { p =>
      val (r, w) = graft.Bench.codecMicro()
      println(f"PASS $p read=$r%.1f MB/s write=$w%.1f MB/s")
    }
  }
}
