package graft.tools

import graft.codec.Bpe
import graft.sources.PagesGen

/** Regenerate the committed BPE merge table
  * (src/main/resources/graft/bpe_merges.txt): trains the standard BPE loop
  * with deterministic tie-breaking on the repo's fixed synthetic corpus
  * (PagesGen seed 42, ids 0..3999) — a pure function, so every run
  * reproduces the file bit-for-bit (BpeSpec asserts this against the
  * committed copy).
  *
  * Usage: runMain graft.tools.BpeGen [outPath]
  */
object BpeGen {
  final val CorpusSeed = 42L
  final val CorpusDocs = 4000L
  final val NumMerges = 300

  def trainDefault(): Vector[(String, String)] =
    Bpe.train(
      (0L until CorpusDocs).iterator.map(id => PagesGen.genText(id, CorpusSeed, CorpusDocs)._1),
      NumMerges)

  def render(merges: Vector[(String, String)]): String =
    merges.map { case (a, b) => a + " " + b }.mkString("", "\n", "\n")

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "src/main/resources/graft/bpe_merges.txt"
    val merges = trainDefault()
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, render(merges).getBytes("UTF-8"))
    println(s"wrote ${merges.size} merges to $out")
  }
}
