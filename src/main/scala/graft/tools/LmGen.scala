package graft.tools

import graft.codec.Lm
import graft.sources.PagesGen

/** Regenerate the committed char-bigram LM table
  * (src/main/resources/graft/lm_bigrams.txt) from the repo's fixed
  * synthetic corpus (PagesGen seed 42, ids 0..3999 — the same corpus the
  * BPE table trains on). Pure function → bit-for-bit reproducible
  * (LmSpec asserts against the committed copy).
  *
  * Usage: runMain graft.tools.LmGen [outPath]
  */
object LmGen {
  final val CorpusSeed = 42L
  final val CorpusDocs = 4000L

  def trainDefault(): Array[Array[Long]] =
    Lm.train((0L until CorpusDocs).iterator
      .map(id => PagesGen.genText(id, CorpusSeed, CorpusDocs)._1))

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "src/main/resources/graft/lm_bigrams.txt"
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, Lm.render(trainDefault()).getBytes("UTF-8"))
    println(s"wrote ${Lm.AlphabetSize * Lm.AlphabetSize} bigram rows to $out")
  }
}
