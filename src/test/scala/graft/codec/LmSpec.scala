package graft.codec

import graft.sources.PagesGen
import graft.tools.LmGen
import org.scalatest.funsuite.AnyFunSuite

class LmSpec extends AnyFunSuite {

  test("symbol mapping: case-folded letters, digits, space, OTHER; code-point safe") {
    assert(Lm.symbol('a') == 0 && Lm.symbol('z') == 25)
    assert(Lm.symbol('A') == 0 && Lm.symbol('Z') == 25)
    assert(Lm.symbol('0') == 26 && Lm.symbol('9') == 35)
    assert(Lm.symbol(' ') == 36)
    assert(Lm.symbol('こ') == 37 && Lm.symbol('.') == 37 && Lm.symbol('\n') == 37)
    // astral plane: one symbol per CODE POINT, not per UTF-16 unit
    assert(Lm.symbols("a😀b").toSeq == Seq(0, 37, 1))
    assert(Lm.symbols("").isEmpty && Lm.symbols(null).isEmpty)
  }

  test("committed bigram table reproduces from deterministic retraining") {
    val retrained = LmGen.trainDefault()
    assert(retrained.flatten.toSeq == Lm.defaultSlog.flatten.toSeq,
      "committed lm_bigrams.txt does not match retraining — rerun LmGen")
    // smoothed distribution: every row's probabilities sum to ~1
    retrained.foreach { row =>
      val psum = row.map(sl => math.pow(2.0, sl.toDouble / Lm.Scale)).sum
      assert(math.abs(psum - 1.0) < 0.01, s"row probabilities sum to $psum")
    }
  }

  test("score: exact brute-force match, and the LM separates text from gibberish") {
    def brute(t: String): (Int, Long) = {
      val s = Lm.symbols(t)
      if (s.length < 2) (0, 0L)
      else (s.length - 1,
        s.sliding(2).map(p => Lm.defaultSlog(p(0))(p(1))).sum)
    }
    Seq("Hello world 42!", "", "x", PagesGen.genText(11L, 42L, 100L)._1,
      "これは日本語 mixed text").foreach { t =>
      assert(Lm.score(t) == brute(t), s"score mismatch for '${t.take(30)}'")
    }
    def mean(t: String): Double = {
      val (n, s) = Lm.score(t)
      s.toDouble / n / Lm.Scale
    }
    val natural = mean(PagesGen.genText(8L, 42L, 100L)._1)
    val gibberish = mean("zqxj vvkk qqq zzz xjq kjzx qzx jxq zqx jqz xqj")
    assert(natural > gibberish + 0.5,
      f"LM must separate corpus-like text ($natural%.2f) from gibberish ($gibberish%.2f)")
  }
}
