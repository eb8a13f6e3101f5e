package graft.codec

import graft.sources.PagesGen
import graft.tools.BpeGen
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  test("byte map is a space-free bijection (GPT-2 construction)") {
    assert(Bpe.byteToChar.length == 256)
    assert(Bpe.byteToChar.toSet.size == 256, "must be injective")
    assert(!Bpe.byteToChar.contains(' '), "no mapped char may be a space")
    assert(Bpe.byteToChar('a'.toInt) == 'a') // printable keeps itself
    assert(Bpe.byteToChar(0x20) == 'Ġ') // space maps into 256+
    (0 until 256).foreach(b => assert(Bpe.charToByte(Bpe.byteToChar(b)) == b))
  }

  test("pretokenizer: leading-space words, digit runs, punct runs, multi-space") {
    assert(Bpe.pretokenize("Hello,  world42 これは x").toSeq ==
      Seq("Hello", ",", "  ", "world", "42", " これは", " x"))
    assert(Bpe.pretokenize("").isEmpty && Bpe.pretokenize(null).isEmpty)
    // concatenation of pretokens reproduces the text exactly (total split)
    val t = "a b.c  d\te\nf 12x これ!?"
    assert(Bpe.pretokenize(t).mkString == t)
  }

  test("committed merge table is reproducible: retraining yields the same prefix") {
    // BPE training is prefix-stable (merges are learned greedily one at a
    // time), so retraining with a smaller budget must reproduce the head
    // of the committed 300-merge file bit-for-bit
    val retrained = Bpe.train(
      (0L until BpeGen.CorpusDocs).iterator
        .map(id => PagesGen.genText(id, BpeGen.CorpusSeed, BpeGen.CorpusDocs)._1),
      nMerges = 40)
    assert(Bpe.defaultMerges.size == BpeGen.NumMerges)
    assert(retrained == Bpe.defaultMerges.take(40),
      "committed bpe_merges.txt does not match deterministic retraining — rerun BpeGen")
  }

  test("distributed trainer is bit-identical to the sequential loop") {
    // 60 merges over the committed corpus through BOTH trainers; every
    // aggregate is an integer sum and the argmax order is total, so the
    // Spark path must reproduce the driver loop exactly — and therefore
    // the committed table's head too (prefix stability)
    val spark = graft.GraftSession.local(4)
    val dist = Bpe.trainDistributed(BpeGen.corpusDf(spark), nMerges = 60)
    val seq = Bpe.train(
      (0L until BpeGen.CorpusDocs).iterator
        .map(id => PagesGen.genText(id, BpeGen.CorpusSeed, BpeGen.CorpusDocs)._1),
      nMerges = 60)
    assert(dist == seq, "distributed and sequential merge sequences diverge")
    assert(dist == Bpe.defaultMerges.take(60),
      "distributed training does not reproduce the committed table head")
  }

  test("greedy lowest-rank encode equals the rank-order sequential sweep") {
    // the equivalence the DuckDB replace()-chain oracle relies on
    def sweep(tok: String): Array[String] = {
      var syms = Bpe.toSymbols(tok)
      Bpe.defaultMerges.foreach { case (a, b) =>
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
      syms
    }
    val toks = (0L until 300L)
      .flatMap(id => Bpe.pretokenize(PagesGen.genText(id, 7L, 300L)._1))
      .distinct
    assert(toks.size > 500)
    toks.foreach { tok =>
      assert(Bpe.encode(tok, Bpe.defaultRanks).toSeq == sweep(tok).toSeq,
        s"greedy != sweep for pretoken '$tok'")
    }
  }

  test("encodeText round-trips: unmapping token bytes reproduces the text") {
    val texts = Seq(
      "the quick brown fox 123 jumps!",
      "これは日本語のテキストです",
      "mixed ascii これ und Käse 42",
      "  spaces   and\ttabs\nnewlines  ")
    texts.foreach { t =>
      val tokens = Bpe.encodeText(t)
      val bytes = tokens.flatMap(_.map(ch => Bpe.charToByte(ch).toByte)).toArray
      assert(new String(bytes, "UTF-8") == t)
    }
  }

  test("countTokens: zero for empty, additive over pretokens, cache-consistent") {
    assert(Bpe.countTokens(null) == 0)
    assert(Bpe.countTokens("") == 0)
    val t = PagesGen.genText(17L, 42L, 100L)._1
    val expected = Bpe.pretokenize(t).map(Bpe.encode(_, Bpe.defaultRanks).length).sum
    assert(Bpe.countTokens(t) == expected)
    assert(Bpe.countTokens(t) == expected) // second call hits the memo
  }

  test("encodeIdsStr: ids invert to the original text through the vocab") {
    assert(Bpe.vocab.map(_._1).distinct.size == Bpe.vocab.size, "vocab symbols unique")
    assert(Bpe.vocab.map(_._2).distinct.size == Bpe.vocab.size, "vocab ids unique")
    val idToSym = Bpe.vocab.map { case (s, id) => id -> s }.toMap
    val t = PagesGen.genText(23L, 42L, 100L)._1
    val ids = Bpe.encodeIdsStr(t).split(",").filter(_.nonEmpty).map(_.toInt)
    assert(ids.length == Bpe.countTokens(t), "id count must equal token count")
    val bytes = ids.flatMap(id => idToSym(id).map(c => Bpe.charToByte(c).toByte))
    assert(new String(bytes, "UTF-8") == t, "ids must losslessly invert to the text")
    assert(Bpe.encodeIdsStr("") == "" && Bpe.encodeIdsStr(null) == "")
  }

  test("merges compose: every learned merge's parts are prior symbols") {
    // pair (a,b) can only reference symbols buildable from earlier merges
    // or single bytes — the property that makes the rank-order sweep sound
    val known = scala.collection.mutable.Set[String]() ++
      (0 until 256).map(b => String.valueOf(Bpe.byteToChar(b)))
    Bpe.defaultMerges.foreach { case (a, b) =>
      assert(known.contains(a), s"merge left '$a' not a known symbol")
      assert(known.contains(b), s"merge right '$b' not a known symbol")
      known += (a + b)
    }
  }
}
