package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Interop with the published GPT-2 `vocab.bpe` interchange format: the
  * byte-level unicode mapping (the public `bytes_to_unicode`), the
  * loader/serializer round trip, and table-driven application of a
  * loaded file. The real published file cannot be vendored here (no
  * network in this environment); the format is pinned exactly — Ġ/Ċ
  * byte markers, `#version` header, rank-ordered space-separated pairs —
  * so `loadGpt2Merges(Files.readAllLines(vocab.bpe))` consumes the
  * published table unchanged. */
class Gpt2MergesSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureLines: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/gpt2_fixture.bpe")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  test("byte-level mapping pins the published GPT-2 constants") {
    assert(Bpe.gpt2ByteToChar(0x20) == 'Ġ') // space, the vocab.bpe word marker
    assert(Bpe.gpt2ByteToChar(0x0A) == 'Ċ') // newline
    assert(Bpe.gpt2ByteToChar(0x09) == 'ĉ') // tab
    assert(Bpe.gpt2ByteToChar(0x00) == 'Ā') // U+0100, first remapped byte
    assert(Bpe.gpt2ByteToChar(0x7F) == 'ġ') // DEL: first excluded byte after space
    assert(Bpe.gpt2ByteToChar('!'.toInt) == '!') // printables map to themselves
    assert(Bpe.gpt2ByteToChar('~'.toInt) == '~')
    // bijective over all 256 bytes
    assert(Bpe.gpt2ByteToChar.values.toSet.size == 256)
    // the famous UTF-8 artifact: é's two bytes render as "Ã©" in vocab.bpe
    assert(Bpe.gpt2EncodeSymbol("é") == "Ã©")
    assert(Bpe.gpt2DecodeSymbol("Ã©") == "é")
  }

  test("a vocab.bpe-format file loads to the wrapped table and round-trips") {
    val loaded = Bpe.loadGpt2Merges(fixtureLines)
    assert(loaded == Seq("{l}{o}", "{lo}{w}", "{ }{low}", "{ low}{e}"))
    assert(Bpe.writeGpt2Merges(loaded) == fixtureLines)
  }

  test("the loaded table equals the table trained on the classic corpus") {
    // the fixture IS this corpus's table serialized to the published
    // format — training and loading converge on identical wrapped pairs
    val docs = Seq((1L, "low lower low"), (2L, "newest low")).toDF("doc_id", "text")
    assert(Bpe.train(docs, col("text"), 4) == Bpe.loadGpt2Merges(fixtureLines))
  }

  test("table-driven application of a loaded file (hand-derived segmentation)") {
    val merges = Bpe.loadGpt2Merges(fixtureLines)
    val docs = Seq((1L, "low lower low newest")).toDF("doc_id", "text")
    val segs = docs.select(Bpe.segment(col("text"), merges).as("s"))
      .head().getSeq[String](0)
    // "low"→[low]; " lower"→[" low",e,r]→merge 4→[" lowe","r"];
    // " low"→[" low"]; " newest" has no applicable merge → 7 single chars
    assert(segs == Seq("low", " lowe", "r", " low",
      " ", "n", "e", "w", "e", "s", "t"))
    val tc = Bpe.tokenCounts(docs, col("text"), col("doc_id"), merges)
      .head()
    assert(tc.getAs[Long]("n_pre") == 4L)
    assert(tc.getAs[Long]("n_bpe") == 11L)
  }

  test("head of the published GPT-2 table reproduces known tokenizations") {
    // The first 8 merges of the published vocab.bpe, in rank order —
    // the most-quoted lines of the file (space is Ġ in byte-level form).
    // Feeding them through the loader must reproduce the published
    // table's behavior on text they fully cover: " the" collapses
    // Ġ t → Ġt, h e → he, Ġt he → Ġthe — the canonical leading-space
    // GPT-2 token — while " era" stops at [Ġ, er, a] because Ġer is a
    // later merge than this head holds.
    val head = Seq("#version: 0.2",
      "Ġ t", "Ġ a", "h e", "i n", "r e", "o n", "Ġt he", "e r")
    val merges = Bpe.loadGpt2Merges(head)
    val docs = Seq((1L, "in the era")).toDF("doc_id", "text")
    val segs = docs.select(Bpe.segment(col("text"), merges).as("s"))
      .head().getSeq[String](0)
    assert(segs == Seq("in", " the", " ", "er", "a"))
  }

  test("malformed lines and non-byte-level chars fail loudly") {
    intercept[IllegalArgumentException] {
      Bpe.loadGpt2Merges(Seq("a b c"))
    }
    intercept[IllegalArgumentException] {
      Bpe.gpt2DecodeSymbol("a b") // raw space is not a byte-level char
    }
  }
}
