package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Bio

class BioSpec extends AnyFunSuite {

  test("decode basic B/I/O spans (MyDataset.py:33-65)") {
    val tokens = Seq("Alice", "Johnson", "visited", "New", "York", ".")
    val tags = Seq("B-PER", "I-PER", "O", "B-LOC", "I-LOC", "O")
    assert(Bio.decode(tokens, tags) == List(("Alice Johnson", "PER"), ("New York", "LOC")))
  }

  test("decode reference edge cases") {
    // I- without B- opens an entity
    assert(Bio.decode(Seq("York"), Seq("I-LOC")) == List(("York", "LOC")))
    // entity at end of sequence is flushed
    assert(Bio.decode(Seq("met", "Bob"), Seq("O", "B-PER")) == List(("Bob", "PER")))
    // adjacent B-B
    assert(Bio.decode(Seq("Paris", "London"), Seq("B-LOC", "B-LOC")) ==
      List(("Paris", "LOC"), ("London", "LOC")))
    // I of a DIFFERENT tag merges and retags (reference quirk, line 57)
    assert(Bio.decode(Seq("Alice", "Acme"), Seq("B-PER", "I-ORG")) ==
      List(("Alice Acme", "ORG")))
  }

  test("encode∘decode roundtrip on well-formed spans (500 seeded cases)") {
    val rnd = new scala.util.Random(42)
    val tagSet = Vector("PER", "ORG", "LOC", "MISC")
    (1 to 500).foreach { _ =>
      val n = 1 + rnd.nextInt(12)
      val toks = Vector.fill(n)(('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(5)))
      // carve non-overlapping, non-adjacent-same-tag spans left to right
      var spans = List.empty[(Int, Int, String)]
      var pos = 0
      while (pos < n) {
        if (rnd.nextBoolean() && pos < n) {
          val len = 1 + rnd.nextInt(math.min(3, n - pos))
          spans = (pos, pos + len, tagSet(rnd.nextInt(4))) :: spans
          pos += len + 1 // gap so decode can't merge adjacent spans
        } else pos += 1
      }
      val ordered = spans.reverse
      val tags = Bio.encode(toks, ordered)
      val decoded = Bio.decode(toks, tags)
      val expected = ordered.map { case (s, e, t) => (toks.slice(s, e).mkString(" "), t) }
      assert(decoded == expected, s"toks=$toks spans=$ordered tags=$tags")
    }
  }

  test("markupAtAt wraps one tag only (MyDataset.py:68-101)") {
    val tokens = Seq("Alice", "Johnson", "visited", "New", "York")
    val tags = Seq("B-PER", "I-PER", "O", "B-LOC", "I-LOC")
    assert(Bio.markupAtAt(tokens, tags, "PER") == "@@Alice Johnson## visited New York")
    assert(Bio.markupAtAt(tokens, tags, "LOC") == "Alice Johnson visited @@New York##")
  }

  test("markupAtAt roundtrips through parseAtAt") {
    val tokens = Seq("Bob", "met", "Eve", "Smith")
    val tags = Seq("B-PER", "O", "B-PER", "I-PER")
    val marked = Bio.markupAtAt(tokens, tags, "PER")
    assert(graft.functions.Parsers.parseAtAt(marked, "PER") ==
      List(("Bob", "PER"), ("Eve Smith", "PER")))
  }

  test("markupXml wraps mentions with word tags (MyDataset.py:104-109)") {
    val text = "Alice visited Paris"
    val out = Bio.markupXml(text, Seq(("Alice", "PER"), ("Paris", "LOC")))
    assert(out == "<person>Alice</person> visited <location>Paris</location>")
    // roundtrip through the wrapper parser
    assert(graft.functions.Parsers.parseWrapped(out) ==
      List(("Alice", "PER"), ("Paris", "LOC")))
  }
}
