package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.{Lexicon, Scorer, TranscriptGen}

/** The indexed matcher must be byte-identical to the round-1 naive
  * per-form scan (reference algorithm reproduced here) on the full
  * surface-form lexicon over real corpus turns plus adversarial
  * fixtures — the matcher is the extraction hot path and its output
  * defines every downstream gate.
  */
class MatcherSpec extends AnyFunSuite {

  /** Round-1 reference algorithm: per-form indexOf scan, claims in
    * (form priority, occurrence) order. */
  private def naive(forms: IndexedSeq[(String, String, String)], text: String): List[(String, String)] = {
    if (text.isEmpty) return Nil
    val claimed = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    forms.foreach { case (surface, _, tag) =>
      var from = 0
      var idx = text.indexOf(surface, from)
      while (idx >= 0) {
        val end = idx + surface.length
        val boundedLeft = idx == 0 || !text.charAt(idx - 1).isLetterOrDigit
        val boundedRight = end >= text.length || !text.charAt(end).isLetterOrDigit
        val overlaps = claimed.exists { case (s, e) => idx < e && s < end }
        if (boundedLeft && boundedRight && !overlaps) {
          claimed += ((idx, end))
          found += ((idx, surface, tag))
        }
        from = idx + 1
        idx = text.indexOf(surface, from)
      }
    }
    found.sortBy(_._1).map { case (_, s, t) => (s, t) }.toList
  }

  test("indexed matcher ≡ naive per-form scan on the full corpus") {
    val m = Scorer.newMatcher()
    val forms = Lexicon.surfaceForms
    val cfg = TranscriptGen.Config(nConvs = 250)
    var checked = 0
    (0L until 250L).foreach { conv =>
      (0 until TranscriptGen.turnsFor(conv, cfg)).foreach { t =>
        val text = TranscriptGen.genTurn(conv, t, cfg).turn.text
        assert(m.findMentions(text) == naive(forms, text), s"text: $text")
        checked += 1
      }
    }
    assert(checked > 2000)
  }

  test("indexed matcher ≡ naive scan on adversarial fixtures") {
    val m = Scorer.newMatcher()
    val forms = Lexicon.surfaceForms
    val p = Lexicon.People(0)          // e.g. "Alice Johnson"
    val first = p.split(" ").head
    val fixtures = Seq(
      "",
      p,                                // exact mention, whole text
      s"$p$p",                          // concatenated (unbounded) — no match
      s"$p $p",                         // repeated mention
      s"x$p y",                         // left-unbounded
      s"$p.",                           // punctuation boundary
      s"${p}s went home",               // right-unbounded
      s"$first alone is not a mention", // prefix word only
      s"${Lexicon.Orgs(0)} and ${Lexicon.Locs(0)} and $p",
      s"${Lexicon.variant(p, 1)} met $p at ${Lexicon.Orgs(1)}", // variant vs canonical
      "1234 Alice 5678",
      s"  $p  ",
      Lexicon.People.take(8).mkString(" , "))
    fixtures.foreach { text =>
      assert(m.findMentions(text) == naive(forms, text), s"text: [$text]")
    }
  }

  test("forms starting with a non-alphanumeric char still match (fallback scan)") {
    val forms = Vector(("-Org", "x", "ORG"), ("Alice Johnson", "x", "PERSON"))
    val m = new Scorer.Matcher(forms)
    val texts = Seq(
      "met -Org today",            // non-word-start form present
      "-Org",                      // whole text
      "x-Org y",                   // left char not letter/digit → bounded
      "a-Orgb",                    // right-unbounded → no match
      "Alice Johnson met -Org")    // both kinds together
    texts.foreach { text =>
      assert(m.findMentions(text) == naive(forms, text), s"text: [$text]")
    }
    assert(m.findMentions("met -Org today") == List(("-Org", "ORG")))
  }
}
