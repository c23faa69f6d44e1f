package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg._

class TranscriptGenSpec extends AnyFunSuite {
  private val cfg = TranscriptGen.Config(nConvs = 50)

  test("surface forms are unambiguous (one canonical per surface)") {
    val bySurface = Lexicon.surfaceForms.groupBy(_._1)
    val ambiguous = bySurface.filter(_._2.map(_._2).distinct.length > 1)
    assert(ambiguous.isEmpty, s"ambiguous surfaces: ${ambiguous.keys.take(5)}")
  }

  test("catalogue ids are unique; duplicates carry variant names") {
    val cat = Lexicon.catalogue
    assert(cat.map(_.entity_id).distinct.length == cat.length)
    assert(cat.exists(_.entity_id.endsWith("x")), "expected duplicate catalogue entries")
  }

  test("genTurn is a pure function of (conv, turn, seed)") {
    val a = TranscriptGen.genTurn(7, 3, cfg)
    val b = TranscriptGen.genTurn(7, 3, cfg)
    assert(a == b)
    assert(TranscriptGen.genTurn(7, 4, cfg) != a)
  }

  test("gold mentions appear verbatim in the turn text") {
    (0L until 50L).foreach { c =>
      (0 until TranscriptGen.turnsFor(c, cfg)).foreach { t =>
        val g = TranscriptGen.genTurn(c, t, cfg)
        g.goldMentions.foreach { case (m, _) =>
          assert(g.turn.text.contains(m), s"'$m' not in '${g.turn.text}'")
        }
      }
    }
  }

  test("edge cases present at expected rates") {
    val turns = for {
      c <- 0L until 200L
      t <- 0 until TranscriptGen.turnsFor(c, TranscriptGen.Config(nConvs = 200))
    } yield TranscriptGen.genTurn(c, t, TranscriptGen.Config(nConvs = 200)).turn
    val n = turns.size.toDouble
    val empty = turns.count(_.text.isEmpty) / n
    val brace = turns.count(_.text.contains("{")) / n
    val oversized = turns.count(_.text.length > 10000) / n
    assert(empty > 0.005 && empty < 0.03, s"empty rate $empty")
    assert(brace > 0.01 && brace < 0.04, s"brace rate $brace")
    assert(oversized > 0.003 && oversized < 0.025, s"oversized rate $oversized")
    // hot entity skew: the hot person should dominate person mentions
    val hot = Lexicon.People(0)
    val personMentions = (for {
      c <- 0L until 200L
      t <- 0 until TranscriptGen.turnsFor(c, TranscriptGen.Config(nConvs = 200))
      (m, tag) <- TranscriptGen.genTurn(c, t, TranscriptGen.Config(nConvs = 200)).goldMentions
      if tag == "PERSON"
    } yield m)
    val hotShare = personMentions.count(_.startsWith("Alice J")) / personMentions.size.toDouble
    assert(hotShare > 0.15, s"hot share $hotShare")
  }

  test("scorer matcher recovers exactly the gold mentions on clean turns") {
    val m = Scorer.newMatcher()
    var checked = 0
    (0L until 50L).foreach { c =>
      (0 until TranscriptGen.turnsFor(c, cfg)).foreach { t =>
        val g = TranscriptGen.genTurn(c, t, cfg)
        if (g.turn.text.nonEmpty && !g.turn.text.contains("{") && g.turn.text.length < 10000) {
          assert(m.findMentions(g.turn.text) == g.goldMentions,
            s"text='${g.turn.text}'")
          checked += 1
        }
      }
    }
    assert(checked > 300)
  }
}
