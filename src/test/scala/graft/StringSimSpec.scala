package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.StringSim._

class StringSimSpec extends AnyFunSuite {
  private def approx(a: Double, b: Double, eps: Double = 1e-4) = math.abs(a - b) < eps

  test("jaro known vectors") {
    assert(approx(jaro("MARTHA", "MARHTA"), 0.944444))
    assert(approx(jaro("DIXON", "DICKSONX"), 0.766667))
    assert(approx(jaro("JELLYFISH", "SMELLYFISH"), 0.896296))
    assert(jaro("abc", "abc") == 1.0)
    assert(jaro("abc", "xyz") == 0.0)
    assert(jaro("", "") == 1.0)
    assert(jaro("a", "") == 0.0)
  }

  test("jaroWinkler known vectors (standard 0.1 prefix scale)") {
    assert(approx(jaroWinkler("MARTHA", "MARHTA"), 0.961111))
    assert(approx(jaroWinkler("DIXON", "DICKSONX"), 0.813333))
    assert(approx(jaroWinkler("DWAYNE", "DUANE"), 0.84))
    assert(jaroWinkler("same", "same") == 1.0)
  }

  test("levenshtein and python-Levenshtein ratio") {
    assert(levenshtein("kitten", "sitting") == 3)
    assert(levenshtein("", "abc") == 3)
    // Levenshtein.ratio('kitten','sitting') = (13-5)/13 with sub cost 2
    assert(approx(levenshteinRatio("kitten", "sitting"), 8.0 / 13.0))
    assert(levenshteinRatio("abc", "abc") == 1.0)
    assert(levenshteinRatio("", "") == 1.0)
  }

  test("cosine") {
    assert(approx(cosine(Array(1f, 0f), Array(1f, 0f)), 1.0))
    assert(approx(cosine(Array(1f, 0f), Array(0f, 1f)), 0.0))
    assert(approx(cosine(Array(1f, 1f), Array(1f, 0f)), math.sqrt(0.5)))
  }
}
