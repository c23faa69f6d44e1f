package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.Canonicalize

class CanonicalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("local union-find and distributed hash-min agree on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vertices = (0 until 300).map(i => f"v$i%03d")
    val edges = (0 until 350).map { _ =>
      (vertices(rnd.nextInt(vertices.length)), vertices(rnd.nextInt(vertices.length)))
    }.filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    val local = Canonicalize.connectedComponents(df)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val dist = Canonicalize.connectedComponents(df, forceDistributed = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(local == dist)
    assert(local.nonEmpty)
    // component label is the min member
    local.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keys.min == comp)
    }
  }

  test("chain graph: long diameter converges") {
    import spark.implicits._
    val chain = (0 until 40).map(i => (f"c$i%02d", f"c${i + 1}%02d")).toDF("src", "dst")
    val local = Canonicalize.connectedComponents(chain)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(local.values.toSet == Set("c00"))
    val dist = Canonicalize.connectedComponents(chain, forceDistributed = true, maxIter = 50)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dist == local)
  }

  test("normalizeName drops middle initials and punctuation") {
    assert(Canonicalize.normalizeName("Alice J. Johnson") == "alice johnson")
    assert(Canonicalize.normalizeName("ACME Industries") == "acme industries")
  }
}
