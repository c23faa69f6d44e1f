package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg._

class BlockedLinkingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("blocking-key candidate generation recalls the exact top-1 match") {
    import spark.implicits._
    val cat = Lexicon.catalogue
    // every surface form the corpus can produce for linkable entities
    val surfaces = Lexicon.surfaceForms.collect {
      case (s, _, tag) if tag == "PERSON" || tag == "ORG" => s
    }.distinct
    val values = surfaces.map(s => (s, 1L)).toDS()
    val exact = EntityLinking.proposals(values, cat.toArray)
      .filter(_.rank == 1).collect().map(p => p.mention -> p.entity_id).toMap
    val blocked = EntityLinking.proposalsBlocked(values, TranscriptGen.entities(spark))
      .filter(_.rank == 1).collect().map(p => p.mention -> p.entity_id).toMap
    val hits = exact.count { case (m, e) => blocked.get(m).contains(e) }
    val recall = hits.toDouble / exact.size
    info(s"blocked top-1 recall = $recall over ${exact.size} surfaces")
    assert(recall >= 0.95, s"recall $recall")
  }

  test("pipeline runs end-to-end under a non-default technique") {
    val cfg = TranscriptGen.Config(nConvs = 40)
    val disc = KGPipeline.run(spark, TranscriptGen.transcripts(spark, cfg), cfg)
    val filing = KGPipeline.run(spark, TranscriptGen.transcripts(spark, cfg), cfg,
      PromptTechniques.Filing)
    val a = disc.triples.collect().toSet
    val b = filing.triples.collect().toSet
    assert(a == b, s"extra=${(b -- a).take(3)} missing=${(a -- b).take(3)}")
    disc.unpersistAll(); filing.unpersistAll()
  }
}
