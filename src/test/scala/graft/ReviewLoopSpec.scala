package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg._

/** Round-trip gate for the human review loop (entityMatching.py
  * propose → Excel → process_excel_filled → accepted matchings):
  * proposals CSV sink → simulated reviewer decisions → read-back →
  * catalogue delta + human-confirmed links feeding canonicalization.
  */
class ReviewLoopSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("proposals → review CSV → decisions → catalogue delta round-trip") {
    import spark.implicits._
    val catalogue = Lexicon.catalogue.toArray
    val cfg = TranscriptGen.Config(nConvs = 60)
    val mentions = KGPipeline.run(spark, cfg).verified
    val values = EntityLinking.valuesToMatch(mentions)
    val props = EntityLinking.proposals(values, catalogue)

    val dir = java.nio.file.Files.createTempDirectory("review").toString
    EntityLinking.proposalsCsvSink(props, values, s"$dir/proposals")

    // the review tool reads the CSV back — header + all proposal rows
    val back = spark.read.option("header", "true").csv(s"$dir/proposals")
    assert(back.count() == props.count())
    assert(back.columns.toSet ==
      Set("mention", "rank", "entity_id", "entity_name", "jaro_score", "n_occurrences"))

    // simulate the reviewer: accept top-1 for most mentions, request a
    // NEW entity for mentions starting with 'Z', ignore the rest
    val top1 = props.filter(_.rank == 1).collect()
    val decisions = top1.flatMap { p =>
      if (p.mention.startsWith("Z"))
        Some(EntityLinking.ReviewDecision(p.mention, "", p.mention, "Personne"))
      else if (p.jaro_score > 0.8)
        Some(EntityLinking.ReviewDecision(p.mention, p.entity_id, p.entity_name, "Personne"))
      else None // ignored → no row, like the reference
    }.toSeq
    spark.createDataset(decisions).toDF()
      .select(org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.col("answer_id"),
        org.apache.spark.sql.functions.col("answer_name"),
        org.apache.spark.sql.functions.col("entity_type"))
      .write.mode("overwrite").option("header", "true").csv(s"$dir/filled")

    val parsed = EntityLinking.readReviewCsv(spark, s"$dir/filled")
    assert(parsed.count() == decisions.length)

    val (updated, links) = EntityLinking.applyReview(parsed, TranscriptGen.entities(spark))
    val newOnes = updated.collect().map(_.entity_id).toSet --
      TranscriptGen.entities(spark).collect().map(_.entity_id).toSet
    val expectedNew = decisions.filter(_.answer_id.isEmpty)
      .map(d => EntityLinking.newEntityId(d.answer_name)).toSet
    assert(newOnes == expectedNew) // catalogue delta = exactly the created entities
    assert(newOnes.forall(_.startsWith("N")))

    // every decision became a human-confirmed accepted link with the
    // resolved id; links feed canonicalization unchanged
    val lm = links.collect()
    assert(lm.length == decisions.length)
    assert(lm.forall(l => l.accepted && l.confidence == 1.0))
    val canon = Canonicalize.canonicalMap(links, updated)
    assert(canon.count() > 0)
    // a created entity resolves as its own canonical id (or its alias
    // component's min) — never dangles
    val canonMap = canon.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    decisions.filter(_.answer_id.isEmpty).foreach { d =>
      val id = EntityLinking.newEntityId(d.answer_name)
      assert(canonMap.contains("m:" + d.value))
    }
    // idempotent: applying the same review twice adds nothing new
    val (updated2, _) = EntityLinking.applyReview(parsed, updated)
    assert(updated2.count() == updated.count())
  }
}
