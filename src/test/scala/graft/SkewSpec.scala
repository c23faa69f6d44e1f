package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.kg._

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("saltedCount equals plain count on the hot-entity mention stream") {
    import spark.implicits._
    val cfg = TranscriptGen.Config(nConvs = 100)
    // the generator's hot entity makes ~25% of person mentions one key
    val mentions = TranscriptGen.goldMentions(spark, cfg).toDF().cache()
    val plain = mentions.groupBy("mention").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(mentions, "mention", salt = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // the skew is real: hot key dominates
    val hot = plain.filter(_._1.startsWith("Alice J")).values.sum
    assert(hot.toDouble / plain.values.sum > 0.05, s"hot share ${hot.toDouble / plain.values.sum}")
    mentions.unpersist()
  }

  test("saltedJoin equals plain inner join, spreads the hot key") {
    import spark.implicits._
    val cfg = TranscriptGen.Config(nConvs = 60)
    val mentions = TranscriptGen.goldMentions(spark, cfg).toDF()
    val dim = Lexicon.catalogue.map(e => (e.display_name, e.entity_id))
      .toDF("mention", "entity_id")
    val plain = mentions.join(dim, "mention")
      .select("mention", "turn_idx", "entity_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedJoin(mentions, dim, "mention", salt = 8)
      .select("mention", "turn_idx", "entity_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
