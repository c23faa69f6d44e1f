package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg._
import graft.sources.TableIO

class KGPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val cfg = TranscriptGen.Config(nConvs = 60)

  private lazy val result = KGPipeline.run(spark, cfg)
  private lazy val goldM = TranscriptGen.goldMentions(spark, cfg)
  private lazy val goldT = TranscriptGen.goldTriples(spark, cfg)

  test("mention-level weighted F1 ≥ 0.95 (reference alignment semantics)") {
    val prf = Metrics.weightedPRF(Metrics.align(result.verified, goldM))
    info(s"mention P=${prf.precision} R=${prf.recall} F1=${prf.f1} support=${prf.support}")
    assert(prf.f1 >= 0.95, s"F1 ${prf.f1}")
    assert(prf.precision >= 0.95)
  }

  test("triple P/R ≥ 0.95 vs gold (north-rule gate)") {
    val prf = Metrics.triplePR(result.triples, goldT)
    info(s"triple P=${prf.precision} R=${prf.recall} gold=${prf.support}")
    assert(prf.precision >= 0.95, s"precision ${prf.precision}")
    assert(prf.recall >= 0.95, s"recall ${prf.recall}")
  }

  test("exact mentions link with confidence 1.0 and are accepted") {
    import spark.implicits._
    val exact = result.links.filter(_.mention == Lexicon.People(0)).collect()
    assert(exact.nonEmpty)
    assert(exact.forall(l => l.confidence == 1.0 && l.accepted))
    assert(exact.forall(_.entity_id == Lexicon.idByName(Lexicon.People(0))))
  }

  test("canonicalization merges duplicate catalogue entities to min id") {
    import spark.implicits._
    val dupIds = Lexicon.catalogue.filter(_.entity_id.endsWith("x")).map(_.entity_id).toSet
    assert(dupIds.nonEmpty)
    val canon = result.canonicalMap
      .filter(org.apache.spark.sql.functions.col("member").isin(dupIds.toSeq.map("e:" + _): _*))
      .collect()
    // every duplicate that appears in the link graph maps to its base id
    canon.foreach { row =>
      val member = row.getString(0).stripPrefix("e:")
      assert(row.getString(1) == member.stripSuffix("x"),
        s"$member → ${row.getString(1)}")
    }
  }

  test("few-shot pool lifts the full pipeline's triple recall under scorer noise") {
    // the end-to-end form of the grid result: same corpus, same gold,
    // the ONLY difference is the few-shot block in the prompts
    val noisy = TranscriptGen.Config(nConvs = 120, scorerNoisePerMille = 250)
    val turns = TranscriptGen.transcripts(spark, noisy)
    val gold = TranscriptGen.goldTriples(spark, noisy)
    val pool = FewShots.buildPool(turns, TranscriptGen.goldMentions(spark, noisy), 160)
    val zero = KGPipeline.run(spark, turns, noisy)
    val shot = KGPipeline.run(spark, turns, noisy, fewShotPool = pool, nbFewShots = 3)
    val prZero = Metrics.triplePR(zero.triples, gold)
    val prShot = Metrics.triplePR(shot.triples, gold)
    info(s"triple recall zero-shot=${prZero.recall} 3-shot=${prShot.recall}")
    assert(prShot.recall > prZero.recall,
      s"few-shot recall ${prShot.recall} must beat zero-shot ${prZero.recall}")
    assert(prShot.precision >= prZero.precision - 1e-9)
    zero.unpersistAll(); shot.unpersistAll()
  }

  test("pipeline output is identical under different parallelism of the input") {
    import spark.implicits._
    val turns2 = TranscriptGen.transcripts(spark, cfg).repartition(2)
    val turns13 = TranscriptGen.transcripts(spark, cfg).repartition(13)
    val t2 = KGPipeline.run(spark, turns2, cfg).triples.collect().toSet
    val t13 = KGPipeline.run(spark, turns13, cfg).triples.collect().toSet
    assert(t2 == t13)
    assert(t2.nonEmpty)
  }

  test("resumable triple sink: crash mid-write, resume, identical output") {
    val dir = SparkTestBase.scratchDir("graft-triples")
    val full = result.triples
    intercept[RuntimeException] {
      TableIO.writeTriples(full, dir, failAfterRanges = 2)
    }
    val partial = TableIO.readManifest(dir)
    assert(partial.size == 2, s"manifest after crash: $partial")
    // resume completes only the missing ranges
    val manifest = TableIO.writeTriples(full, dir)
    assert(manifest.size == TableIO.NRanges)
    // committed timestamps of the first two ranges unchanged (not rewritten)
    assert(partial.forall { case (r, e) => manifest(r).commitTs == e.commitTs })
    val back = TableIO.readTriples(spark, dir).collect().toSet
    assert(back == full.collect().toSet)
  }

  test("compaction: one file per partition, identical rows, manifest intact") {
    import graft.sources.TableIO
    val dir = java.nio.file.Files.createTempDirectory("triples_compact").toString
    // write with extra parallelism so partitions hold MANY small files
    val spread = result.triples.repartition(24)
    TableIO.writeTriples(spread, dir)
    val before = TableIO.readTriples(spark, dir).collect().toSet
    def parquetFiles(d: String) = {
      val root = java.nio.file.Paths.get(d)
      val files = java.nio.file.Files.walk(root).iterator()
      var perDir = Map.empty[String, Int]
      files.forEachRemaining { p =>
        if (p.toString.endsWith(".parquet"))
          perDir = perDir.updated(p.getParent.toString, perDir.getOrElse(p.getParent.toString, 0) + 1)
      }
      perDir
    }
    assert(parquetFiles(dir).values.exists(_ > 1), "fixture must start with small files")
    val manifestBefore = TableIO.readManifest(dir)
    TableIO.compactTriples(spark, dir)
    assert(parquetFiles(dir).values.forall(_ == 1), s"files per dir: ${parquetFiles(dir).values.max}")
    assert(TableIO.readTriples(spark, dir).collect().toSet == before)
    assert(TableIO.readManifest(dir).view.mapValues(_.rows).toMap ==
      manifestBefore.view.mapValues(_.rows).toMap)
    // resume after compaction is a no-op (manifest complete)
    val again = TableIO.writeTriples(result.triples, dir)
    assert(again.keySet == manifestBefore.keySet)
    assert(TableIO.readTriples(spark, dir).collect().toSet == before)
    // crash WINDOW between the two swap renames: src gone, data parked
    // in .range-<r>-old — the next compaction must restore and proceed
    val r0 = manifestBefore.keySet.min
    val src = java.nio.file.Paths.get(dir, s"range=$r0")
    val old = java.nio.file.Paths.get(dir, s".range-$r0-old")
    java.nio.file.Files.move(src, old)
    assert(!java.nio.file.Files.exists(src))
    TableIO.compactTriples(spark, dir)
    assert(java.nio.file.Files.exists(src) && !java.nio.file.Files.exists(old))
    assert(TableIO.readTriples(spark, dir).collect().toSet == before)
  }

  test("oversized prompts are dropped (counted, not extracted)") {
    import spark.implicits._
    val turns = TranscriptGen.transcripts(spark, cfg)
    val oversized = turns.filter(_.text.length > 10000).count()
    assert(oversized > 0)
    val prompts = Extraction.buildPrompts(turns)
    assert(prompts.filter(_.text.length > 10000).count() == 0)
  }
}
