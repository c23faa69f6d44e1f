package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.kg.{TranscriptGen, Turn}
import graft.streaming.StreamingExtraction

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val cfg = TranscriptGen.Config(nConvs = 10)

  test("streaming extraction equals batch extraction on the same turns") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val turns = (0L until 10L).flatMap { c =>
      (0 until TranscriptGen.turnsFor(c, cfg)).map(t => TranscriptGen.genTurn(c, t, cfg).turn)
    }
    val stream = MemoryStream[Turn]
    stream.addData(turns)

    val mentions = StreamingExtraction.mentionStream(stream.toDS(), cfg)
    val q = mentions.writeStream
      .format("memory").queryName("stream_mentions")
      .outputMode("append")
      .trigger(Trigger.Once())
      .start()
    q.awaitTermination(60000)

    val streamed = spark.table("stream_mentions")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3))).toSet

    val batch = graft.kg.KGPipeline.run(spark, turns.toDS(), cfg)
      .verified.collect().map(m => (m.conv_id, m.turn_idx, m.mention, m.tag)).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("mapGroupsWithState accumulates per-conversation state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val allTurns = (0L until 6L).flatMap { c =>
      (0 until TranscriptGen.turnsFor(c, cfg)).map(t => TranscriptGen.genTurn(c, t, cfg).turn)
    }
    val (first, second) = allTurns.partition(_.turn_idx < 4)
    val stream = MemoryStream[Turn]
    val states = StreamingExtraction.conversationState(stream.toDS(), cfg)
    val q = states.writeStream
      .format("memory").queryName("conv_state")
      .outputMode("update")
      .start()
    stream.addData(first)
    q.processAllAvailable()
    stream.addData(second)
    q.processAllAvailable()
    q.stop()
    val finalStates = spark.table("conv_state")
      .groupBy("conv_id")
      .agg(org.apache.spark.sql.functions.max("n_mentions").as("n_mentions"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // cumulative counts must equal the batch pipeline's per-conv totals
    val batch = graft.kg.KGPipeline.run(spark, allTurns.toDS(), cfg)
      .verified.collect().groupBy(_.conv_id).view.mapValues(_.length.toLong).toMap
    batch.foreach { case (conv, n) =>
      assert(finalStates.get(conv).contains(n), s"$conv: ${finalStates.get(conv)} vs $n")
    }
  }

  test("windowed mention counts with watermark run on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val turns = (0L until 10L).flatMap { c =>
      (0 until TranscriptGen.turnsFor(c, cfg)).map(t => TranscriptGen.genTurn(c, t, cfg).turn)
    }
    val stream = MemoryStream[Turn]
    stream.addData(turns)
    val counts = StreamingExtraction.windowedMentionCounts(stream.toDS(), cfg)
    val q = counts.writeStream
      .format("memory").queryName("stream_counts")
      .outputMode("complete")
      .trigger(Trigger.Once())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("stream_counts").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("PERSON", "ORG", "GPE")))
    assert(rows.map(_.getLong(2)).sum > 0)
  }
}
