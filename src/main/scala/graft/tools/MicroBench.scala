package graft.tools
import graft.kg._
object MicroBench {
  def work(convLo: Long, convHi: Long, cfg: TranscriptGen.Config): Long = {
    val m = Scorer.newMatcher()
    var acc = 0L
    var c = convLo
    while (c < convHi) {
      var t = 0
      val n = TranscriptGen.turnsFor(c, cfg)
      while (t < n) {
        val g = TranscriptGen.genTurn(c, t, cfg)
        if (g.turn.text.nonEmpty && !g.turn.text.contains("{")) {
          val resp = Scorer.mentionResponse(m, g.turn.conv_id, t, g.turn.text, cfg)
          acc += graft.functions.Parsers.parseTupleList(resp, Extraction.MentionTags).length
        }
        t += 1
      }
      c += 1
    }
    acc
  }
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val nConvs = args(1).toLong
    val cfg = TranscriptGen.Config(nConvs = nConvs)
    work(0, 2000, cfg) // warmup
    val t0 = System.nanoTime()
    // balanced ranges covering ALL of nConvs (a floor-division chunk
    // dropped nConvs % threads convs while still dividing by nConvs,
    // overstating convs/sec whenever nConvs wasn't a thread multiple)
    val ts = (0 until threads).map { i =>
      val from = i * nConvs / threads
      val until = (i + 1) * nConvs / threads
      val th = new Thread(() => { work(from, until, cfg): Unit })
      th.start(); th
    }
    ts.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"threads=$threads convs=$nConvs wall=$wall%.2f s convs/sec=${nConvs / wall}%.0f")
  }
}
