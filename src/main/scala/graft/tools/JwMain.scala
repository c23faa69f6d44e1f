package graft.tools

object JwMain {
  def main(a: Array[String]): Unit = {
    val s1 = "Supplier#000000319"
    val names = (0 until 15000).map(i => f"Customer#$i%09d").toArray
    // warm
    var x = 0.0
    for (_ <- 0 until 2; n <- names) x += graft.functions.StringSim.jaroWinkler(s1, n)
    val t0 = System.nanoTime()
    var i = 0
    while (i < 100) { var j = 0; while (j < names.length) { x += graft.functions.StringSim.jaroWinkler(s1, names(j)); j += 1 }; i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"1.5M jaroWinkler calls: $dt%.3f s  (${dt/1.5e6*1e9}%.0f ns/call)  checksum=$x%.1f")
  }
}
