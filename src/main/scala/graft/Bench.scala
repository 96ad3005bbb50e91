package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query executes against the `noop` sink — full result
  * materialization on executors with zero sink cost — so scan/projection
  * queries can't be satisfied by column-pruned shortcuts the way a bare
  * `.count()` could (VERDICT r1 §wrong-9).
  */
object Bench {
  /** 1-minute load average per hardware thread, sampled via the OS mx
    * bean. Recorded in BOTH output lines: five rounds of recorded
    * benches were contention-inflated (r3-r7, up to 1.9x — every
    * adjudication re-ran clean and watched the spikes vanish), so the
    * artifact now carries the evidence of its own validity — a
    * load_per_core well above ~1 at start means the numbers measure the
    * machine, not the engine. */
  private def loadPerCore(): Double = {
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val la = os.getSystemLoadAverage
    if (la < 0) -1.0 else la / Runtime.getRuntime.availableProcessors()
  }

  /** Self-defense against concurrent-load contamination (six rounds of
    * judges re-running benches clean was the project's most expensive
    * recurring toil): ON BY DEFAULT, poll until the 1-minute load per
    * core drops below [[IdleThreshold]], bounded by
    * SPARK_GRAFT_WAIT_IDLE_MAX_S (default 300 s), then proceed either
    * way. Opt out with SPARK_GRAFT_WAIT_IDLE=0. Returns whether the
    * machine was still contended at the end — recorded as
    * `"contended": true` in both output lines so a loaded run flags
    * itself even when the wait gave up: the artifact either measures an
    * idle machine or says it didn't. Threshold tightened 0.3 → 0.15 in
    * r11: BENCH_r10.json passed the 0.3 gate at load 0.24 yet still
    * measured ~1.2× above a truly idle run. */
  private val IdleThreshold = 0.15

  private def waitForIdle(): Boolean = {
    if (sys.env.get("SPARK_GRAFT_WAIT_IDLE").contains("0")) return false
    val deadline = System.nanoTime() +
      sys.env.getOrElse("SPARK_GRAFT_WAIT_IDLE_MAX_S", "300").toLong *
        1000L * 1000L * 1000L
    var load = loadPerCore()
    while (load >= IdleThreshold && System.nanoTime() < deadline) {
      System.err.println(f"[bench] load_per_core $load%.2f >= " +
        f"$IdleThreshold%.2f — waiting for the machine to go idle")
      Thread.sleep(15000)
      load = loadPerCore()
    }
    load >= IdleThreshold
  }

  /** Per-PASS contention accounting (r12: the start-of-run idle gate
    * let BENCH_r11.json ship 1.25× hot because load rose MID-run).
    * The 1-minute load average can't gate mid-run — it includes the
    * bench's own 32 threads — so each pass instead measures the
    * EXTERNAL per-core CPU utilization directly: whole-box busy
    * jiffies from /proc/stat minus this JVM's own process CPU time,
    * over the pass's wall time. A clean box shows the documented ~2
    * constant background cores (~0.06/core here); a concurrent sbt or
    * duckdb shows up immediately. */
  private final case class CpuSample(busyJiffies: Long, procNs: Long,
      wallNs: Long)

  private def procBusyJiffies(): Long = {
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1)
          .map(_.toLong)
        // user nice system idle iowait irq softirq steal — busy is
        // everything except idle(3) and iowait(4)
        f.zipWithIndex.collect {
          case (v, i) if i != 3 && i != 4 => v }.sum
      } finally src.close()
    } catch { case _: Throwable => -1L }
  }

  private def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  private def cpuSample(): CpuSample =
    CpuSample(procBusyJiffies(), processCpuNs(), System.nanoTime())

  /** External per-core utilization since `s0`, or -1 if unmeasurable.
    * USER_HZ is 100 on every Linux this runs on. */
  private def externalUtilSince(s0: CpuSample): Double = {
    val s1 = cpuSample()
    if (s0.busyJiffies < 0 || s1.busyJiffies < 0 ||
        s0.procNs < 0 || s1.procNs < 0) return -1.0
    val wallSec = (s1.wallNs - s0.wallNs) / 1e9
    if (wallSec <= 0) return -1.0
    val busySec = (s1.busyJiffies - s0.busyJiffies) / 100.0
    val procSec = (s1.procNs - s0.procNs) / 1e9
    math.max(0.0, (busySec - procSec) / wallSec /
      Runtime.getRuntime.availableProcessors())
  }

  /** External-load gate per pass: above this, the pass's numbers
    * measured the neighbours, not the engine. The clean-box floor is
    * ~0.06 (the constant background load); a concurrent single-thread
    * duckdb adds ~0.03; a concurrent sbt build adds 0.3+. */
  private val ExtLoadGate = 0.15

  /** Per-gate shuffle-write and spill accounting (r14, VERDICT r13
    * item 9): a stage-completion listener sums shuffle bytes written
    * and disk spill across every stage a gate ran — the two numbers
    * that predict 100 TB behavior (a shuffle-heavy gate is the one
    * whose exchange becomes the bottleneck at scale; ANY spill on
    * sf0.1 data means executor memory was the constraint already).
    * The listener bus is drained between gates so async events land
    * on the gate that caused them. */
  private final class StageBytes
      extends org.apache.spark.scheduler.SparkListener {
    private val shuffle = new java.util.concurrent.atomic.AtomicLong
    private val spill = new java.util.concurrent.atomic.AtomicLong
    // r15: GC time (Σ per-task jvmGCTime — overlapping tasks in one
    // local JVM share collections, so this is an ATTRIBUTION signal,
    // not an exact cost) and peak execution memory (max over stages of
    // the stage's summed task peaks) — the fields that pin the
    // documented in-suite vs standalone inflation (annotate_docs 44.6
    // vs 16.6 s at sf10) to heap pressure in numbers
    private val gc = new java.util.concurrent.atomic.AtomicLong
    private val peak = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
        : Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.diskBytesSpilled)
        gc.addAndGet(m.jvmGCTime)
        peak.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      }
    }
    def reset(): Unit =
      { shuffle.set(0L); spill.set(0L); gc.set(0L); peak.set(0L) }
    def snapshot: (Long, Long, Long, Long) =
      (shuffle.get(), spill.get(), gc.get(), peak.get())
  }

  def main(args: Array[String]): Unit = {
    // the detail line is machine-parsed JSON built with f-interpolators;
    // a comma-decimal default locale would emit invalid JSON — pin ROOT
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val contended = waitForIdle()
    val loadStart = loadPerCore()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay one-off JVM/codegen/scan-infra startup AND the
    // C2-compilation of the native hash/vector loops here, so the first
    // measured query of each family isn't charged steady-state-irrelevant
    // JIT cost (dedup_clusters ran 2.5x its steady-state time otherwise)
    spark.range(1 << 20).selectExpr("sum(id) s")
      .write.format("noop").mode("overwrite").save()
    locally {
      import org.apache.spark.sql.functions._
      import graft.functions.TextFunctions._
      import graft.functions.VectorFunctions._
      val warm = spark.range(2000).select(
        concat_ws(" ", (0 to 25).map(i =>
          conv(expr(s"id * $i % 997"), 10, 16)): _*).as("text"),
        transform(sequence(lit(1), lit(64)),
          i => (i + col("id")).cast("float")).as("v"))
      warm.select(
          minhashShingles(tokens(col("text")), 3, 12).as("ss"),
          simhash60(tokens(col("text"))).as("sh"),
          fingerprint(col("text")).as("fp"),
          langId(tokens(col("text"))).as("l"),
          l2Sq(col("v"), col("v")).as("d"),
          cosineSim(col("v"), col("v")).as("c"))
        .write.format("noop").mode("overwrite").save()
      // the MQL/VARIANT path is interpreted (HOF binding + variant_get):
      // its first ~100k rows run pre-C2 at ~10x steady-state cost, which
      // charged ~6s of pure JIT warmup to whichever MQL query ran first
      val mqlWarm = spark.range(200000).select(
        concat(lit("{\"k\": "), col("id") % 100,
          lit(", \"s\": \"v\"}")).as("props"))
      mqlWarm.filter(graft.filter.MqlFilter.toColumn(
          """{"$nor": [{"k": {"$lt": 30}}, {"k": {"$gte": 70}}],
            | "k": {"$not": {"$eq": 42}}, "s": {"$exists": true}}""".stripMargin,
          graft.filter.MqlFilter.JsonResolver(col("props"))))
        .write.format("noop").mode("overwrite").save()
      // vectorized parquet reader + shuffle agg machinery: a synthetic
      // scratch table (never the benchmark inputs — their IO stays cold),
      // written, scanned with a pushed filter, aggregated
      val pq = s"${System.getProperty("java.io.tmpdir")}/graft-bench-warm"
      spark.range(200000).select(col("id"),
          (col("id") % 97).as("k"), (col("id") * 31 % 1001).as("v"))
        .write.mode("overwrite").parquet(pq)
      spark.read.parquet(pq).filter(col("v") > 100)
        .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    // SPARK_GRAFT_MIN_OF=N (default 1): run the full suite N times and
    // keep each query's MINIMUM — the standard ambient-noise floor.
    // Caveat recorded in the output: session caches pay only in pass 1,
    // so a payer gate's min reflects its cache-warm cost; the
    // "cache_payers" map says which gate paid which cache so per-gate
    // numbers stay interpretable either way.
    val minOf = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_MIN_OF", "1").toInt)
    // SPARK_GRAFT_ONLY=a,b,c: benchmark a subset (scale probes, local
    // iteration). Unknown names are loud — a typo must not silently
    // shrink the run. Unset = the full registered suite (the driver).
    val names = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(list) =>
        val want = list.split(",").map(_.trim).filter(_.nonEmpty)
        val missing = want.filterNot(SparkEntry.queries.contains)
        require(missing.isEmpty,
          s"SPARK_GRAFT_ONLY names not registered: ${missing.mkString(",")}")
        want.toSeq.sorted.map(n => n -> SparkEntry.queries(n))
      case None => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    // SPARK_GRAFT_SKIP=a,b,c: run the suite MINUS named gates (scale
    // rungs where a gate is excluded BY GEOMETRY — e.g. geo_join's
    // fixed-plane density² output at the sf10 replica — with the
    // exclusion recorded in the JSON, never silent). Unknown names
    // are loud, same as ONLY.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val skipMissing = skip.filterNot(SparkEntry.queries.contains)
    require(skipMissing.isEmpty,
      s"SPARK_GRAFT_SKIP names not registered: ${skipMissing.mkString(",")}")
    val selected = names.filterNot { case (n, _) => skip(n) }
    // One pass = the full suite once, plus the pass's external-load
    // verdict. A query failure records (time-to-failure, ok=false) —
    // the min below only ever takes FAILED times when NO pass
    // succeeded, so a transient failure can't masquerade as the
    // fastest pass (it lands in the "failed" list instead).
    val stageBytes = new StageBytes
    spark.sparkContext.addSparkListener(stageBytes)
    // per-gate (shuffle write, disk spill) bytes — MAX across passes
    // (bytes are plan-determined; max also catches an AQE re-plan)
    val gateBytes =
      collection.mutable.Map.empty[String, (Long, Long)]
    // per-gate (sec, gc_ms, peak_bytes) from the fastest pass so far
    val gateGc =
      collection.mutable.Map.empty[String, (Double, Long, Long)]
    def runPass(pass: Int): (Seq[(String, Double, Boolean)], Double) = {
      val s0 = cpuSample()
      val res = selected.map { case (name, fn) =>
        graft.core.CachePayers.setCurrent(name)
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        stageBytes.reset()
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        val (sh, sp, gcMs, pk) = stageBytes.snapshot
        val (psh, psp) = gateBytes.getOrElse(name, (0L, 0L))
        gateBytes(name) = (math.max(psh, sh), math.max(psp, sp))
        // gc/peak are kept FROM THE MIN-TIME PASS — the pass whose
        // seconds the detail line reports, so the GC number explains
        // that exact measurement (a max-merge would pair a cold pass's
        // GC with a warm pass's time)
        if (!gateGc.get(name).exists(_._1 <= sec))
          gateGc(name) = (sec, gcMs, pk)
        System.err.println(f"[bench] $name $sec%.2fs (pass $pass)" +
          (if (ok) "" else " FAILED"))
        (name, sec, ok)
      }
      val ext = externalUtilSince(s0)
      System.err.println(f"[bench] pass $pass external load/core $ext%.3f" +
        (if (ext >= ExtLoadGate) " — CONTENDED" else ""))
      (res, ext)
    }
    val passes = collection.mutable.Buffer.empty[
      (Seq[(String, Double, Boolean)], Double)]
    (1 to minOf).foreach(p => passes += runPass(p))
    // every pass externally contended ⇒ the min is still hot — wait
    // for idle once and run ONE replacement pass before giving up
    if (passes.forall { case (_, e) => e >= ExtLoadGate } &&
        !sys.env.get("SPARK_GRAFT_PASS_RETRY").contains("0")) {
      System.err.println("[bench] every pass was externally contended" +
        " — waiting for idle and running one replacement pass")
      waitForIdle()
      passes += runPass(minOf + 1)
    }
    val contaminated =
      passes.forall { case (_, e) => e >= ExtLoadGate }
    graft.core.CachePayers.setCurrent(null)
    val byName: Map[String, Seq[(Double, Boolean)]] =
      passes.flatMap(_._1).groupBy(_._1).view
        .mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val results = selected.map { case (name, _) =>
      val runs = byName(name)
      val okRuns = runs.filter(_._2)
      if (okRuns.nonEmpty) (name, okRuns.map(_._1).min, true)
      else (name, runs.map(_._1).min, false)
    }
    val failed = results.collect { case (n, _, false) => n }
    // stdout contract: the per-query detail line (~4 KB at 78 queries)
    // goes FIRST; the LAST line is short so a tail-capture that truncates
    // long lines still parses it (r2/r3 driver records had parsed:null
    // from truncating the single long line). Both lines are complete,
    // self-sufficient JSON.
    val qs = results.map { case (k, v, _) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val payers = graft.core.CachePayers.snapshot.toSeq.sorted
      .map { case (c, g) => s""""$c":"$g"""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val loadEnd = loadPerCore()
    val load = f""""load_per_core_start":$loadStart%.2f,"load_per_core_end":$loadEnd%.2f""" +
      (if (contended) ""","contended":true""" else "") +
      (if (contaminated) ""","contaminated":true""" else "") +
      s""","pass_ext_load":${passes.map(p => f"${p._2}%.3f")
        .mkString("[", ",", "]")}""" +
      (if (failed.nonEmpty)
        s""","failed":${failed.map(n => s""""$n"""")
          .mkString("[", ",", "]")}"""
      else "") +
      (if (minOf > 1) s""","min_of":$minOf""" else "") +
      // pass_totals UNCONDITIONALLY (r19, VERDICT item 7): the driver's
      // tail capture keeps only the END of stdout, and the single-cold-
      // pass total is the contract's objective function — it must
      // survive in the short final line even when min_of is 1
      s""","pass_totals":${
        passes.map { case (p, _) => f"${p.map(_._2).sum}%.1f" }
          .mkString("[", ",", "]")}""" +
      (if (skip.nonEmpty)
        s""","skipped":${skip.toSeq.sorted.map(n => s""""$n"""")
          .mkString("[", ",", "]")}"""
      else "")
    // shuffle/spill detail: gates with nonzero shuffle write, in MB
    // (1 decimal); spill map lists ONLY spilling gates — any entry at
    // these SFs is a memory-pressure flag worth reading
    val shuffleMb = results.collect { case (n, _, _)
        if gateBytes.get(n).exists(_._1 > 0) =>
      f""""$n":${gateBytes(n)._1 / 1048576.0}%.1f"""
    }.mkString("{", ",", "}")
    val spillMb = results.collect { case (n, _, _)
        if gateBytes.get(n).exists(_._2 > 0) =>
      f""""$n":${gateBytes(n)._2 / 1048576.0}%.1f"""
    }.mkString("{", ",", "}")
    // gc_ms / peak_mb (min-time pass) list only gates past the flag
    // thresholds — GC over 100 ms or peak execution memory over 256 MB
    // is worth a reader's attention; below that it's line noise at
    // 350 gates
    val gcMs = results.collect { case (n, _, _)
        if gateGc.get(n).exists(_._2 >= 100L) =>
      s""""$n":${gateGc(n)._2}"""
    }.mkString("{", ",", "}")
    val peakMb = results.collect { case (n, _, _)
        if gateGc.get(n).exists(_._3 >= 256L * 1048576) =>
      f""""$n":${gateGc(n)._3 / 1048576.0}%.0f"""
    }.mkString("{", ",", "}")
    // gc_top (r19, VERDICT item 7): the 8 worst per-gate GC numbers ride
    // the SHORT final line — the r18 failure class (multi-second GC
    // stalls on a handful of gates) self-diagnoses even when the tail
    // capture truncates the full detail line's gc_ms map
    val gcTop = gateGc.toSeq.sortBy { case (n, (_, g, _)) => (-g, n) }
      .take(8).map { case (n, (_, g, _)) => s""""$n":$g""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"detail","unit":"sec","queries":$qs,"cache_payers":$payers,"shuffle_mb":$shuffleMb,"spill_mb":$spillMb,"gc_ms":$gcMs,"peak_mb":$peakMb,"sf":"$sfDir",$load}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"sf":"$sfDir","gc_top":$gcTop,$load}""")
    spark.stop()
  }
}
