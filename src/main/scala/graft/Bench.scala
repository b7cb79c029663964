package graft
import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Benchmark main: runs every [[SparkEntry.queries]] entry on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Each query runs four
  * times — the first warms the JVM/codegen caches, the best of the next
  * three is reported (a single GC pause or page-cache miss otherwise
  * inflates one query by 5-10x) — and failures are recorded per query
  * instead of masquerading as fast timings (VERDICT r1 item 9). All
  * post-warm runs are also emitted verbatim under `"runs"` so readers
  * comparing against rounds measured under a different protocol (single
  * post-warm run through round 3; best-of-2 through round 10) can
  * reconstruct either statistic.
  *
  * Self-diagnosis (VERDICT r10 item 1): rounds 7 and 10 both showed
  * uniform 1.1-1.9x slowdowns on byte-identical code, attributed to a
  * loaded box — but "attributed" was an inference, not a measurement.
  * The JSON now carries the evidence to settle that per run:
  *   - "load": /proc/loadavg 1-min samples at start and end of the whole
  *     bench, plus the max sampled between queries. A loaded box shows
  *     load >> allotted cpus.
  *   - "gc": cumulative JVM GC count/time and peak heap at the end.
  *   - per-query "gc_ms": GC time (ms) that elapsed DURING each timed
  *     run, parallel to "runs". An outlier whose gc_ms ≈ its wall time
  *     is a heap artifact of the 130-query shared JVM, not a plan
  *     regression.
  *
  * Timed action (VERDICT r11 item 1): `queryExecution.toRdd.count()`,
  * not `df.count()`. A DataFrame count lets Catalyst prune every column
  * the count doesn't need, so projection-only queries (decode, redact,
  * langid) were under-measured — the expression being benchmarked was
  * optimized out of the counted plan. Iterating the physical plan's
  * InternalRows forces every output column to be computed while still
  * keeping the rows on the executors (no driver collect).
  *
  * Evidence chain (VERDICT r11 item 2): the full JSON line is also
  * written to a file so the round's per-query evidence survives even
  * when the driver's stdout capture truncates the tail. Default path
  * is TIMESTAMPED (`bench_runs/BENCH_<utc>.json`) — the old
  * always-overwrite-`BENCH_full_latest.json` default let one
  * contaminated run clobber the quiet-box evidence in the working
  * tree (VERDICT r15 #8); promoting a run to `BENCH_full_latest.json`
  * is now an explicit `SPARK_GRAFT_BENCH_OUT` opt-in.
  *
  * Ambient-load guard (VERDICT r15 #3): the r15 driver bench ran at
  * box load 20.6/32 cpus and recorded meaningless broad "regressions".
  * The JSON now GATES on that evidence instead of just carrying it:
  * `ambient_contaminated` is true when CO-TENANT cpu — total busy
  * jiffies from /proc/stat minus this JVM's own from /proc/self/stat,
  * sampled per inter-query interval — exceeds cpus/4 cores in any
  * interval. Raw 1-min loadavg CANNOT be the gate: the bench's own
  * local[32] stages push loadavg past any useful threshold on a
  * perfectly quiet box (the first r16 full run self-flagged at
  * loadMax 10.9 with zero co-tenants), so loadavg rides along as
  * context ("load") while the verdict comes from the self-subtracted
  * measure ("ambient"). Readers must discard contaminated totals
  * rather than read them as regressions.
  * Per-query sample hygiene: after the timed reps, any sample whose
  * wall time exceeds 3x the query's own sample median earns the query
  * ONE extra rep (the spike is measured-around, and the `runs` array
  * keeps all samples so the retry is visible under `retried`).
  *
  * Rep-trend gate (ADVICE r17): interval-sampled ambient cpu missed
  * the r17 contamination pattern — queries degrading monotonically
  * ACROSS their own reps as box load ramped. The JSON now also
  * carries `trend` (queries whose last original rep ran past 2x the
  * first with > 1 s absolute growth) and flags `trend_contaminated`
  * when >= 5 queries degrade that way in one run; readers discard a
  * flagged run exactly as they do an ambient-contaminated one.
  *
  * I/O-ambient + cross-run gates (VERDICT r19 #1): the official r19
  * artifact recorded 212 s where three same-day runs at the same HEAD
  * read 140-155 s — an external DISK hog, invisible to the CPU gate
  * because iowait is excluded from busy jiffies by design, and under
  * the trend gate's bar at 4 degrading queries. Two more channels now
  * close that hole: `ambient_io` samples whole-box iowait cores per
  * inter-query interval (own threshold cpus/8 — iowait has no
  * per-process attribution, but this bench's own local reads keep it
  * near zero), and `crossrun` compares every query's min rep against
  * the last committed clean run (`bench_runs/BENCH_REFERENCE.json`,
  * override SPARK_GRAFT_BENCH_REF) — the at-a-glance check that
  * would have caught the r19 artifact (10+ queries at 3-6x) while
  * letting genuine single-query code regressions through to the
  * trend analysis.
  *
  * Self-healing splice (VERDICT r20 #2, round 22): queries the
  * crossrun gate flags are re-run once after the sweep and the extra
  * sample spliced into their runs — a transient co-tenant spike
  * re-measures fast and un-flags, a genuine regression re-measures
  * slow and stays. `crossrun.respliced` lists them; the contamination
  * trip is >= 3 still-degraded-after-resplice (was >= 6, which let
  * three consecutive official boards ship with known-spiked queries).
  */
object Bench {
  private def loadAvg1m(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** (total busy jiffies across all cpus, this process's jiffies,
    * total IOWAIT jiffies).
    * Busy = /proc/stat cpu line minus idle+iowait; self = utime+stime
    * from /proc/self/stat (proc(5) fields 14-15 — they aggregate ALL
    * threads of the process, which under `run / fork := true` is
    * exactly this bench plus its in-JVM local[n] executors). The
    * difference per wall interval is CO-TENANT cpu, the thing the
    * contamination gate actually cares about. Iowait (field 4) rides
    * as a THIRD channel (VERDICT r19 #1): a co-tenant DISK hog is
    * invisible to the busy measure by construction — cores starved on
    * I/O read as idle — yet it is exactly what inflated the official
    * r19 artifact 3-6x on I/O-heavy queries. Iowait cannot be
    * self-subtracted (the kernel attributes it to no process), so its
    * gate has its own, looser threshold: this bench's own parquet
    * reads on a local disk with a warm page cache keep iowait near
    * zero, while an external hog pushes whole cores into it. Returns
    * (-1, -1, -1) when /proc is unreadable (non-Linux), which
    * disables the gate.
    */
  private def cpuTicks(): (Long, Long, Long) =
    try {
      val stat = scala.io.Source.fromFile("/proc/stat")
      val cpu = try stat.getLines().next() finally stat.close()
      val f = cpu.trim.split("\\s+").drop(1).map(_.toLong)
      // busy = user nice system irq softirq steal (indices 0-2, 5-7).
      // Skip idle (3) and iowait (4); ALSO skip guest/guest_nice (8-9)
      // — proc(5): the kernel already folds guest time into user/nice,
      // so summing them would double-count VM load and overstate the
      // co-tenant measure ~2x (round-16 review). steal stays in: cpu
      // a hypervisor co-tenant takes from us is exactly what the gate
      // is for.
      val busy = f.zipWithIndex.collect {
        case (v, i) if i <= 2 || (i >= 5 && i <= 7) => v }.sum
      val iowait = if (f.length > 4) f(4) else 0L
      val self = scala.io.Source.fromFile("/proc/self/stat")
      val s = try self.mkString finally self.close()
      // comm (field 2) may contain spaces — parse past the closing ')'
      val rest = s.substring(s.lastIndexOf(')') + 2).split("\\s+")
      // rest(0) is field 3 (state); utime/stime are fields 14/15
      (busy, rest(11).toLong + rest(12).toLong, iowait)
    } catch { case _: Throwable => (-1L, -1L, -1L) }

  private def gcTotals(): (Long, Long) = {
    val beans = ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount.max(0L)).sum,
     beans.map(_.getCollectionTime.max(0L)).sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Dev-only probe knob (VERDICT r11 item 5): initial shuffle
    // partition count for AQE-coalescing-vs-pinned comparisons at
    // larger SFs. The driver never sets it, so its benches keep the
    // one-partition-per-core default.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkBoot.session(cpus, Some(shufflePartitions))
    val loadStart = loadAvg1m()
    var loadMax = loadStart
    // Co-tenant cpu per inter-query interval (see the class doc): the
    // gate's input. Jiffy scale comes from the kernel itself —
    // `getconf CLK_TCK` (ADVICE r16: the old hardcoded 100 USER_HZ
    // mis-scales the contamination gate on kernels built with a
    // different tick); 100 stays as the fallback when the probe
    // fails (non-Linux, no getconf). Sub-0.5 s intervals fold into
    // the next sample rather than divide jiffy granularity by a
    // near-zero wall.
    val clkTck: Double =
      try {
        val p = new ProcessBuilder("getconf", "CLK_TCK").start()
        val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
        p.waitFor()
        val v = out.toDouble
        require(v > 0)
        v
      } catch { case _: Throwable => 100.0 }
    var ambBase = (System.nanoTime(), cpuTicks())
    var ambMaxCores = 0.0
    var ioMaxCores = 0.0
    def sampleAmbient(): Unit = {
      val now = System.nanoTime()
      val dtSec = (now - ambBase._1) / 1e9
      if (dtSec >= 0.5) {
        val (b0, s0, w0) = ambBase._2
        val t1 = cpuTicks()
        val (b1, s1, w1) = t1
        if (b0 >= 0L && b1 >= 0L) {
          val ambient = math.max(0L, (b1 - b0) - (s1 - s0))
          ambMaxCores = math.max(ambMaxCores, ambient / clkTck / dtSec)
          // whole-box iowait cores over the interval — the disk-hog
          // channel the CPU gate is blind to (VERDICT r19 #1)
          ioMaxCores = math.max(ioMaxCores,
            math.max(0L, w1 - w0) / clkTck / dtSec)
        }
        ambBase = (now, t1)
      }
    }
    // One timed run: wall seconds plus the GC milliseconds that elapsed
    // inside it, so a slow sample carries its own explanation.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, (Double, Long)] = {
      val (_, gcMs0) = gcTotals()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val (_, gcMs1) = gcTotals()
        Right((dt, gcMs1 - gcMs0))
      } catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(120)) }
    }
    // Dev-only: SPARK_GRAFT_ONLY=q_a,q_b restricts the run; the driver
    // never sets it, so its benches always cover every query.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    // A zero or negative rep count would make every warm-successful query
    // report as error "?" (no timed samples), so refuse it fast (ADVICE r11).
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption)
      .map { r => require(r > 0, s"SPARK_GRAFT_REPS must be > 0, got $r"); r }
      .getOrElse(3)
    val results
        : Seq[(String, Either[String, (Seq[(Double, Long)], Boolean)])] =
      selected.toSeq.sortBy(_._1).map {
        case (name, fn) =>
          loadMax = math.max(loadMax, loadAvg1m())
          sampleAmbient()
          // Queries that cache intermediates would otherwise accumulate
          // heap across the whole 135-query run (one r13 sample carried
          // a 22 s GC pause under that coupling) — each query starts
          // against an empty cache it must populate itself.
          // SPARK_GRAFT_NO_CLEARCACHE is a dev-only diagnostic knob
          // (VERDICT r14 item 4) restoring the pre-r14 accumulation
          // behavior so the bare-JVM pathology hypothesis can be tested
          // under its original conditions; the driver never sets it.
          if (!sys.env.contains("SPARK_GRAFT_NO_CLEARCACHE"))
            spark.catalog.clearCache()
          val warm = once(fn)
          name -> (warm match {
            case Left(m) => Left(m)
            case Right(_) =>
              val timed = Seq.fill(reps)(once(fn))
              val oks = timed.collect { case Right(t) => t }
              if (oks.nonEmpty) {
                // one retry when a sample is a >3x outlier vs the
                // query's own sample median: a transient co-tenant or
                // GC spike gets measured around, not reported
                val walls = oks.map(_._1).sorted
                // TRUE median (round-16 review): walls(size/2) is the
                // upper-middle for even sizes — with 2 samples that
                // makes the trigger "max > 3*max", unsatisfiable, and
                // for size 4 it suppresses retries a slow top half
                // should have triggered
                val median =
                  if (walls.size % 2 == 1) walls(walls.size / 2)
                  else (walls(walls.size / 2 - 1) +
                    walls(walls.size / 2)) / 2
                if (walls.last > 3 * median)
                  Right((oks ++ once(fn).toSeq, true))
                else Right((oks, false))
              }
              else Left(timed.collectFirst { case Left(m) => m }.getOrElse("?"))
          })
      }
    def jq(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    // Cross-run reference (VERDICT r19 #1), parsed BEFORE the summary:
    // the self-healing splice below needs it. Reference must be at the
    // SAME scale factor: a dev run at sf0.01 against the committed
    // sf0.1 reference must not flag (or silently pass) — the gate
    // disables itself and says why.
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF",
      "bench_runs/BENCH_REFERENCE.json")
    val refParsed: Option[(Map[String, Double], String)] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(refPath)), "UTF-8")
        val refSf = """"sf"\s*:\s*"([^"]*)"""".r
          .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
        """"queries"\s*:\s*\{([^}]*)\}""".r
          .findFirstMatchIn(txt).map(_.group(1))
          .map(_.split(",").iterator.map { kv =>
            val Array(k, v) = kv.split(":", 2)
            k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
          }.toMap -> refSf)
      } catch { case _: Throwable => None }
    val refTimes = refParsed.collect {
      case (m, refSf) if refSf == sfDir => m
    }
    def degradedVs(times: Map[String, Double]): Seq[(String, Double)] =
      refTimes match {
        case None => Seq.empty
        case Some(ref) =>
          times.toSeq.flatMap { case (k, now) =>
            ref.get(k).collect {
              case r if r > 0 && now > 2.5 * r && now - r > 1.0 =>
                k -> math.rint(now / r * 100) / 100
            }
          }.sortBy(-_._2)
      }
    // Self-healing official stamp (VERDICT r20 #2): for three rounds
    // running the artifact named BENCH_r<N>.json shipped with a few
    // known-spiked queries — transient co-tenant bursts land on 3-5
    // queries, under the old >= 6 systematic-contamination bar, so the
    // board was stamped official while cleaner full runs sat in
    // bench_runs. Heal instead of ship: re-run exactly the flagged
    // queries once after the sweep and splice the extra sample into
    // their runs (min picks it up iff it is faster). A transient spike
    // re-measures fast and un-flags; a genuine regression re-measures
    // slow and stays flagged. Post-splice the contamination trip drops
    // to >= 3 — surviving degradation is confirmed by re-measurement,
    // not noise to wave through.
    val firstTimes = results.collect {
      case (n, Right((ts, _))) => n -> ts.map(_._1).min }.toMap
    val healed = degradedVs(firstTimes).map(_._1)
    val resultsHealed = if (healed.isEmpty) results else {
      val healSet = healed.toSet
      results.map {
        case (n, Right((ts, retr))) if healSet(n) =>
          if (!sys.env.contains("SPARK_GRAFT_NO_CLEARCACHE"))
            spark.catalog.clearCache()
          sampleAmbient()
          once(selected(n)) match {
            case Right(t) => n -> Right((ts :+ t, retr))
            case Left(_)  => n -> Right((ts, retr))
          }
        case other => other
      }
    }
    val ok = resultsHealed.collect { case (n, Right((ts, _))) => n -> ts }
    val retried = resultsHealed.collect { case (n, Right((_, true))) => n }
    val errs = resultsHealed.collect { case (n, Left(m)) => n -> m }
    val qs = ok.map { case (k, ts) => jq(k) + ":" + ts.map(_._1).min }
      .mkString("{", ",", "}")
    val rs = ok.map { case (k, ts) =>
      jq(k) + ":" + ts.map(_._1).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val gs = ok.map { case (k, ts) =>
      jq(k) + ":" + ts.map(_._2).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val es = errs.map { case (k, m) => jq(k) + ":" + jq(m) }
      .mkString("{", ",", "}")
    val total = ok.map(_._2.map(_._1).min).sum
    sampleAmbient() // close the last inter-query interval
    val loadEnd = loadAvg1m()
    val (gcCount, gcMs) = gcTotals()
    val heapMb = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
    val load = s"""{"start":$loadStart,"end":$loadEnd,"max":$loadMax}"""
    val gc = s"""{"count":$gcCount,"time_ms":$gcMs,"heap_used_mb":${heapMb.getUsed / 1048576},"heap_max_mb":${heapMb.getMax / 1048576}}"""
    // the official number must not be poisonable by box co-tenants:
    // a run with co-tenant cpu past cpus/4 cores in any inter-query
    // interval is marked contaminated so readers discard it instead of
    // reading phantom regressions (r15's driver artifact: load 20.6,
    // 206 s vs the quiet box's 129 s on identical code). The verdict
    // comes from the SELF-SUBTRACTED jiffy measure, not loadavg — the
    // bench's own local[n] stages legitimately saturate loadavg.
    val loadThreshold = cpus.toDouble / 4
    val contaminated = ambMaxCores > loadThreshold
    val amb = s"""{"max_cores":${math.rint(ambMaxCores * 100) / 100},"threshold_cores":$loadThreshold,"clk_tck":$clkTck}"""
    // I/O-ambient gate (VERDICT r19 #1): the CPU gate excludes iowait
    // from "busy" BY DESIGN (a starved core is idle), so an external
    // disk hog that inflated I/O-heavy queries 3-6x read as 6.06
    // ambient cores — under threshold. Whole-box iowait has no
    // per-process attribution, so the threshold is absolute: this
    // bench's own reads on local disk + warm page cache keep interval
    // iowait under ~1 core; cpus/8 (4.0 at 32) flags only a sustained
    // external drain.
    val ioThreshold = cpus.toDouble / 8
    val ioContaminated = ioMaxCores > ioThreshold
    val ambIo = s"""{"max_cores":${math.rint(ioMaxCores * 100) / 100},"threshold_cores":$ioThreshold}"""
    // Cross-run per-query ratio gate (VERDICT r19 #1), evaluated on
    // the POST-SPLICE times: compare each query's min rep against the
    // last committed clean run. With the healing pass above, anything
    // still degraded here was confirmed by an immediate re-measure, so
    // >= 3 such queries flags the run (was >= 6 when a single spike
    // could not be told from a regression).
    val nowTimes = ok.map { case (k, ts) => k -> ts.map(_._1).min }.toMap
    val crossDegraded: Seq[(String, Double)] = degradedVs(nowTimes)
    val crossContaminated = crossDegraded.size >= 3
    val crossrun = refParsed match {
      case None => "null"
      case Some((_, refSf)) if refSf != sfDir =>
        s"""{"ref":${jq(refPath)},"sf_mismatch":true,"ref_sf":${jq(refSf)}}"""
      case Some((ref, _)) =>
        val nCmp = nowTimes.keysIterator.count(ref.contains)
        val worst = crossDegraded.take(10)
          .map { case (k, r) => s"[${jq(k)},$r]" }
          .mkString("[", ",", "]")
        val resp = healed.map(jq).mkString("[", ",", "]")
        s"""{"ref":${jq(refPath)},"n_compared":$nCmp,"n_degraded":${crossDegraded.size},"respliced":$resp,"worst":$worst}"""
    }
    val rt = retried.map(jq).mkString("[", ",", "]")
    // Rep-trend gate (ADVICE r17): the r17 run degraded MONOTONICALLY
    // within single queries (2.6s -> 35.3s -> 30.1s across reps, load
    // climbing the whole run) while the ambient gate still passed —
    // in-run co-tenant ramp or heap buildup that interval sampling
    // under-detects. A query "degrades" when its LAST original rep
    // (the one-shot outlier retry excluded — that sample measures
    // around a spike, not the trend) runs past 2x its first AND grew
    // by > 1 s absolute (sub-second jitter must not count). A handful
    // is noise; >= 5 of them in one run is a systematic environment
    // drift, so the run is flagged for readers to discard, same as
    // ambient contamination.
    val degrading = results.collect {
      case (n, Right((ts, wasRetried))) =>
        val base = if (wasRetried) ts.dropRight(1) else ts
        (n, base.map(_._1))
    }.collect {
      case (n, walls)
          if walls.size >= 2 && walls.last > 2 * walls.head &&
            walls.last - walls.head > 1.0 => n
    }
    val trendContaminated = degrading.size >= 5
    val trend = s"""{"n_degrading":${degrading.size},"queries":${degrading.take(10).map(jq).mkString("[", ",", "]")}}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$rs,"gc_ms":$gs,"errors":$es,"n_ok":${ok.size},"n_err":${errs.size},"reps":$reps,"retried":$rt,"load":$load,"ambient":$amb,"ambient_contaminated":$contaminated,"ambient_io":$ambIo,"io_contaminated":$ioContaminated,"crossrun":$crossrun,"crossrun_contaminated":$crossContaminated,"trend":$trend,"trend_contaminated":$trendContaminated,"gc":$gc,"sf":"$sfDir"}"""
    println(line)
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT").getOrElse {
      val ts = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd-HHmmss").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())
      s"bench_runs/BENCH_$ts.json"
    }
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
