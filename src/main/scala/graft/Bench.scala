package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A warm-up pass at
  * sf0.001 first exercises the codegen/JIT/parquet-reader paths so the
  * timed numbers measure throughput, not one-time JVM compilation (the
  * first cold query otherwise absorbs ~5 s of warm-up noise). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // "local[*]" is a valid master but a bare "*" is not valid JSON —
    // quote non-numeric values so the bench artifact always parses
    val cpusJson = cpus.toIntOption.map(_.toString).getOrElse("\"" + cpus + "\"")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        cpus.toIntOption.getOrElse(Runtime.getRuntime.availableProcessors).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Noop sink, not count(): under a bare count() Catalyst prunes every
    // unreferenced projection and drops sorts, so map-heavy queries would
    // measure little beyond the scan. The noop v2 sink consumes every row
    // with all output columns materialized.
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // Every run (warm-up included) starts cold: memoized pair stages and
    // per-query persists are dropped first, so no query is timed against
    // another query's (or its own first run's) warm cache — cross-query
    // cache reuse would otherwise understate real per-query cost.
    def clearState(): Unit = {
      graft.queries.LlmOps.clearPairCache()
      graft.operators.Dedup.releaseCaches()
      spark.catalog.clearCache()
    }

    // Local-iteration escape hatch, mirroring Verify's: GRAFT_ONLY=q1,q2
    // benches a subset. The driver never sets it.
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").toSet)
    // Sorted by name, not Map iteration order: the fuzzy_match_k2 (r12)
    // and sparse_cosine (r13) drift adjudications both traced in-suite
    // per-query movement to REGISTRY-ORDER CHURN — a query's slot (and
    // therefore how much JIT/codegen state precedes it) reshuffled every
    // time the registry grew. Name order pins each query's slot so
    // round-over-round comparisons see stable warm-up context; additions
    // still shift alphabetical neighbors, but only those. ONE binding
    // feeds both the warm-up and the timed loop so their orders can
    // never desynchronize.
    val picked = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq.sortBy(_._1)

    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      picked.foreach { case (_, fn) =>
        clearState()
        try exec(fn(spark, warmDir))
        catch { case _: Throwable => () }
      }
    }

    // Two timed cold runs per query. Headline = min (the standard
    // throughput estimator under external noise — wall-clock on this box
    // swings 2x under background load); both raw samples are emitted so a
    // one-off outlier is self-identifying without a re-run. A query that
    // throws is recorded LOUDLY (err field + errors count in the headline)
    // instead of benching as instant — a silent catch would let a broken
    // query masquerade as the fastest one.
    //
    // Process CPU time rides next to wall time: spread (max/min wall)
    // only catches noise that perturbs ONE of the two samples. Sustained
    // external load slows both samples equally — spread reads ~1.0 and
    // the flag is blind — but this process's CPU seconds stay roughly
    // flat while wall inflates, so a round-over-round wall jump with a
    // flat cpu number is load, not regression (the r7 driver run read
    // llm_clean_corpus at 19 s / spread 1.19 for exactly this reason).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None // non-HotSpot JVM: cpu fields emit as 0.0
    }

    // Hypervisor-steal sampling (/proc/stat cpu line, field 8 = steal
    // jiffies): the round-12 adjudication measured 5.2% steal by hand
    // from SCALING.md prose; emitting it INTO the artifact makes every
    // bench run self-adjudicating — a wall jump with flat cpu and
    // elevated steal is the host's fault, and benchdiff's steal gate
    // reads these fields directly. Sampled per query (around both cold
    // samples) and over the whole timed window. -1.0 = unmeasurable
    // (no /proc/stat — non-Linux), never silently 0.
    def procStat(): Option[(Long, Long, Long)] =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try {
          val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
          // user nice system idle iowait irq softirq steal [guest...] —
          // the denominator takes only the first 8 fields: Linux already
          // folds guest/guest_nice into user/nice, so including them
          // double-counts guest jiffies and understates steal exactly on
          // the virtualized hosts this sampling exists to adjudicate
          // (r13 advice). (steal, idle+iowait, total): the idle term
          // feeds the external-busy sampling below.
          if (f.length >= 8) Some((f(7), f(3) + f(4), f.take(8).sum)) else None
        } finally src.close()
      } catch { case _: Throwable => None }
    def stealBetween(a: Option[(Long, Long, Long)],
        b: Option[(Long, Long, Long)]): Double =
      (for ((s0, _, t0) <- a; (s1, _, t1) <- b if t1 > t0)
        yield (s1 - s0).toDouble * 100.0 / (t1 - t0).toDouble).getOrElse(-1.0)
    // External-busy fraction of the host over a window: busy jiffies
    // (total − idle − iowait − steal) minus THIS process's own cpu
    // converted to jiffies (USER_HZ = 100 — the universal Linux value;
    // a rare non-100 kernel only inflates the estimate, the
    // conservative direction), as a percent of all jiffies. This is the
    // signature starvation actually requires — someone ELSE using the
    // box — measured instead of inferred from parallelism alone:
    // driver-serial queries (a Lloyd fit, a stream coordinator) read
    // parallelism ~1 on a perfectly quiet host and must not trip the
    // load flag (r14: vector_pq_fp / dedup_embedding /
    // vector_ann_sql_streamed false-starved an artifact whose own
    // steal_pct was 0.28%). -1.0 = unmeasurable; without JMX the own-cpu
    // term is 0 and the estimate includes our own usage — conservative,
    // the flag keeps its old behavior when evidence is missing.
    def extBusyBetween(a: Option[(Long, Long, Long)],
        b: Option[(Long, Long, Long)], ownCpuSec: Double): Double =
      (for ((s0, i0, t0) <- a; (s1, i1, t1) <- b if t1 > t0) yield {
        val busy = (t1 - t0) - (i1 - i0) - (s1 - s0)
        math.max(0.0, (busy - ownCpuSec * 100.0) * 100.0 / (t1 - t0))
      }).getOrElse(-1.0)
    val benchStat0 = procStat()
    val results = picked.map { case (name, fn) =>
      var err: Option[String] = None
      val qStat0 = procStat()
      val samples = Seq.fill(2) {
        clearState()
        val c0 = osBean.map(_.getProcessCpuTime).getOrElse(0L)
        val t0 = System.nanoTime()
        try { exec(fn(spark, sfDir)) }
        catch { case e: Throwable =>
          err = Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = osBean.map(b => (b.getProcessCpuTime - c0) / 1e9).getOrElse(0.0)
        (wall, cpu)
      }
      val qStat1 = procStat()
      val qSteal = stealBetween(qStat0, qStat1)
      val qExt = extBusyBetween(qStat0, qStat1, samples.map(_._2).sum)
      (name, samples.map(_._1).min, samples.map(_._1), err, samples.map(_._2),
        qSteal, qExt)
    }
    val benchSteal = stealBetween(benchStat0, procStat())
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    def r3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _, _, _, _, _) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, _, s, _, _, _, _) =>
      "\"" + k + "\":" + s.map(r3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val cpuJson = results.map { case (k, _, _, _, c, _, _) =>
      "\"" + k + "\":" + c.map(r3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e), _, _, _) => "\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val nErr = results.count(_._4.isDefined)
    val total = results.map(_._2).sum
    // Per-query sample spread (max/min): the noise self-diagnostic. A
    // quiet host runs both cold samples within ~1.2x; spreads past 1.5x
    // mean external load perturbed the run, and per-query times should
    // be compared round-over-round only with that flag in hand (the r6
    // driver bench read 2-4x spreads and its "regressions" were load,
    // not code). n_noisy + max_spread ride the headline so the flag
    // survives the driver's stdout tail without opening the file.
    def spreadOf(s: Seq[Double]): Double =
      if (s.isEmpty || s.min <= 0) 1.0 else s.max / s.min
    val spreads = results.map { case (k, _, s, _, _, _, _) => (k, spreadOf(s)) }
    val spreadJson = spreads.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val nNoisy = spreads.count(_._2 > 1.5)
    val maxSpread = spreads.map(_._2).maxOption.getOrElse(1.0)
    // Self-adjudication: per-query parallelism = cpu/wall of the min-wall
    // sample. On a quiet cpus≫1 box a multi-second Spark query runs well
    // above 1.0; wall≈cpu (parallelism ~1) on a long query means this
    // process was starved by OTHER load — the exact signature the r8
    // judge computed by hand from q1_agg (18.5 s wall / 19.2 cpu-s on a
    // 32-cpu host). host_load_suspect trips when >=3 queries of >=2 s
    // wall sit at parallelism <= 1.3 with cpus >= 8: the artifact then
    // labels ITSELF untrustworthy for round-over-round comparison.
    // Known limitation: genuinely driver-serial work (a driver-side
    // Lloyd fit, a single merge task) also reads parallelism ~1, so the
    // flag is a coarse self-label, not proof — quiet-host runs of this
    // registry measure n_starved 0-1 against the >=3 trip wire, and a
    // flagged artifact should be adjudicated per query via its cpu
    // samples, exactly as benchdiff does.
    val par = results.map { case (k, _, walls, err, cpuS, _, ext) =>
      val i = walls.indexOf(walls.min)
      val p = if (walls(i) > 0 && cpuS(i) > 0) cpuS(i) / walls(i) else 0.0
      (k, walls(i), p, err.isDefined, ext)
    }
    val parJson = par.map { case (k, _, p, _, _) => "\"" + k + "\":" + r3(p) }
      .mkString("{", ",", "}")
    val nCpusInt = cpus.toIntOption.getOrElse(Runtime.getRuntime.availableProcessors)
    // Errored runs are excluded: a query that spins >=2 s serially before
    // throwing says nothing about host load, and repeated slow failures
    // must not mislabel a quiet-host artifact as load-suspect.
    // "Starved" additionally requires MEASURED external competition
    // (>= 25% of the box busy with other processes' work over the
    // query's own window — the `ext` field): parallelism ~1 alone also
    // describes genuinely driver-serial queries (a Lloyd fit, a stream
    // coordinator), which must not flag a quiet-host artifact (r14:
    // three such lines false-tripped a run whose steal_pct was 0.28%).
    // ext = -1 (unmeasurable) keeps the old parallelism-only behavior —
    // missing evidence stays conservative.
    val nStarved = par.count { case (_, w, p, erred, ext) =>
      !erred && w >= 2.0 && p > 0 && p <= 1.3 && (ext < 0 || ext >= 25.0) }
    val hostLoadSuspect = nCpusInt >= 8 && nStarved >= 3
    val stealJson = results.map { case (k, _, _, _, _, st, _) =>
      "\"" + k + "\":" + r3(st)
    }.mkString("{", ",", "}")
    val extJson = results.map { case (k, _, _, _, _, _, ex) =>
      "\"" + k + "\":" + r3(ex)
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"samples":$raw,"cpu":$cpuJson,"parallelism":$parJson,"steal":$stealJson,"ext":$extJson,"steal_pct":${r3(benchSteal)},"host_load_suspect":$hostLoadSuspect,"n_starved":$nStarved,"spread":$spreadJson,"n_noisy":$nNoisy,"max_spread":${r3(maxSpread)},"errors":$errs,"n_queries":${results.size},"n_errors":$nErr,"cpus":$cpusJson,"sf":"$sfDir"}"""
    // The driver keeps only the last ~2000 chars of stdout: the full JSON
    // (queries + samples + errors) goes to a file, and the LAST printed
    // line is guaranteed to fit the tail — with the per-query map if it
    // fits, totals-only with a file pointer otherwise. Either way the
    // tail parses.
    val fullPath = "BENCH_FULL.json"
    try {
      val w = new java.io.PrintWriter(fullPath, "UTF-8")
      try w.println(full) finally w.close()
    } catch { case _: Throwable => () }
    val withQueries =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"n_queries":${results.size},"n_errors":$nErr,"n_noisy":$nNoisy,"max_spread":${r3(maxSpread)},"steal_pct":${r3(benchSteal)},"host_load_suspect":$hostLoadSuspect,"n_starved":$nStarved,"cpus":$cpusJson,"full":"$fullPath","sf":"$sfDir"}"""
    val totalsOnly =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"n_errors":$nErr,"n_noisy":$nNoisy,"max_spread":${r3(maxSpread)},"steal_pct":${r3(benchSteal)},"host_load_suspect":$hostLoadSuspect,"n_starved":$nStarved,"cpus":$cpusJson,"full":"$fullPath","sf":"$sfDir"}"""
    // The consumer keeps only the last ~2000 chars of stdout. When the
    // per-query line fits that window it is the single (parseable) line;
    // when the registry outgrows it, the per-query line still prints —
    // its tail-visible suffix carries most queries for eyeballing — and a
    // short totals-only line follows as the LAST line, so the tail always
    // ends with machine-parseable JSON either way.
    println(withQueries)
    if (withQueries.length > 1900) println(totalsOnly)
    spark.stop()
  }
}
