package graft

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"value":…,"queries":{…},"sf":…}.
  * Each query is forced with .count() (full plan execution, no collect
  * of payload to the driver). A warmup pass on the smallest table
  * absorbs JVM/codegen startup so numbers reflect steady-state.
  *
  * The artifact is load-proofed, in layers (each added after a round
  * record was contaminated by ambient load):
  *   - the run WAITS for an idle box up front (bounded /proc/loadavg
  *     poll, ≤5 min by default) — the only mitigation that works
  *     against load that persists for minutes;
  *   - the JSON carries /proc/loadavg before/after, BOTH per-pass
  *     times per query, and the idle-wait outcome;
  *   - a common-set total above 1.5× the idle anchor triggers one
  *     sleep-and-rerun, emitting both attempts;
  *   - if even the best attempt breaches the trigger, the record says
  *     `headline_unusable: true` — per-query passes remain for
  *     diagnosis, but the headline never again poses as a measurement
  *     (round 14's flagged-but-numeric record misled at face value).
  */
object Bench {

  /** Abbreviate a benched query key to its `family_qN` prefix for the
    * compact stdout record — but only when the prefix is UNIQUE within
    * this run's key set. Duplicate JSON keys silently shadow a timing
    * in most parsers (e.g. `tsdb_q3_eq`/`tsdb_q3_neq` would both emit
    * `tsdb_q3`), so colliding keys fall back to their full name. */
  private[graft] def abbrevAll(keys: Seq[String]): Map[String, String] = {
    def prefix(k: String): String = {
      val m = java.util.regex.Pattern.compile("^([a-z]+_q\\d+)").matcher(k)
      if (m.find()) m.group(1) else k
    }
    val counts = keys.groupBy(prefix).view.mapValues(_.size).toMap
    keys.map(k => k -> { val p = prefix(k); if (counts(p) > 1) k else p })
      .toMap
  }
  // Scan/join/agg/window/dedup/ANN mix — the queries whose plans carry
  // the 100 TB design decisions. The first `CommonPrefix` entries are
  // the rounds-7–9 comparable set; the JSON also emits their total as
  // `total_r7_common` so cross-round comparisons don't misread the
  // round-10 additions as a slowdown.
  private val CommonPrefix = 34
  private val headline = Seq(
    "tsdb_q1_scan", "tsdb_q2_range", "tsdb_q4_regroup",
    "tsdb_q7_range_vectors", "tsdb_q8_instant", "tsdb_q11_increase",
    "rel_q1_pricing", "rel_q2_star_join", "rel_q3_fact_join",
    "rel_q6_window", "rel_q11_asof", "rel_q16_range_join",
    "rel_q18_bucketed_join", "rel_q27_hist_sketch",
    "pipe_q1_exact_dedup", "pipe_q5_fingerprint", "pipe_q6_minhash",
    "pipe_q7_lsh_pairs", "pipe_q8_simhash", "pipe_q10_knn",
    "pipe_q21_tfidf",
    "tsdb_q32_setops", "tsdb_q34_hist_quantile", "tsdb_q35_holt_winters",
    "tsdb_q43_promql_sliding_rate", "tsdb_q48_promql_sliding_binop",
    "tsdb_q67_promql_range_subquery_increase",
    "tsdb_q69_promql_topk_by", "tsdb_q74_promql_strict_rate",
    "tsdb_q75_promql_xrate",
    "pipe_q30_packing", "pipe_q31_chunk_dedup", "pipe_q32_kmeans",
    "pipe_q33_semantic_dedup",
    // round-9/10 operator families (added round 10 — cross-round totals
    // remain comparable over the common prefix above)
    "tsdb_q80_native_hist", "tsdb_q88_native_hist_rate",
    "tsdb_q89_native_hist_exp", "tsdb_q86_label_values",
    "pipe_q38_cm_heavy_hitters", "pipe_q39_unigram_logprob",
    "pipe_q40_audio",
    // round-10 additions: PromQL-over-histograms text tier, real video,
    // the rules engine and exemplars
    "tsdb_q90_promql_hist_quantile", "tsdb_q91_promql_hist_rate",
    "pipe_q42_video", "pipe_q44_video_frames",
    "tsdb_q98_alert_rule", "tsdb_q96_exemplars",
    "tsdb_q100_alerts_series",
    // round-10: the remote-write wire codec (encode+decode round trip),
    // OTLP ingest, and the block-storage round trip. q109 (data dir =
    // blocks + WAL + merge) stays out of the bench: it re-runs q108's
    // dominant work and would double-count ~7 s per pass; it remains
    // fully oracle-verified in CORRECTNESS
    "tsdb_q101_remote_write", "tsdb_q107_otlp",
    "tsdb_q108_block_roundtrip",
    // round-10: tombstone deletes + masked reads, WAL checkpoint
    // replay, and WAL native-histogram records. q110/q112/q116 stay
    // out: each re-runs q108/q113's dominant write work and would
    // double-count it; all remain oracle-verified in CORRECTNESS
    "tsdb_q111_delete_series", "tsdb_q113_wal_checkpoint",
    "tsdb_q117_wal_native_hist",
    // round-10: streamed remote read (the wire round trip of the
    // matched window). The other round-10 lifecycle queries stay out
    // by the q110 rationale — q126/q130/q131 re-run q108's dominant
    // block-assembly work (q126 THREE times over via the ladder) and
    // q127/q128 re-run q113/q129's shapes; all stay oracle-verified
    // in CORRECTNESS
    "tsdb_q129_remote_read_chunked",
    // round-10 late: range-mode absent_over_time (presence anti-join),
    // xdelta (gauge extrapolation), and the YAML rule-file group
    // (parse + recording + alert state machine). q134 stays out — it
    // re-runs q108's block write
    "tsdb_q132_promql_absent_range", "tsdb_q133_promql_xdelta",
    "tsdb_q135_rules_from_yaml", "pipe_q46_pq_knn", "pipe_q47_ivfpq_knn",
    // round 12: keep_firing_for walk, OTLP histogram framings, sampled
    // training (binding), residual IVFADC
    "tsdb_q140_keep_firing_for", "tsdb_q141_otlp_exp_hist",
    "tsdb_q142_otlp_classic_hist", "pipe_q48_kmeans_sampled",
    "pipe_q50_ivfpq_residual",
    // round 13/14: substring-level span dedup (the largest new frame),
    // OTLP summaries (binary framing; q152's JSON twin stays out — it
    // re-runs the same aggregation work per the q110 rationale),
    // SAMPLED histogram remote read, UTF-8 names end-to-end
    "pipe_q52_dup_spans", "pipe_q53_span_scrub",
    "tsdb_q150_otlp_summary", "tsdb_q151_remote_read_hist_sampled",
    "tsdb_q153_utf8_names",
    // round 16: histogram arithmetic (one-to-one matched add — the new
    // join kernel) and the over-time fold family (sum_over_time as the
    // representative; avg/last share its fan-out/groupBy shape)
    "tsdb_q156_promql_hist_add", "tsdb_q159_promql_hist_sum_over_time",
    // round 17: the scale-by-float-vector join kernel, the histogram
    // subquery grid+fold, and the split-tier mixed-or membership join
    "tsdb_q175_promql_hist_div_vector",
    "tsdb_q177_promql_hist_subquery_fold", "tsdb_q180_promql_mixed_or",
    // round 18: the per-series migration-stitch broadcast join (the
    // Shadowing kernel every read surface shares) and the split-tier
    // float-division keyed join
    "tsdb_q185_promql_migrated_stitch", "tsdb_q186_promql_split_div",
    // round 19: the over-time window composition (per-series share
    // add over both stores — the seriesShare kernel family)
    "tsdb_q193_promql_mixed_count_over_time",
    // round 19: the OFFSET-resolved stitch (q185's kernel plus the
    // shifted lookup windows and the resolved-axis shadow filter)
    "tsdb_q190_promql_offset_stitch")
  // round 15: tsdb_q154_tsdb_dump stays out by the q110 rationale — it
  // re-runs q108's dominant block-write work (plus q130's parse) —
  // and tsdb_q155_api_hist_json re-runs q90's dominant daily-histogram
  // build; both remain fully oracle-verified in CORRECTNESS.
  // Round 16: q157/q158/q160-q162 re-run q156/q159's kernels;
  // stream_q18 and tsdb_q163 re-run q117's WAL-write / q108's
  // block-write dominant work — all stay oracle-verified in
  // CORRECTNESS, out of the bench by the same double-count rationale.
  // Round 17: q176/q178/q179/q181 re-run q175/q180's join/sampling
  // kernels — oracle-verified in CORRECTNESS, out of the bench.
  // Round 18: q187/q188 re-run the mixed-share membership joins that
  // q185/q186 already time (group-count-sized inputs) — oracle-verified
  // in CORRECTNESS, out of the bench by the double-count rationale.
  // Round 19: q191 re-runs q188's exclusive-share kernel (without-form
  // grouping, same group-count-sized joins) — oracle-verified in
  // CORRECTNESS, out of the bench by the same rationale.

  /** 1/5/15-minute fields of /proc/loadavg (empty off-Linux). */
  private def loadavg(): Seq[Double] =
    try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
          .trim.split("\\s+").take(3).toSeq.map(_.toDouble)
    catch { case NonFatal(_) => Seq.empty }

  /** Cumulative steal ticks (aggregate `cpu` line of /proc/stat, field
    * 8 after the label; USER_HZ=100). On a shared host, steal moving
    * DURING the run is the direct signature of co-tenant contention —
    * the round-19 record's loadavg gate missed a 43%-preloaded box, and
    * a later in-session burst measured 4-5 ticks/s while inflating
    * query times 2-4x. -1 off-Linux / unreadable. */
  private def stealTicks(): Long =
    try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      val f = cpu.trim.split("\\s+")
      if (f.length > 8) f(8).toLong else -1L
    } catch { case NonFatal(_) => -1L }

  /** Wait (bounded) for the BOX to go idle before any work starts:
    * poll the 1-minute loadavg until it drops below `threshold` or
    * `maxWaitSec` elapses. Returns (seconds waited, went idle?).
    *
    * This runs BEFORE the SparkSession exists — once warmup starts,
    * this process's own load dominates the 1-minute average and the
    * signal is gone. Round-14 lesson: the sleep-30s-rerun-once
    * mitigation cannot outwait minutes of ambient load (both attempts
    * ran loaded and the record's headline numbers were artifacts); a
    * bounded pre-run wait either starts from a clean box or lets the
    * record declare its headline unusable up front. */
  private def waitForIdle(threshold: Double, maxWaitSec: Int)
      : (Int, Boolean) = {
    var waited = 0
    while (waited < maxWaitSec) {
      val la = loadavg()
      if (la.isEmpty || la.head < threshold) return (waited, true)
      System.err.println(f"[bench] 1-min load ${la.head}%.2f >= " +
        f"$threshold%.2f — waiting for idle (${waited}s/${maxWaitSec}s)")
      Thread.sleep(10000)
      waited += 10
    }
    (waited, loadavg().headOption.forall(_ < threshold))
  }

  private def jsonArr(xs: Seq[Double]): String =
    xs.mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Idle-box ANCHOR for the rounds-7–9 common-set total at sf0.1
    // (BENCHNOISE.md round-12 note: four same-day idle reruns measured
    // 10.83–11.08 s). A common-set total above 1.5× the anchor triggers
    // one sleep-and-rerun; both attempts are recorded. Round-12 lesson:
    // the old trigger (2× a 15.5 s ceiling = 31 s) let a 21.96 s record
    // — itself a face-value breach of the round's own 2× criterion —
    // sail through unflagged. Keyed at 1.5× the idle anchor (≈16.5 s),
    // any criterion-breaching total earns the flag and the second try.
    val anchorSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ANCHOR_SEC", "11.0").toDouble
    val flagTriggerSec = 1.5 * anchorSec
    // idle gate: ambient 1-min load below this before the run starts
    // (idle box measures ~0.2; the round-14 contaminated record started
    // at 3.2). Bounded wait — a box that never goes idle still runs,
    // but the record marks its headline unusable if the flag trips.
    // The AMBIENT threshold scales with core count: a fixed 1.0 is the
    // wait target, but the flag condition uses max(1.0, 0.15 x cores)
    // — round 19's record started at loadavg 13.86 on 32 cores (43%
    // pre-loaded), inflated 40 untouched sub-second queries ~15%, and
    // still passed because only the common-set TOTAL was gated.
    val idleLoad =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_IDLE_LOAD", "1.0").toDouble
    val ambientLoadMax = sys.env.get("SPARK_GRAFT_BENCH_AMBIENT_LOAD")
      .map(_.toDouble).getOrElse(math.max(1.0, 0.15 * cpus.toInt))
    val idleWaitMax =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_IDLE_WAIT_SEC", "300").toInt
    val (idleWaitedSec, idleAtStart) = waitForIdle(idleLoad, idleWaitMax)
    // the AMBIENT gate's loadavg must be read HERE — before the
    // SparkSession exists: warmup + ingest alone drive the 1-min load
    // to ~6 on a 32-core box, so a post-warmup reading always exceeds
    // the threshold and the flag would be self-induced noise
    val loadAtStart = loadavg()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: JIT + codegen + parquet footer caches. One untimed pass of
    // every headline query — whole-stage codegen compiles each query's
    // generated class once (Janino), a JVM-lifetime cost that a long-
    // running cluster pays once; timing the second pass measures the
    // engine, not the compiler.
    // Guards catch NonFatal only: an OutOfMemoryError/LinkageError means
    // the JVM can no longer produce trustworthy numbers, so let it abort
    // the run rather than record timings from a corrupted process.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case NonFatal(e) =>
      System.err.println(s"[bench] warmup scan FAILED: ${e.getMessage}") }
    // ...including the WRITE path (committer/codegen init is a JVM-
    // lifetime cost): warm the REAL ingest pipeline — events read (nanos
    // flag, props regexp codegen), range sampling, sort, parquet v2
    // writer — on a tiny slice, so the timed ingest measures the engine,
    // not first-touch class loading
    // Nothing before the timed loop may abort the run: round 8 lost its
    // ENTIRE bench artifact because an analysis exception in this warmup
    // escaped (testdata schema drift). A failed warmup only costs
    // first-touch noise on the affected path; a failed ingest reports -1
    // for that metric — either way the JSON line still prints.
    try {
      val tmp = graft.queries.Tables.scratchDir("graft_warm_")
      graft.tsdb.TsdbIngest.write(
        graft.queries.Tables.eventsAsTsdb(spark, sfDir).limit(2000),
        tmp, timePartitions = 2)
      spark.read.parquet(tmp).count()
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] warmup FAILED: ${e.getMessage}")
    }

    // the tsdb_* queries read a write-once sorted materialization
    // (queries.Tables.eventsAsTsdbStored); time that ingest as its own
    // metric so query numbers measure queries, not the one-time build.
    // Ingest is one-shot per JVM (the store is cached), so a load-flag
    // rerun reuses this number — only the query loop repeats.
    val tIngest0 = System.nanoTime()
    val ingestOk =
      try { graft.queries.Tables.eventsAsTsdbStored(spark, sfDir).count(); true }
      catch { case NonFatal(e) =>
        System.err.println(s"[bench] ingest FAILED: ${e.getMessage}"); false }
    val ingestSec =
      if (ingestOk) (System.nanoTime() - tIngest0) / 1e9 else -1.0

    val fns = SparkEntry.queries
    val names = headline.filter(fns.contains)

    names.foreach { name =>
      try fns(name)(spark, sfDir).count()
      catch { case NonFatal(_) => }
    }

    // one timed attempt = two passes per query; min-of-2 absorbs
    // transient scheduler/GC noise, and BOTH raw pass times go into the
    // artifact so sustained load is visible after the fact. The 1-min
    // loadavg read after each query rides along so a mid-run ambient
    // burst is attributable to the stretch of queries it inflated
    // (round 19's q150–q175 stretch needed exactly this forensics).
    def timedAttempt(): Seq[(String, Seq[Double], Long, Double)] =
      names.map { name =>
        val passes = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = try fns(name)(spark, sfDir).count()
                  catch { case NonFatal(e) =>
                    System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
                    -1L }
          ((System.nanoTime() - t0) / 1e9, n)
        }
        (name, passes.map(_._1), passes.head._2,
          loadavg().headOption.getOrElse(-1.0))
      }
    def totalOf(a: Seq[(String, Seq[Double], Long, Double)]): Double =
      ingestSec + a.map(_._2.min).sum
    // the load flag compares against BENCHNOISE's floor, which was
    // measured for the rounds-7–9 COMMON set — so it must be computed
    // over that same set, or every round that ADDS queries would trip it
    val commonSet = headline.take(CommonPrefix).toSet
    def commonOf(a: Seq[(String, Seq[Double], Long, Double)]): Double =
      ingestSec + a.filter(r => commonSet(r._1)).map(_._2.min).sum

    val loadBefore = loadavg()
    val stealBefore = stealTicks()
    val tTimed0 = System.nanoTime()
    var attempts = Vector((timedAttempt(), loadavg()))
    if (commonOf(attempts.head._1) > flagTriggerSec) {
      System.err.println(
        f"[bench] common-set total ${commonOf(attempts.head._1)}%.1f s > " +
        f"1.5x idle anchor ($anchorSec%.1f s → trigger $flagTriggerSec%.1f " +
        "s) — ambient load suspected; sleeping 30 s and rerunning")
      Thread.sleep(30000)
      attempts :+= ((timedAttempt(), loadavg()))
    }
    val (best, _) = attempts.minBy { case (a, _) => totalOf(a) }
    val commonTotal = commonOf(best)
    // flag the ARTIFACT when even the best attempt breaches the trigger —
    // a true record never needs the caveat, an inflated one always gets it.
    // A flagged record's HEADLINE is declared unusable outright: round 14
    // emitted a flagged-but-numeric record and its headline values were
    // pure load artifacts (idle rerun: 32.9 s → 16.0 s common-set with
    // zero code change). Per-query passes stay in the artifact for
    // diagnosis; the headline does not pretend to be a measurement.
    val totalBreach = commonTotal > flagTriggerSec
    // AMBIENT gate (round-20, after the round-19 record passed a
    // loadavg-13.86 box unflagged): the pre-run load must sit under the
    // core-scaled threshold, and steal ticks must not move during the
    // timed section beyond ~2% of one core (observed contamination
    // bursts run 4-5 ticks/s and inflate queries 2-4x; an idle
    // dedicated box reads 0). Either condition self-flags the record
    // even when the common-set total stays under its trigger — the
    // round-19 failure mode was exactly a sub-trigger total with 40
    // spuriously "regressed" per-query numbers.
    val stealAfter = stealTicks()
    val timedSec = (System.nanoTime() - tTimed0) / 1e9
    val stealDelta =
      if (stealBefore >= 0 && stealAfter >= 0) stealAfter - stealBefore
      else -1L
    // threshold 10 ticks/s, calibrated on four same-day runs of this
    // bench: 1.8/s → clean record (common 12.2 s @32), 8.6/s → the
    // best c8 record ever (11.2 s, i.e. harmless), 13.8/s → inflated
    // (13.7 s @8), 58/s → badly inflated (15.9 s @32, under the old
    // total trigger). The damage threshold sits between 8.6 and 13.8.
    val stealFlagged = stealDelta > math.max(100.0, 10.0 * timedSec)
    val ambientFlagged =
      loadAtStart.headOption.exists(_ > ambientLoadMax) || stealFlagged
    val loadFlagged = totalBreach || ambientFlagged
    val headlineUnusable = totalBreach

    val results = ("tsdb_ingest", Seq(ingestSec), 0L, -1.0) +: best
    val qs = results.map { case (k, ps, _, _) => s""""$k":${ps.min}""" }
      .mkString("{", ",", "}")
    val passes = results.map { case (k, ps, _, _) =>
      s""""$k":${jsonArr(ps)}""" }.mkString("{", ",", "}")
    val qLoads = results.map { case (k, _, _, la) => s""""$k":$la""" }
      .mkString("{", ",", "}")
    val total = totalOf(best)
    // The FULL record — per-pass times, loadavg triples, attempt totals —
    // goes to bench_out.json ONLY. Round 10's lesson: the driver captures
    // just the last ~2 KB of stdout, and the enriched line (~5.3 KB)
    // overflowed it, leaving the round record unparseable ("parsed": null
    // in BENCH_r10.json) even though the data was fine.
    val rich = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":$qs,"sf":"$sfDir"""" +
      s""","passes":$passes""" +
      s""","loadavg_before":${jsonArr(loadBefore)}""" +
      s""","loadavg_after":${jsonArr(attempts.last._2)}""" +
      s""","attempt_totals":${jsonArr(attempts.map(a => totalOf(a._1)))}""" +
      s""","total_r7_common":$commonTotal""" +
      s""","idle_anchor_sec":$anchorSec,"flag_trigger_sec":$flagTriggerSec""" +
      s""","idle_wait_sec":$idleWaitedSec,"idle_at_start":$idleAtStart""" +
      s""","loadavg_per_query":$qLoads""" +
      s""","loadavg_at_start":${jsonArr(loadAtStart)}""" +
      s""","ambient_load_max":$ambientLoadMax""" +
      s""","ambient_load_flagged":$ambientFlagged""" +
      s""","steal_ticks_delta":$stealDelta,"timed_sec":$timedSec""" +
      s""","load_flagged":$loadFlagged""" +
      s""","headline_unusable":$headlineUnusable}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (rich + "\n").getBytes("UTF-8"))
    // The LAST stdout line is a COMPACT machine-readable record sized well
    // under the 2 KB tail: query keys abbreviated to their unique
    // family_qN prefix (e.g. tsdb_q67_promql_range_subquery_increase →
    // tsdb_q67), values rounded to ms, loadavg trimmed to the 1-min field.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qsCompact = {
      val keys = results.map(_._1)
      val short = Bench.abbrevAll(keys)
      results.map { case (k, ps, _, _) =>
        s""""${short(k)}":${f3(ps.min)}""" }.mkString("{", ",", "}")
    }
    val la1 = (xs: Seq[Double]) => if (xs.isEmpty) "null" else f3(xs.head)
    val compact = s"""{"metric":"total","value":${f3(total)},""" +
      s""""unit":"sec","queries":$qsCompact,"sf":"$sfDir"""" +
      s""","total_r7_common":${f3(commonTotal)}""" +
      s""","loadavg_before":${la1(loadBefore)}""" +
      s""","loadavg_after":${la1(attempts.last._2)}""" +
      s""","load_flagged":$loadFlagged""" +
      s""","ambient_load_flagged":$ambientFlagged""" +
      s""","headline_unusable":$headlineUnusable,"detail":"bench_out.json"}"""
    println(compact)
    spark.stop()
  }
}
