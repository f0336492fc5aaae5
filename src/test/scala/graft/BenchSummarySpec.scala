package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.buildSummary]]'s capture-window contract: the driver keeps
  * only the LAST ~2000 chars of stdout, so the summary must (a) fit the
  * window WHOLE at any realistic query count, (b) stay parseable JSON,
  * (c) degrade in the declared order — errors outlive the streaming block,
  * anomaly attribution outlives the streaming block, and anomalies drop
  * only at the very last rung. A reorder of the ladder (or a key-collision
  * regression that last-wins-drops a query from the parsed artifact) fails
  * here before it silently corrupts a round's official BENCH artifact.
  */
class BenchSummarySpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Synthesize a bench result set: `n` queries with reference-shaped names
    * (q01_/x02_… prefixes + a payload suffix), the last `nAnom` of them
    * unstable (runs [3.5, 11.3, 15.6]-shaped, median >> min).
    */
  private def synth(n: Int, nAnom: Int, suffixLen: Int,
                    nErr: Int, nLeak: Int) = {
    val names = (0 until n).map(i => f"x$i%02d_" + ("a" * suffixLen))
    val runTimes: Seq[(String, Seq[Double])] = names.zipWithIndex.map {
      case (name, i) =>
        if (i >= n - nAnom) name -> Seq(15.62, 3.47, 11.25)
        else name -> Seq(0.3 + i * 0.01, 0.31 + i * 0.01, 0.29 + i * 0.01)
    }
    val results = runTimes.map { case (k, ts) => k -> ts.sorted.apply(1) }
    val sysStats = names.map(_ -> ((6.9, 1450L, 540.8))).toMap
    val errors = (0 until nErr).map(i => s"err_query_$i")
    val leaks = (0 until nLeak).map(i => s"leaker:table_$i")
    val st = """{"latestByKey_rows_per_sec":393508,"streamDedup_rows_per_sec":412317,"streamTableJoin_rows_per_sec":324952,"tableTableJoin_rows_per_sec":311055}"""
    val stShort = """{"latestByKey":393508,"streamDedup":412317,"streamTableJoin":324952,"tableTableJoin":311055}"""
    val total = results.map(_._2).sum
    Bench.buildSummary(results, runTimes, sysStats, errors, errors.take(1),
      leaks, total, st, stShort, "/root/testdata/sf0.1")
  }

  test("every rung of the ladder emits a <=1960-char parseable JSON object with the driver contract fields") {
    // the sweep is sized to walk the WHOLE ladder: 5 queries fits the full
    // 3-decimal rung, 200 long-named queries + errors forces the deepest
    // compactions
    for (n <- Seq(5, 40, 80, 120, 200); nErr <- Seq(0, 6); suffix <- Seq(12, 40)) {
      val s = synth(n, nAnom = math.min(8, n), suffixLen = suffix,
        nErr = nErr, nLeak = nErr)
      assert(s.length <= 1960, s"n=$n suffix=$suffix: ${s.length} chars")
      val j = mapper.readTree(s)
      assert(j.get("metric").asText == "total", s)
      assert(j.get("value").isNumber && j.get("unit").asText == "sec", s)
      assert(j.get("sf").asText == "/root/testdata/sf0.1", s)
      // key-collision detector: Jackson parses duplicate keys last-wins, so
      // a shortening collision shows up as a SHRUNKEN queries object. Past
      // the ladder (a far-future query surface), truncation must be
      // DECLARED via queries_omitted — never silent
      val omitted = if (j.has("queries_omitted")) j.get("queries_omitted").asInt else 0
      assert(j.get("queries").size + omitted == n,
        s"n=$n suffix=$suffix: ${j.get("queries").size} query keys + $omitted omitted")
      // today's real surface (79 queries) must never need the truncation floor
      if (n <= 120) assert(omitted == 0, s"n=$n must fit without truncation")
    }
  }

  test("survival ordering: anomalies outlive streaming, errors outlive both, anomalies drop last") {
    for (n <- Seq(5, 40, 80, 120, 200, 400); nErr <- Seq(0, 6)) {
      val s = synth(n, nAnom = math.min(8, n), suffixLen = 40, nErr = nErr, nLeak = nErr)
      val j = mapper.readTree(s)
      val hasStreaming = j.has("streaming") || j.has("streaming_rows_per_sec")
      // every rung that still carries throughput rates must also carry the
      // anomaly attribution and the error fields — the declared priority
      if (hasStreaming) {
        assert(j.has("anomalies"), s"streaming without anomalies at n=$n: $s")
        assert(j.has("errors") && j.has("flaky") && j.has("leaks"),
          s"streaming without errors at n=$n: $s")
      }
      if (j.has("anomalies")) {
        assert(j.has("errors"), s"anomalies without errors at n=$n: $s")
        // [[runs], [loadavg, gc_ms, cpu_s], "why"] — the attribution payload
        val a = j.get("anomalies").elements().next()
        assert(a.isArray && a.size == 3 && a.get(0).isArray && a.get(1).size == 3 &&
          a.get(2).isTextual, s)
      }
      // the smallest inputs must keep everything (no premature degradation)
      if (n == 5) assert(hasStreaming && j.has("anomalies") && j.has("errors"), s)
    }
  }

  test("anomaly keys never collide: shared q../x.. prefixes fall back to full names") {
    // two anomalous queries sharing the "x13" prefix — a prefix-always
    // shortening would emit duplicate JSON keys (silently last-wins)
    val runTimes = Seq(
      "x13_dedup_keep" -> Seq(15.62, 3.47, 11.25),
      "x13_dedup_keep_ranked" -> Seq(14.0, 3.0, 10.0))
    val results = runTimes.map { case (k, ts) => k -> ts.sorted.apply(1) }
    val sysStats = results.map(_._1 -> ((1.0, 10L, 5.0))).toMap
    val s = Bench.buildSummary(results, runTimes, sysStats, Nil, Nil, Nil,
      21.25, "{}", "{}", "/sf")
    val j = mapper.readTree(s)
    assert(j.get("anomalies").size == 2, s"one anomaly shadowed the other: $s")
    assert(j.get("queries").size == 2, s)
  }

  test("anomaly keys use the queries-block key map: a prefix shared with a STABLE query keeps the full name") {
    // x13_dedup_keep is anomalous, x13_other is stable: uniqueness judged
    // only within the anomalous subset would emit a bare "x13" anomaly key
    // while the queries block keeps two full x13_* names — a dangling
    // attribution ambiguous between them. The key map must be shared.
    val runTimes: Seq[(String, Seq[Double])] = Seq(
      "x13_dedup_keep" -> Seq(15.62, 3.47, 11.25),
      "x13_other" -> Seq(0.30, 0.31, 0.29),
      "x14_stable" -> Seq(0.20, 0.21, 0.19))
    val results = runTimes.map { case (k, ts) => k -> ts.sorted.apply(1) }
    val sysStats = results.map(_._1 -> ((1.0, 10L, 5.0))).toMap
    val s = Bench.buildSummary(results, runTimes, sysStats, Nil, Nil, Nil,
      11.75, "{}", "{}", "/sf")
    val j = mapper.readTree(s)
    val qKeys = {
      val it = j.get("queries").fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    val aKeys = {
      val it = j.get("anomalies").fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    assert(aKeys.contains("x13_dedup_keep"), s"expected the full name, got $aKeys in $s")
    // every anomaly key resolves to EXACTLY one queries-block key (equal,
    // or the unique short form of one full name)
    aKeys.foreach { a =>
      val hits = qKeys.filter(q => q == a || q.startsWith(a + "_"))
      assert(hits.size == 1, s"anomaly key $a matches $hits in $s")
    }
  }

  test("isUnstable flags systematic inflation but not sub-second jitter") {
    assert(Bench.isUnstable(Seq(15.62, 3.47, 11.25)), "r10's x13 shape must flag")
    assert(!Bench.isUnstable(Seq(0.30, 0.18, 0.30)),
      "sub-second jitter must not flag (absolute floor)")
    assert(!Bench.isUnstable(Seq(5.0, 5.1, 4.9)), "stable runs must not flag")
    assert(!Bench.isUnstable(Nil))
  }

  test("officialStat publishes the converged floor cluster's median, else the plain median") {
    // the r14 headline shape: convergence reruns FOUND the floor twice
    // ([3.47, 3.55] within 15%), yet the even-count conservative median of
    // all four runs reads 11.25 — officialStat must publish 3.55
    assert(Bench.officialStat(Seq(15.62, 3.47, 11.25, 3.55)) == (3.55, "floor_cluster"))
    // a LONE fast outlier never wins: unstable but cluster of 1 ⇒ median
    assert(Bench.officialStat(Seq(15.62, 3.47, 11.25)) == (11.25, "median"))
    // stable runs: plain median, rule says so
    assert(Bench.officialStat(Seq(5.0, 5.1, 4.9)) == (5.0, "median"))
    // sub-second jitter is not unstable (absolute floor) ⇒ median
    assert(Bench.officialStat(Seq(0.30, 0.18, 0.30)) == (0.30, "median"))
    // all runs agreeing IS a cluster, but a stable set never needs the rule
    assert(Bench.officialStat(Seq(3.5, 3.6, 3.55))._2 == "median")
    assert(Bench.officialStat(Nil) == (-1.0, "none"))
  }

  test("officialStat properties on random run sets: lone-outlier never wins, value from the set, floor rule sound (round-16 sweep)") {
    val rnd = new scala.util.Random(1614)
    (1 to 2000).foreach { _ =>
      val n = 1 + rnd.nextInt(6)
      val ts = Seq.fill(n)(0.05 + rnd.nextDouble() * (if (rnd.nextBoolean()) 1.0 else 20.0))
      val (v, tag) = Bench.officialStat(ts)
      // the published value is always one of the actual runs, inside the range
      assert(ts.contains(v), s"$ts -> $v not a run")
      assert(v >= ts.min && v <= ts.max)
      val cluster = ts.filter(_ <= ts.min * Bench.FloorClusterTolerance)
      // a cluster of ONE (isolated fast outlier) must never publish as floor
      if (cluster.length < 2) assert(tag != "floor_cluster", s"$ts published a lone outlier")
      // floor publication only under the instability signature, and then
      // the published value must sit inside the converged cluster
      if (tag == "floor_cluster") {
        assert(Bench.isUnstable(ts), s"$ts floored while stable")
        assert(v <= ts.min * Bench.FloorClusterTolerance, s"$ts floor pick $v outside cluster")
      }
      // a stable set is always the plain median
      if (!Bench.isUnstable(ts)) assert(tag == "median")
    }
  }

  test("a floor-published query tags +floor in the anomalies block and its summary value is the cluster median") {
    val runTimes: Seq[(String, Seq[Double])] = Seq(
      "x01_floored" -> Seq(15.62, 3.47, 11.25, 3.55), // converged floor
      "x02_fast" -> Seq(0.30, 0.31, 0.29))
    val results = runTimes.map { case (k, ts) => k -> Bench.officialStat(ts)._1 }
    val sysStats = results.map(_._1 -> ((1.0, 10L, 5.0))).toMap
    val s = Bench.buildSummary(results, runTimes, sysStats, Nil, Nil, Nil,
      3.85, "{}", "{}", "/sf")
    val j = mapper.readTree(s)
    assert(j.get("queries").get("x01_floored").asDouble == 3.55, s)
    assert(j.get("anomalies").get("x01").get(2).asText == "inflated+floor", s)
  }

  test("a distressed preflight stamps env in the summary at every rung; a quiet one stays silent") {
    val quiet = synth(5, nAnom = 0, suffixLen = 12, nErr = 0, nLeak = 0)
    assert(!mapper.readTree(quiet).has("env"), quiet)
    // force the deepest rungs with many long-named queries + the note
    for (n <- Seq(5, 200)) {
      val names = (0 until n).map(i => f"x$i%02d_" + ("a" * 40))
      val runTimes: Seq[(String, Seq[Double])] =
        names.map(_ -> Seq(1.0, 1.01, 0.99))
      val results = runTimes.map { case (k, ts) => k -> ts.sorted.apply(1) }
      val sysStats = names.map(_ -> ((6.9, 1450L, 540.8))).toMap
      val s = Bench.buildSummary(results, runTimes, sysStats,
        (0 until 6).map(i => s"err_$i"), Nil, Nil, n * 1.0, "{}", "{}", "/sf",
        Map.empty, envNote = Some("distressed(load=12.4,gc=0.41,waited=92s)"))
      assert(s.length <= 1960, s"n=$n: ${s.length}")
      val j = mapper.readTree(s)
      assert(j.get("env").asText == "distressed(load=12.4,gc=0.41,waited=92s)", s)
    }
  }

  test("era calibration: the constant rides every rung and de-rates the regression gate (round 16)") {
    val results = Seq("q01_filter" -> 0.3, "x39_cluster_stream" -> 11.0)
    val runTimes = Seq("q01_filter" -> Seq(0.3, 0.3, 0.3),
      "x39_cluster_stream" -> Seq(11.0, 11.2, 11.4))
    val sysStats = results.map { case (k, _) => k -> (1.0, 0L, 1.0) }.toMap
    // prior official 7.7 with calib 0.20; this era's calib 0.30 ⇒ de-rate
    // 1.5 ⇒ effective prior 11.55 ⇒ floor 11.0 is NOT regressed
    val deRated = Bench.buildSummary(results, runTimes, sysStats, Nil, Nil, Nil,
      11.3, "{}", "{}", "/root/testdata/sf0.1",
      prior = Map("x39_cluster_stream" -> 7.7),
      calibS = 0.30, priorCalib = Some(0.20))
    assert(!deRated.contains("regressed"), deRated)
    assert(deRated.contains("\"calib\":0.300"), deRated)
    // same numbers WITHOUT calib: raw comparison tags it (11.0 > 1.3×7.7)
    val raw = Bench.buildSummary(results, runTimes, sysStats, Nil, Nil, Nil,
      11.3, "{}", "{}", "/root/testdata/sf0.1",
      prior = Map("x39_cluster_stream" -> 7.7))
    assert(raw.contains("regressed"), raw)
    // a FASTER era must not loosen (clamp at 1×): de-rate is never < 1
    assert(Bench.calibDeRate(0.10, Some(0.20)) == 1.0)
    assert(math.abs(Bench.calibDeRate(0.30, Some(0.20)) - 1.5) < 1e-9)
    assert(Bench.calibDeRate(2.0, Some(0.20)) == 3.0) // cap
    assert(Bench.calibDeRate(0.30, None) == 1.0)
    assert(Bench.calibDeRate(-1.0, Some(0.20)) == 1.0)
    // the kernel itself: fixed work, positive, and repeatable — two
    // invocations on the same machine must agree within a generous band
    // (each is already a min-of-3, so a single co-tenant stall cannot
    // separate them). Deliberately NO absolute wall-clock bound: a
    // throttled CI host makes any absolute number a flake (r16 ADVICE).
    val c = Bench.cpuCalib()
    val c2 = Bench.cpuCalib()
    assert(c > 0.0 && c2 > 0.0, s"calibration kernel read $c / $c2 s")
    assert(math.max(c, c2) / math.min(c, c2) < 3.0,
      s"same-JVM back-to-back calib reads disagree past the de-rate cap: $c vs $c2")
  }

  test("isRegressed flags a moved floor against the prior median, not jitter or missing priors") {
    // r11's x39: stable runs whose FLOOR exceeds the prior official median
    // — isUnstable stays silent (median within 1.5x of the set's own min),
    // the regression gate must not
    assert(!Bench.isUnstable(Seq(10.5, 11.51, 12.0)),
      "precondition: this shape is invisible to the inflation gate")
    assert(Bench.isRegressed(Seq(10.5, 11.51, 12.0), Some(7.77)),
      "a floor 1.35x past the prior median must flag as regressed")
    assert(!Bench.isRegressed(Seq(8.0, 8.1, 8.2), Some(7.77)),
      "within 1.3x of prior must not flag")
    assert(!Bench.isRegressed(Seq(0.45, 0.46, 0.47), Some(0.30)),
      "sub-second deltas must not flag (0.5 s absolute floor)")
    assert(!Bench.isRegressed(Seq(10.0, 11.0, 12.0), None),
      "no prior artifact, no flag")
    assert(!Bench.isRegressed(Nil, Some(1.0)))
  }

  test("anomalies block tags entries inflated / regressed / slow and includes prior-regressed queries") {
    val runTimes: Seq[(String, Seq[Double])] = Seq(
      "x01_regressed_only" -> Seq(10.5, 11.51, 12.0), // stable, floor moved
      "x02_inflated_only" -> Seq(15.62, 3.47, 11.25), // median >> own floor
      "x03_slow_stable" -> Seq(9.0, 9.1, 8.9), // top-5 by median, healthy
      "x04_fast" -> Seq(0.30, 0.31, 0.29))
    val results = runTimes.map { case (k, ts) => k -> ts.sorted.apply(1) }
    val sysStats = results.map(_._1 -> ((1.0, 10L, 5.0))).toMap
    val prior = Map("x01" -> 7.77, "x03_slow_stable" -> 8.8) // short + full keys
    val s = Bench.buildSummary(results, runTimes, sysStats, Nil, Nil, Nil,
      30.0, "{}", "{}", "/sf", prior)
    val j = mapper.readTree(s)
    val a = j.get("anomalies")
    assert(a.get("x01").get(2).asText == "regressed", s)
    assert(a.get("x02").get(2).asText == "inflated", s)
    assert(a.get("x03").get(2).asText == "slow", s)
  }

  test("priorMedians reads the highest-numbered BENCH artifact, guards sf, and degrades to empty") {
    val dir = java.nio.file.Files.createTempDirectory("bench-prior").toFile
    val sf = "/root/testdata/sf0.1"
    try {
      assert(Bench.priorMedians(sf, dir).isEmpty, "empty dir must yield no priors")
      java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r03.json"),
        s"""{"parsed":{"queries":{"q01":0.5,"x39":7.77},"sf":"$sf"}}""")
      java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r11.json"),
        s"""{"parsed":{"queries":{"q01":0.31,"x39":11.51},"sf":"$sf"}}""")
      java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r02.json"),
        """not json at all""")
      // a stray huge round number must not mute the gate (toInt overflow)
      java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r99999999999.json"),
        """{"parsed":{"queries":{"q01":9.9}}}""")
      val p = Bench.priorMedians(sf, dir)
      assert(p == Map("q01" -> 0.31, "x39" -> 11.51),
        s"must read r11 (highest valid N), got $p")
      // pre-calibration artifacts carry no calib ⇒ None (gate un-de-rated)
      assert(Bench.priors(sf, dir)._2.isEmpty)
      // a calib-stamped artifact surfaces its constant
      java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r11.json"),
        s"""{"parsed":{"queries":{"q01":0.31,"x39":11.51},"calib":0.25,"sf":"$sf"}}""")
      assert(Bench.priors(sf, dir)._2.contains(0.25))
      // CORRUPT calib shapes (round-17 sweep) degrade to None — the gate
      // runs un-de-rated, medians still usable — never throw, never
      // produce a de-rate from garbage: a string, zero, a negative, a
      // nested object, and a JSON-invalid NaN literal (which poisons the
      // whole parse ⇒ the dark path, empty medians AND no calib)
      for (bad <- Seq("\"0.25\"", "0", "-0.3", "{}")) {
        java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r11.json"),
          s"""{"parsed":{"queries":{"q01":0.31,"x39":11.51},"calib":$bad,"sf":"$sf"}}""")
        val (m, c) = Bench.priors(sf, dir)
        assert(c.isEmpty, s"calib=$bad must yield no de-rate constant")
        assert(m.nonEmpty, s"calib=$bad must not poison the medians")
      }
      java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r11.json"),
        s"""{"parsed":{"queries":{"q01":0.31,"x39":11.51},"calib":NaN,"sf":"$sf"}}""")
      locally {
        val (m, c) = Bench.priors(sf, dir)
        assert(c.isEmpty && m.isEmpty, "invalid-JSON NaN must take the dark path")
      }
      java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r11.json"),
        s"""{"parsed":{"queries":{"q01":0.31,"x39":11.51},"sf":"$sf"}}""")
      // an sf-mismatched prior must NOT compare: sf1 floors vs sf0.1
      // medians would tag every query regressed
      assert(Bench.priorMedians("/root/testdata/sf1", dir).isEmpty,
        "sf mismatch must yield no priors")
      // a corrupt HIGHEST artifact degrades to empty, never throws
      java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r12.json"),
        """{"truncated""")
      assert(Bench.priorMedians(sf, dir).isEmpty)
      java.nio.file.Files.delete(dir.toPath.resolve("BENCH_r12.json"))
      // the VERDICT fence: a verdict for round 10 means THIS run is round
      // 11+, so BENCH_r11.json is this round's own artifact (an in-round
      // rerun after the driver saved it) and must be excluded — the gate
      // falls back to the newest artifact at or below the fence (r03),
      // never self-comparing
      java.nio.file.Files.writeString(dir.toPath.resolve("VERDICT.md"),
        "# VERDICT — round 10\n\nbody\n")
      assert(Bench.priorMedians(sf, dir) == Map("q01" -> 0.5, "x39" -> 7.77),
        "fence must exclude artifacts newer than the verdict round")
      // an unparseable verdict leaves the fence open (old behavior)
      java.nio.file.Files.writeString(dir.toPath.resolve("VERDICT.md"), "no round header")
      assert(Bench.priorMedians(sf, dir) == Map("q01" -> 0.31, "x39" -> 11.51))
      // a fence that excludes EVERY artifact (stale verdict round) must go
      // dark — and return empty rather than lying — not silently pretend
      // round 1; the silent branch is only for no-artifacts-at-all
      java.nio.file.Files.writeString(dir.toPath.resolve("VERDICT.md"),
        "# VERDICT — round 1\n")
      assert(Bench.priorMedians(sf, dir).isEmpty,
        "all artifacts above the fence must yield no priors")
      // the mtime fence (the round-number fence's boundary hole): VERDICT
      // round 11 ADMITS BENCH_r11 by round number, but an r11 artifact
      // written well AFTER the verdict is an in-round-11 rerun of this
      // same round — it must be fenced out (falling back to r03), while
      // an artifact written together with the verdict (≤ the 10-min skew
      // tolerance) stays admitted
      java.nio.file.Files.writeString(dir.toPath.resolve("VERDICT.md"),
        "# VERDICT — round 11\n")
      assert(Bench.priorMedians(sf, dir) == Map("q01" -> 0.31, "x39" -> 11.51),
        "same-commit artifact at the fence round must stay admitted")
      val verdictMtime = new java.io.File(dir, "VERDICT.md").lastModified()
      java.nio.file.Files.setLastModifiedTime(dir.toPath.resolve("BENCH_r11.json"),
        java.nio.file.attribute.FileTime.fromMillis(verdictMtime + 11 * 60 * 1000L))
      assert(Bench.priorMedians(sf, dir) == Map("q01" -> 0.5, "x39" -> 7.77),
        "an artifact written after the verdict must be fenced out by mtime")
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete(); ()
    }
  }
}
