package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-run benchmark: one JSON line with per-query seconds plus
  * extraction throughput (docs/sec) — BENCH_r{N}.json vs BASELINE.md.
  *
  * The headline number is the end-to-end extraction pipeline over a
  * MATERIALIZED pages table (route→parse→normalize→assemble→fields),
  * i.e. the 100 TB-scale hot path reading columnar storage; synthesis
  * cost is reported separately as `synth_pages` and excluded from
  * throughput.
  *
  * Methodology (hardened round 3): every timed query gets one full
  * warm-up pass (C2 JIT of the kernels, plan/codegen cache), then a GC,
  * then THREE timed reps; the reported number is the MEDIAN and the
  * JSON carries all reps (`"reps"`) so spread is visible. Round 2's
  * single timed pass let one noisy host window record a phantom 2.3×
  * regression (BENCH_r02 e2e 4.71 s vs 1.76 s on re-run); the median
  * of 3 cannot be poisoned by one bad window.
  *
  * The JSON also reports the absolute throughput floor from BASELINE.md
  * (quiet-host median ≥ 35k docs/s at local[32]/80k docs) as
  * `floor_pass` so a regression trips a number, not a vibe.
  */
object Bench {

  val TimedReps = 3

  /** Throughput floor (docs/sec) pinned in BASELINE.md — applies to the
    * canonical config only (local[32], 80k-doc corpus). */
  val ThroughputFloor = 35000.0

  // ---- in-run noise canary -------------------------------------------
  // Round 3 recorded a phantom floor FAIL (20.8k docs/s) from a loaded
  // host window that all three median reps shared; clean re-runs measure
  // 60-68k. Median-of-N cannot defend against WINDOW-level contamination,
  // so the bench now times a fixed constant-work CPU canary before and
  // after the suite, compares it to the pinned quiet-host reference, and
  // (a) sleep-retries a noisy window before starting, (b) marks the JSON
  // `window_contaminated` when either measurement exceeds the threshold —
  // the floor verdict is then explicitly not applicable instead of a
  // false FAIL.

  /** Canary thread count: pinned (NOT availableProcessors) so the quiet
    * reference below stays comparable across configs. */
  val CanaryThreads = 32
  val CanaryIters = 400000000L // xorshift steps per thread
  /** Quiet-host wall seconds for ONE canary rep (calibrated on the
    * canonical 32-core host at 1-min load < 0.5; see BASELINE.md).
    * Individual reps scatter ±50% even on a quiet shared VM, so every
    * MEASUREMENT is the median of [[CanaryReps]] reps. */
  val CanaryQuietSec = 0.95
  val CanaryReps = 5
  /** canary/quiet ratio above which the window counts as contaminated. */
  val NoiseThreshold = 1.5
  val MaxNoiseRetries = 4

  /** One canary measurement = median of [[CanaryReps]] fixed-work runs. */
  def canaryMeasure(): Double =
    median((1 to CanaryReps).map(_ => canarySeconds()))

  private val canarySink = new java.util.concurrent.atomic.AtomicLong()

  /** Fixed-work CPU canary: `threads` xorshift loops run to completion;
    * returns wall seconds. Pure arithmetic — no Spark, no allocation —
    * so the only variable is host CPU contention. */
  def canarySeconds(threads: Int = CanaryThreads,
                    iters: Long = CanaryIters): Double = {
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + t
        var i = 0L
        while (i < iters) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          i += 1
        }
        canarySink.addAndGet(x) // sink: loop cannot be eliminated
      })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start())
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def timed(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", TimedReps.toString).toInt
    val maxNoiseRetries = sys.env.getOrElse("SPARK_GRAFT_NOISE_RETRIES",
      MaxNoiseRetries.toString).toInt

    // canary warm-up (JIT the loop), then the pre-suite measurement;
    // a noisy window gets bounded sleep-and-retry before any timing
    canarySeconds(iters = CanaryIters / 20)
    if (sys.env.contains("SPARK_GRAFT_CANARY_ONLY")) {
      val cs = (1 to 7).map(_ => canarySeconds())
      println(cs.map(c => f"$c%.3f").mkString("reps=[", ",", "]") +
        f" median=${median(cs)}%.3f noise=${median(cs) / CanaryQuietSec}%.2f")
      return
    }
    // the canary reference (CanaryQuietSec) is calibrated for the
    // canonical 32-core host: on a weaker box the fixed 32-thread
    // workload is slower on a PERFECTLY quiet host, so retrying and
    // flagging there would misreport — noise factors are still
    // reported, but the retry loop and the contaminated verdict only
    // engage on the canonical config (where the floor applies)
    val canonicalHost = cpus == "32"
    var canaryPre = canaryMeasure()
    var noiseRetries = 0
    while (canonicalHost && canaryPre / CanaryQuietSec > NoiseThreshold &&
           noiseRetries < maxNoiseRetries) {
      System.err.println(
        f"[bench] noisy window (canary ${canaryPre}%.2fs = " +
          f"${canaryPre / CanaryQuietSec}%.1fx quiet) — sleeping 15s " +
          f"(retry ${noiseRetries + 1}/$maxNoiseRetries)")
      Thread.sleep(15000)
      canaryPre = canaryMeasure()
      noiseRetries += 1
    }

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val allReps = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()

    // uniform protocol: one full warm-up pass (JIT + plan/codegen
    // cache), GC, then `reps` timed passes → median. Returns the count
    // from the last rep.
    def warmTimed(name: String)(f: => Long): Long = {
      f; System.gc()
      var n = 0L
      val times = (1 to reps).map { _ =>
        val (s, nn) = timed(f)
        n = nn
        s
      }
      results += (name -> median(times))
      allReps += (name -> times)
      n
    }

    // materialize the pages table once (read-side benches then measure
    // columnar-scan + compute, not generator cost)
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "16").toInt
    val (synthSec, _) = timed {
      ocrspark.job.Synth.ensurePages(spark, sfDir, replicate = replicate); 0L
    }
    results += ("synth_pages" -> synthSec)
    val pagesPath = ocrspark.job.Synth.ensurePages(spark, sfDir, replicate = replicate)
    val pages = spark.read.parquet(pagesPath)

    // forceAll: hash result columns so Catalyst cannot prune the
    // extraction UDF under count().
    def forceAll(df: DataFrame): Long =
      df.agg(sum(pmod(xxhash64(col("text"), col("method"), col("confidence")), lit(1000000007L))).as("h"),
        count(lit(1)).as("n")).collect()(0).getAs[Long]("n")

    val nDocs = warmTimed("e2e_extract") {
      forceAll(ocrspark.job.ExtractJob.run(pages))
    }

    warmTimed("p5_routing") {
      ocrspark.job.ExtractJob.analyzeOnly(pages)
        .agg(sum(pmod(xxhash64(col("route"), col("text_length")), lit(1000000007L))).as("h"),
          count(lit(1)).as("n")).collect()
      0L
    }

    // pure columnar-scan floor for the same payload column: any query
    // that must read `html` cannot beat this — contextualizes p5 (its
    // compute is analyze-kernel + this scan).
    warmTimed("scan_floor") {
      pages.agg(sum(pmod(xxhash64(octet_length(col("html"))), lit(1000000007L))).as("h"),
        count(lit(1)).as("n")).collect()
      0L
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.cache().count()

    warmTimed("t1_text_stats") {
      SparkEntry.queries("t1_text_stats")(spark, sfDir).count()
    }

    // loan-pattern dedup run: sketches persisted for the double scan,
    // unpersisted before returning — no cached copies accumulate across
    // the warm-up + reps (r2 leaked one persist per call).
    warmTimed("d2_minhash_pairs") {
      ocrspark.ops.Dedup.minhashPairsCompute(
        ocrspark.ops.DedupCorpus.withPlantedDups(
          docs.select(col("doc_id"), col("text"), col("lang"))),
        "doc_id", "text", 0.7)(_.count())
    }

    if (sys.env.contains("SPARK_GRAFT_D2_BREAKDOWN")) {
      val corpus = ocrspark.ops.DedupCorpus.withPlantedDups(
        docs.select(col("doc_id"), col("text"), col("lang")))
      val (a, na) = timed { corpus.count() }
      val (b, _) = timed {
        corpus.select(ocrspark.ops.Dedup.minhash(col("text")).as("mh"))
          .agg(count(lit(1))).collect(); 0L
      }
      val (c, nc) = timed {
        ocrspark.ops.Dedup.minhashPairsCompute(corpus, "doc_id", "text", 0.7)(_.count())
      }
      val wm = ocrspark.ops.Dedup.minhashSketches(corpus, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (d, _) = timed { wm.count() }
      val (e, _) = timed { ocrspark.ops.Dedup.minhashCandidates(wm).count() }
      wm.unpersist(blocking = true)
      System.err.println(
        f"[d2] corpus=$a%.2fs ($na docs) sketch=$b%.2fs full=$c%.2fs ($nc pairs) persist=$d%.2fs cand=$e%.2fs")
    }

    warmTimed("s2_cosine_topk") {
      SparkEntry.queries("s2_cosine_topk")(spark, sfDir).count()
    }

    Seq("q1_agg", "j1_join_agg", "a1_gated_avg", "w1_first_k",
      "t4_token_histogram", "j2_asof_join", "j3_range_context").foreach { q =>
      warmTimed(q) { SparkEntry.queries(q)(spark, sfDir).count() }
    }

    // post-suite canary: contamination arriving MID-suite is caught here
    val canaryPost = canaryMeasure()
    val noisePre = canaryPre / CanaryQuietSec
    val noisePost = canaryPost / CanaryQuietSec
    val contaminated = canonicalHost &&
      (noisePre > NoiseThreshold || noisePost > NoiseThreshold)

    val extractSec = results("e2e_extract")
    val docsPerSec = if (extractSec > 0) nDocs / extractSec else 0.0
    // the BASELINE.md floor applies only to the canonical config
    // (local[32], replicate 16 → the 80k-doc corpus) measured in a CLEAN
    // window — a contaminated window's numbers are explicitly
    // non-adjudicable rather than a phantom FAIL
    val canonical = cpus == "32" && replicate == 16 && nDocs == 80000
    val floorApplies = canonical && !contaminated
    val floorPass = !floorApplies || docsPerSec >= ThroughputFloor
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val repsJson = allReps.map { case (k, v) =>
      "\"" + k + "\":" + v.map(x => f"$x%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.values.sum
    val line =
      f"""{"metric":"extraction throughput + op latencies","value":$total%.3f,"unit":"sec","queries":$qs,"reps":$repsJson,"sf":"$sfDir","docs":$nDocs,"docs_per_sec":$docsPerSec%.1f,"cpus":$cpus,"timed_reps":$reps,"canary_quiet_sec":$CanaryQuietSec%.3f,"canary_pre_sec":$canaryPre%.3f,"canary_post_sec":$canaryPost%.3f,"noise_factor_pre":$noisePre%.2f,"noise_factor_post":$noisePost%.2f,"noise_retries":$noiseRetries,"window_contaminated":$contaminated,"floor_docs_per_sec":$ThroughputFloor%.0f,"floor_applies":$floorApplies,"floor_pass":$floorPass}"""
    println(line)
    if (contaminated)
      System.err.println(
        f"[bench] WINDOW CONTAMINATED (canary pre ${noisePre}%.2fx / post " +
          f"${noisePost}%.2fx quiet) — throughput numbers not adjudicable")
    else if (canonical)
      System.err.println(
        f"[bench] throughput floor (BASELINE.md): $docsPerSec%.0f docs/s vs ≥$ThroughputFloor%.0f → ${if (floorPass) "PASS" else "FAIL"}")
    // sbt's logger prefixes forked stdout with [info], which broke the
    // driver's JSON parse in r1 — also land the line in a bare file.
    try {
      val benchDir = new java.io.File("BENCH")
      benchDir.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(benchDir, "last_bench.json").toPath, line + "\n")
    } catch { case _: Exception => () }
    spark.stop()
  }
}
