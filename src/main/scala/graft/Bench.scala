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

    val extractSec = results("e2e_extract")
    val docsPerSec = if (extractSec > 0) nDocs / extractSec else 0.0
    // the BASELINE.md floor applies only to the canonical config
    val canonical = cpus == "32" && replicate == 16
    val floorPass = !canonical || docsPerSec >= ThroughputFloor
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val repsJson = allReps.map { case (k, v) =>
      "\"" + k + "\":" + v.map(x => f"$x%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.values.sum
    val line =
      f"""{"metric":"extraction throughput + op latencies","value":$total%.3f,"unit":"sec","queries":$qs,"reps":$repsJson,"sf":"$sfDir","docs":$nDocs,"docs_per_sec":$docsPerSec%.1f,"cpus":$cpus,"timed_reps":$reps,"floor_docs_per_sec":$ThroughputFloor%.0f,"floor_applies":$canonical,"floor_pass":$floorPass}"""
    println(line)
    if (canonical)
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
