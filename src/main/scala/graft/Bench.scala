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
  * Methodology (uniform since round 2): every timed query gets one full
  * warm-up pass (C2 JIT of the kernels, plan/codegen cache) and a GC
  * before its single timed pass — steady-state numbers, which is what
  * matters on a long-running cluster.
  */
object Bench {

  def timed(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    // extraction UDF under count(). Warm-up is a FULL pass (C2 JIT of
    // the regex/parse kernels takes seconds and would pollute a single
    // timed rep), then GC debt is paid outside the timing.
    def forceAll(df: DataFrame): Long =
      df.agg(sum(pmod(xxhash64(col("text"), col("method"), col("confidence")), lit(1000000007L))).as("h"),
        count(lit(1)).as("n")).collect()(0).getAs[Long]("n")
    forceAll(ocrspark.job.ExtractJob.run(pages))
    System.gc()

    val (extractSec, nDocs) = timed {
      forceAll(ocrspark.job.ExtractJob.run(pages))
    }
    results += ("e2e_extract" -> extractSec)

    val (analyzeSec, _) = timed {
      ocrspark.job.ExtractJob.analyzeOnly(pages)
        .agg(sum(pmod(xxhash64(col("route"), col("text_length")), lit(1000000007L))).as("h"),
          count(lit(1)).as("n")).collect()
      0L
    }
    results += ("p5_routing" -> analyzeSec)

    // pure columnar-scan floor for the same payload column: any query
    // that must read `html` cannot beat this — contextualizes p5 (its
    // compute is analyze-kernel + this scan).
    val (scanSec, _) = timed {
      pages.agg(sum(pmod(xxhash64(octet_length(col("html"))), lit(1000000007L))).as("h"),
        count(lit(1)).as("n")).collect()
      0L
    }
    results += ("scan_floor" -> scanSec)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.cache().count()

    // uniform methodology for the remaining queries: one warm-up pass
    // (JIT + plan cache), GC, then the timed pass — same protocol the
    // extraction headline uses above.
    def warmTimed(name: String)(f: => Long): Unit = {
      f; System.gc()
      val (s, _) = timed(f)
      results += (name -> s)
    }

    warmTimed("t1_text_stats") {
      SparkEntry.queries("t1_text_stats")(spark, sfDir).count()
    }

    warmTimed("d2_minhash_pairs") {
      ocrspark.ops.Dedup.minhashPairs(
        ocrspark.ops.DedupCorpus.withPlantedDups(
          docs.select(col("doc_id"), col("text"), col("lang"))),
        "doc_id", "text", 0.7).count()
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
        ocrspark.ops.Dedup.minhashPairs(corpus, "doc_id", "text", 0.7).count()
      }
      val wm = ocrspark.ops.Dedup.minhashSketches(corpus, "doc_id", "text")
      val (d, _) = timed { wm.count() }
      val (e, _) = timed { ocrspark.ops.Dedup.minhashCandidates(wm).count() }
      System.err.println(
        f"[d2] corpus=$a%.2fs ($na docs) sketch=$b%.2fs full=$c%.2fs ($nc pairs) persist=$d%.2fs cand=$e%.2fs")
    }

    warmTimed("s2_cosine_topk") {
      SparkEntry.queries("s2_cosine_topk")(spark, sfDir).count()
    }

    Seq("q1_agg", "j1_join_agg", "a1_gated_avg", "w1_first_k").foreach { q =>
      warmTimed(q) { SparkEntry.queries(q)(spark, sfDir).count() }
    }

    val docsPerSec = if (extractSec > 0) nDocs / extractSec else 0.0
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    val line =
      f"""{"metric":"extraction throughput + op latencies","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","docs":$nDocs,"docs_per_sec":$docsPerSec%.1f,"cpus":$cpus}"""
    println(line)
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
