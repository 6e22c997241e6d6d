package ocrspark.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One simulated executor: runs the extraction pipeline over its
  * file-shard of the pages table in its own JVM (own heap, own GC) —
  * the multi-executor unit [[ScalingBench]] launches 4× concurrently.
  * Args: shardIdx cores file1,file2,... (disjoint parquet files — no
  * redundant scan of other shards' data). Prints one line:
  * `SHARD <idx> <docs> <seconds>`. */
object ShardMain {
  def main(args: Array[String]): Unit = {
    val Array(shardIdxS, coresS, fileListS) = args
    val (shardIdx, cores) = (shardIdxS.toInt, coresS.toInt)
    val files = fileListS.split(",")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shard = spark.read.parquet(files: _*)
    def runOnce(): Long =
      ocrspark.job.ExtractJob.run(shard)
        .agg(sum(pmod(xxhash64(col("text"), col("method"), col("confidence")),
          lit(1000000007L))).as("h"), count(lit(1)).as("n"))
        .collect()(0).getAs[Long]("n")
    runOnce() // warm-up (JIT + cache)
    // min of 3 timed reps, GC between — the SAME statistic the
    // single-JVM side uses (runAt takes min of its reps); timing a
    // single rep here systematically biased the multi-JVM efficiency
    // down (one rep eats residual JIT + whatever GC debt the warm-up
    // left, and a fresh executor JVM has far less JIT maturity than
    // the long-lived bench JVM it is compared against)
    var n = 0L
    val sec = (1 to 3).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      n = runOnce()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"SHARD $shardIdx $n $sec%.3f")
    spark.stop()
  }
}
