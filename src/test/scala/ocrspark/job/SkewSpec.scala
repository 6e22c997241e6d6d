package ocrspark.job

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling evidence (north rule: explicit salted repartitioning
  * for skewed hosts; SURVEY.md §4 O4-O5). The synthesized corpus has a
  * zipfian host distribution (top host ≈ 23% of traffic), so a
  * host-keyed repartition produces a dominant straggler partition; the
  * salt must demonstrably flatten it. */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  private def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Long =
    df.withColumn("pid", spark_partition_id())
      .groupBy(col("pid")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)

  test("zipfian hosts: salted repartition flattens the straggler partition") {
    val nParts = 16
    val pages = Synth.pagesDF(spark, sfDir)
      .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1))
      .cache()
    pages.count()

    // host distribution really is skewed
    val top = pages.groupBy(col("host")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(top > 100, s"top host only $top of 500 — synth skew too weak")

    val unsalted = maxPartitionRows(pages.repartition(nParts, col("host")))
    val salted = maxPartitionRows(pages.repartition(nParts, col("host"),
      pmod(xxhash64(col("url")), lit(8))))
    assert(salted * 2 <= unsalted,
      s"salting did not flatten skew: unsalted max=$unsalted salted max=$salted")
    pages.unpersist()
  }

  test("url-hash bucketing distributes rows evenly regardless of host skew") {
    val pages = Synth.pagesDF(spark, sfDir)
      .withColumn("bucket", ExtractJob.bucketCol(16))
    val counts = pages.groupBy(col("bucket")).count()
      .agg(max(col("count")).as("mx"), min(col("count")).as("mn")).collect()(0)
    // hash-uniform: max/min within a generous band at n=500
    assert(counts.getLong(0) < counts.getLong(1) * 4,
      s"bucket imbalance: max=${counts.getLong(0)} min=${counts.getLong(1)}")
  }
}
