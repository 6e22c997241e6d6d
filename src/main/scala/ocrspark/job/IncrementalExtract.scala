package ocrspark.job

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import ocrspark.lake.LakeTable

/** Resume-aware incremental extraction (north rule: "resumes from the
  * last committed snapshot without recomputing finished partitions").
  *
  * Mechanics (SURVEY.md §2.3, §2.8, §4 O12):
  *   1. input partitions = url-hash buckets;
  *   2. LEFT ANTI join input buckets against the committed lineage of
  *      the current snapshot (broadcast — lineage is tiny);
  *   3. extract only the remaining buckets;
  *   4. stage files under data/snap-(next)/bucket=N via partitionBy;
  *   5. commit manifest + flip the _current pointer atomically.
  * A crash before (5) leaves staged files invisible to readers; rerun
  * re-stages only uncommitted buckets. Re-running a fully committed
  * table is a no-op (idempotence).
  */
object IncrementalExtract {

  case class Summary(snapshotId: Long, bucketsWritten: Int,
                     docsProcessed: Long, skippedBuckets: Int,
                     noop: Boolean)

  def run(spark: SparkSession, pages: DataFrame, table: LakeTable,
          nBuckets: Int = ExtractJob.DefaultBuckets,
          nSalts: Int = ExtractJob.DefaultSalts): Summary = {
    val committed = table.committedBuckets
    val bucketed = pages.withColumn("bucket", ExtractJob.bucketCol(nBuckets))

    // resume anti-join: input buckets minus committed lineage buckets
    val todo =
      if (committed.isEmpty) bucketed
      else {
        import spark.implicits._
        val committedDf = committed.toSeq.toDF("bucket")
        bucketed.join(broadcast(committedDf), Seq("bucket"), "left_anti")
      }

    val nextId = table.nextSnapshotId
    val staging = table.stagingDir(nextId)
    val extracted = ExtractJob.run(todo, nBuckets, nSalts)
    extracted.write.mode("overwrite").partitionBy("bucket").parquet(staging)

    // Per-bucket stats from the staged parquet (metadata-only count +
    // on-disk bytes) — never recomputes the pipeline.
    val staged = LakeTable.stagedEntries(staging)
    if (staged.isEmpty) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
      return Summary(table.currentSnapshotId.getOrElse(0L), 0, 0L,
        committed.size, noop = true)
    }
    // ONE job for all per-bucket counts (bucket is the partition column,
    // so this reads footer metadata + directory names only) — a per-
    // bucket count() loop would be a driver-serial bottleneck at 100k
    // buckets.
    val counts = spark.read.parquet(staging)
      .groupBy(col("bucket")).count()
      .collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("count"))
      .toMap
    val entries = staged.map { case (b, files) =>
      table.BucketEntry(b, files.map(_.getAbsolutePath),
        counts.getOrElse(b, 0L), files.map(_.length()).sum)
    }
    val snap = table.commit(entries)

    // per-stage counters into the metrics table (north rule: every
    // stage emits lineage rows plus counters). Computed from the staged
    // parquet with column pruning — text is never rescanned.
    val m = ExtractJob.metrics(spark.read.parquet(staging)).collect()(0)
    table.writeMetrics(spark, snap, "extract", Seq(
      "docs_in" -> m.getAs[Long]("docs_in"),
      "successful" -> m.getAs[Long]("successful"),
      "failed" -> m.getAs[Long]("failed"),
      "route_text" -> m.getAs[Long]("route_text"),
      "route_hybrid" -> m.getAs[Long]("route_hybrid"),
      "route_ocr" -> m.getAs[Long]("route_ocr"),
      "route_html" -> m.getAs[Long]("route_html"),
      "total_pages" -> m.getAs[Long]("total_pages"),
      "buckets_written" -> entries.size.toLong,
      "buckets_skipped" -> committed.size.toLong))

    Summary(snap, entries.size, entries.map(_.nDocs).sum, committed.size,
      noop = false)
  }
}
