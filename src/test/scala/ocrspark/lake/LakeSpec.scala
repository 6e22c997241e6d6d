package ocrspark.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import ocrspark.job.{ExtractJob, IncrementalExtract, Synth}

/** Snapshot-commit + resume semantics (north rule: resume from last
  * committed snapshot without recomputing finished partitions). */
class LakeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
  def freshTable(): LakeTable =
    new LakeTable(Files.createTempDirectory("lake").toString)

  lazy val pages = {
    val df = Synth.pagesDF(spark, sfDir)
    df.cache(); df.count(); df
  }

  test("full run commits snapshot 1; read() sees exactly the extracted rows") {
    val t = freshTable()
    val s = IncrementalExtract.run(spark, pages, t)
    assert(s.snapshotId == 1L)
    assert(!s.noop)
    assert(s.docsProcessed == 500L)
    assert(t.read(spark).count() == 500L)
    val lineage = t.lineage(spark)
    import spark.implicits._
    assert(lineage.agg(org.apache.spark.sql.functions.sum($"n_docs"))
      .as[Long].collect()(0) == 500L)
    assert(lineage.count() == s.bucketsWritten.toLong)
    // metrics counters written per stage per snapshot
    val m = t.metrics(spark)
    val counters = m.filter($"snapshot_id" === 1L && $"stage" === "extract")
      .select($"counter", $"value").as[(String, Long)].collect().toMap
    assert(counters("docs_in") == 500L)
    assert(counters("successful") + counters("failed") == 500L)
    assert(counters("buckets_written") == s.bucketsWritten.toLong)
  }

  test("re-run on a fully committed table is a no-op (idempotence)") {
    val t = freshTable()
    IncrementalExtract.run(spark, pages, t)
    val s2 = IncrementalExtract.run(spark, pages, t)
    assert(s2.noop)
    assert(t.currentSnapshotId.contains(1L))
    assert(t.read(spark).count() == 500L)
  }

  test("resume after partial commit touches ONLY uncommitted buckets") {
    import spark.implicits._
    val t = freshTable()
    val nB = ExtractJob.DefaultBuckets
    // first run: only buckets < 20 (simulated partial job)
    val partial = pages.filter(ExtractJob.bucketCol(nB) < 20)
    val s1 = IncrementalExtract.run(spark, partial, t)
    assert(t.committedBuckets.forall(_ < 20))
    val committedDocs = t.read(spark).count()

    // resume with FULL input
    val s2 = IncrementalExtract.run(spark, pages, t)
    assert(s2.snapshotId == 2L)
    // no recompute: processed docs == docs outside committed buckets
    assert(s2.docsProcessed == 500L - committedDocs)
    // provenance: buckets <20 still credited to snapshot 1
    val added = t.lineage(spark)
      .select($"bucket", $"snapshot_id").as[(Int, Long)].collect().toMap
    added.foreach { case (b, snap) =>
      assert(snap == (if (b < 20) 1L else 2L), s"bucket $b added=$snap")
    }
    assert(t.read(spark).count() == 500L)
    // byte-level equal to a one-shot run (same rows, same text)
    val oneShot = ExtractJob.run(pages)
    val diff = t.read(spark).select($"url", $"text")
      .join(oneShot.select($"url", $"text".as("t2")), Seq("url"), "full_outer")
      .filter(!($"text" <=> $"t2")).count()
    assert(diff == 0L)
  }

  test("uncommitted staged files are invisible to readers") {
    val t = freshTable()
    IncrementalExtract.run(spark, pages, t)
    // orphan staging dir (simulated crashed writer)
    val orphan = new java.io.File(t.stagingDir(99), "bucket=3")
    orphan.mkdirs()
    Files.write(new java.io.File(orphan, "junk.parquet").toPath,
      "not parquet".getBytes)
    assert(t.read(spark).count() == 500L)
    assert(t.currentSnapshotId.contains(1L))
  }

  test("commit chain: snapshots are monotone and parent-linked") {
    val t = freshTable()
    val s1 = IncrementalExtract.run(spark,
      pages.filter(ExtractJob.bucketCol(64) < 10), t)
    val s2 = IncrementalExtract.run(spark, pages, t)
    val snap2 = t.snapshot(2)
    assert(snap2.parent == 1L)
    assert(t.lineageHistory(spark).count() >=
      t.lineage(spark).count())
  }

  test("time travel: readAt(id) reproduces every historical snapshot") {
    import spark.implicits._
    val t = freshTable()
    val nB = ExtractJob.DefaultBuckets
    // data files don't carry the bucket column (it's the partition dir,
    // and read() loads explicit file lists) — re-derive it from url
    def withBucket(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("b", ExtractJob.bucketCol(nB))
    IncrementalExtract.run(spark, pages.filter(ExtractJob.bucketCol(nB) < 20), t)
    val snap1Docs = t.read(spark).count()
    IncrementalExtract.run(spark, pages, t)
    assert(t.read(spark).count() == 500L)
    // snapshot 1 is still exactly reproducible after snapshot 2 landed
    assert(t.readAt(spark, 1).count() == snap1Docs)
    assert(withBucket(t.readAt(spark, 1)).select($"b").distinct()
      .as[Int].collect().forall(_ < 20))
    assert(t.readAt(spark, 2).count() == 500L)
    // overwrite bucket 3 in snapshot 3 (one replacement row): current
    // read sees the replacement, readAt(2) still sees the original rows
    val bucket3Old = withBucket(t.read(spark)).filter($"b" === 3).count()
    assert(bucket3Old > 1L, "fixture needs a multi-row bucket 3")
    val staging = new java.io.File(t.stagingDir(3)).getPath
    withBucket(t.read(spark)).filter($"b" === 3).drop("b").limit(1)
      .write.parquet(s"$staging/bucket=3")
    val files = new java.io.File(s"$staging/bucket=3").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    t.commit(Seq(t.BucketEntry(3, files, nDocs = 1L, nBytes = 0L)))
    assert(withBucket(t.read(spark)).filter($"b" === 3).count() == 1L)
    assert(withBucket(t.readAt(spark, 2)).filter($"b" === 3).count() == bucket3Old)
    // history outside the overwritten bucket is shared, not duplicated
    assert(t.read(spark).count() == 500L - bucket3Old + 1L)
    intercept[IllegalArgumentException] { t.readAt(spark, 4) }
  }
}
