package ocrspark.job

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the 100 TB design intent, pinned
  * (SURVEY.md §4): predicate pushdown + column pruning reach the parquet
  * scan, the extraction job adds exactly one exchange over a lake scan
  * (the bucket+salt repartition, AFTER map-side extraction), dimension
  * joins broadcast, and aggregations run partial (map-side) before
  * final. AQE is disabled in this suite only, so the static plan shape
  * is inspectable; production sessions keep it on. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  val sfDir = "/root/testdata/sf0.001"

  /** Pages as a parquet scan (the production shape: the lake table on
    * disk, not the in-session generator with its own exchange). */
  lazy val pagesParquet: org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("planspec_pages").toString
    Synth.pagesDF(spark, sfDir).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter+project pushes predicates and prunes columns at the scan") {
    // another suite may have .cache()d documents in the shared session —
    // pushdown is only visible on the real parquet scan
    spark.catalog.clearCache()
    val df = graft.SparkEntry.queries("p1_filter_project")(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThan(n_chars"), plan)
    // ReadSchema must NOT include the heavy text column
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), readSchema)
  }

  test("extraction over a lake scan: exactly one exchange, AFTER the extract UDF") {
    val df = ExtractJob.run(pagesParquet)
    val plan = planOf(df)
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges\n$plan")
    // map-side extraction: the UDF projection sits BELOW the exchange
    // (plan text is parent-first, so Exchange appears before UDF)
    assert(plan.indexOf("Exchange") < plan.indexOf("UDF(html"), plan)
    // and the exchange payload is pruned: no html binary crosses the wire
    val exchangeChild = plan.substring(plan.indexOf("Exchange"))
    val projLine = exchangeChild.linesIterator.drop(1).next()
    assert(!projLine.contains("html"), projLine)
  }

  test("analyze-only query over a lake scan runs with no shuffle at all") {
    val plan = planOf(ExtractJob.analyzeOnly(pagesParquet))
    assert(!plan.contains("Exchange"), plan)
  }

  test("dimension join broadcasts the small side") {
    val df = graft.SparkEntry.queries("j1_join_agg")(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("gated average aggregates partially before the shuffle") {
    val df = graft.SparkEntry.queries("a1_gated_avg")(spark, sfDir)
    val plan = planOf(df)
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate\n$plan")
  }

  test("whole-stage codegen covers the lake scan stage") {
    // simpleString marks whole-stage-codegen stages as "*(n)"
    val plan = planOf(ExtractJob.run(pagesParquet))
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }

  test("resume anti-join broadcasts the committed-lineage side") {
    import spark.implicits._
    val committed = Seq(1, 2, 3).toDF("bucket")
    val pages = pagesParquet.withColumn("bucket", ExtractJob.bucketCol(64))
    val todo = pages.join(
      org.apache.spark.sql.functions.broadcast(committed), Seq("bucket"), "left_anti")
    val plan = planOf(todo)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bucketed lake tables join with no shuffle and no sort") {
    // The 100 TB co-located-join story: two lake tables bucketed+sorted
    // by url join WITHOUT any Exchange (bucketing provides the hash
    // distribution) and WITHOUT a sort (one file per bucket, sortBy
    // honored at the scan). On a cluster this is the difference between
    // re-shuffling 100 TB per join and reading co-located splits.
    import spark.implicits._
    val whPath = java.nio.file.Files.createTempDirectory("planspec_wh")
    val wh = whPath.toString
    val a = pagesParquet.select($"url", $"lang")
    val b = pagesParquet.select($"url", org.apache.spark.sql.functions
      .octet_length($"html").as("n_bytes"))
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS ext_b")
    a.coalesce(1).write.format("parquet")
      .option("path", s"$wh/pages_b")
      .bucketBy(8, "url").sortBy("url").saveAsTable("pages_b")
    b.coalesce(1).write.format("parquet")
      .option("path", s"$wh/ext_b")
      .bucketBy(8, "url").sortBy("url").saveAsTable("ext_b")
    // force the shuffle-join path: at sf0.001 both sides fit under the
    // broadcast threshold, which would bypass bucketing entirely (and
    // at 100 TB neither fact table broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("pages_b").join(spark.table("ext_b"), Seq("url"))
      val plan = planOf(j)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.linesIterator.exists(l => l.trim.startsWith("+- Sort") ||
        l.trim.startsWith(":- Sort")), plan)
      assert(j.count() == a.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS pages_b")
      spark.sql("DROP TABLE IF EXISTS ext_b")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(whPath.toFile)
    }
  }

  test("ANN rank step is two-phase top-k: no per-query global window, partial agg before the shuffle") {
    // A `row_number over partitionBy(query_id)` window funnels a query's
    // ENTIRE scored set into one task — for brute force at 100 TB that is
    // the whole corpus through |queries| tasks. The two-phase shape keeps
    // a bounded top-k aggregator map-side, so the shuffle carries at most
    // k×partitions rows per query.
    import ocrspark.ops.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qids = Seq(0L, 1L, 2L)
    for ((name, df) <- Seq(
      "brute" -> Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 5),
      "lsh" -> Similarity.lshTopK(emb, "vec_id", "embedding", qids, 5),
      "ivf" -> Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 5))) {
      val plan = planOf(df)
      assert(!plan.contains("Window"), s"$name still ranks via a window\n$plan")
      // the udaf runs as ObjectHashAggregate/SortAggregate with a partial
      // (map-side) pass before the exchange
      val aggs = plan.linesIterator.count(l =>
        l.contains("ObjectHashAggregate") || l.contains("SortAggregate"))
      assert(aggs >= 2, s"$name: expected partial+final top-k aggregate\n$plan")
    }
  }

  test("LSH candidate generation has no self-join and no sort-merge join") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    // in-cap pairs explode inside the bounded bucket aggregation (no
    // self-join); the only joins allowed are (a) minhash's two
    // sketch-rescore hash joins and (b) the over-cap keeper-star join,
    // which must be a BROADCAST of the (tiny) keeper set — never a
    // sort-merge self-join of band rows
    val sim = planOf(ocrspark.ops.Dedup.simhashPairs(docs, "doc_id", "text"))
    assert(!sim.contains("SortMergeJoin"), sim)
    val simJoins = sim.linesIterator.count(_.contains("Join"))
    val simBcast = sim.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(simJoins == simBcast && simJoins <= 1,
      s"simhash may only have the broadcast keeper-star join\n$sim")
    val mh = planOf(ocrspark.ops.Dedup.minhashPairs(docs, "doc_id", "text"))
    assert(!mh.contains("SortMergeJoin"), mh)
    val joins = mh.linesIterator.count(_.contains("HashJoin"))
    assert(joins <= 3, s"expected ≤2 rescore + 1 keeper-star joins, got $joins\n$mh")
    assert(mh.linesIterator.exists(_.contains("BroadcastHashJoin")),
      s"keeper-star join must broadcast the keeper set\n$mh")
  }
}
