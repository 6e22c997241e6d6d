package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import ocrspark.text.{Fields, Normalize}

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` holds DuckDB-runnable ANSI SQL for every SQL-expressible
  * query (UDF-based text operators are covered by the golden byte-identity
  * suite instead and get the driver's rows-only check).
  */
object SparkEntry {

  // --- shared UDFs (registered lazily per call; Spark caches) ----------
  private val normalizeUdf = udf((text: String, lang: String) => Normalize.normalize(text, lang))
  private val extractFieldsUdf = udf((text: String) => Fields.extract(text))

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * normalize + field-extract over the documents table (the minimum
    * end-to-end slice of SURVEY.md §7.3 step 1). */
  def entry(spark: SparkSession): DataFrame =
    queries("f1_normalize_extract")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1+F2: the byte-identity text engine over the documents table.
    // Not SQL-expressible (24 regex passes + quirk semantics) → golden
    // suite is the oracle; driver records rows-only.
    "f1_normalize_extract" -> ((s, dir) => {
      docs(s, dir)
        .select(
          col("doc_id"),
          normalizeUdf(col("text"), col("lang")).as("text_norm"),
          extractFieldsUdf(normalizeUdf(col("text"), col("lang"))).as("fields"))
        .orderBy(col("doc_id"))
    }),

    // P1-P4-shaped filter/projection with pushdown: long Spanish/English
    // docs only, projecting two columns (scan must prune columns).
    "p1_filter_project" -> ((s, dir) => {
      docs(s, dir)
        .filter(col("lang").isin("es", "en") && col("n_chars") > lit(500))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // S1+P5+P6+F1-F3+A1-A6: the flagship end-to-end extraction pipeline
    // over the synthesized Common-Crawl-style pages table (FIXTURES.md
    // §1.1). Route → parse → normalize → assemble → fields → confidence.
    // Rows-only check (byte identity is the golden suite's job).
    "e2e_extract" -> ((s, dir) => {
      ocrspark.job.ExtractJob
        .run(ocrspark.job.Synth.pagesDF(s, dir))
        .drop("warc_ts") // timestamp not comparable across writers
        .orderBy(col("url"))
    }),

    // P5/§3.3: the /analyze-shaped metadata query — routing analysis as a
    // composable column, no extraction output.
    "p5_routing" -> ((s, dir) => {
      ocrspark.job.ExtractJob
        .analyzeOnly(ocrspark.job.Synth.pagesDF(s, dir))
        .orderBy(col("url"))
    }),

    // A5: batch summary counters (the reference's resumen_lote analog).
    "a5_batch_summary" -> ((s, dir) => {
      ocrspark.job.ExtractJob
        .metrics(ocrspark.job.ExtractJob.run(ocrspark.job.Synth.pagesDF(s, dir)))
        .withColumn("avg_confidence", round(col("avg_confidence"), 4))
    }),

    // A1: the confidence-average aggregation shape (sum over a >60 gate,
    // max(1,count) guarded divide) on the events table — SQL-expressible,
    // DuckDB-verified.
    "a1_gated_avg" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"))
        .agg(
          round(
            sum(when(col("value") > 60.0, col("value")).otherwise(lit(0.0))) /
              greatest(lit(1L), count(when(col("value") > 60.0, lit(1)))),
            4).as("gated_avg"),
          count(when(col("value") > 60.0, lit(1))).as("n_over"))
        .orderBy(col("event_type"))
    }),

    // W1-analog: first-k per group via row_number window (the reference's
    // first-3-pages sampling shape) — earliest 3 events per type.
    "w1_first_k" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("event_type"), col("event_id"), col("rn"))
        .orderBy(col("event_type"), col("rn"))
    }),

    // O12: snapshot-commit + resume — partial run (buckets <20), then a
    // resumed full run; output is the final lineage. Deterministic:
    // bucket provenance must show snapshot 1 for <20 and 2 for the rest.
    "o12_resume_lineage" -> ((s, dir) => {
      val table = new ocrspark.lake.LakeTable(
        java.nio.file.Files.createTempDirectory("graft_lake").toString)
      val pages = ocrspark.job.Synth.pagesDF(s, dir)
      ocrspark.job.IncrementalExtract.run(s,
        pages.filter(ocrspark.job.ExtractJob.bucketCol(64) < 20), table)
      ocrspark.job.IncrementalExtract.run(s, pages, table)
      table.lineage(s)
        .select(col("bucket"), col("snapshot_id"), col("n_docs"))
        .orderBy(col("bucket"))
    }),

    // J1: broadcast-dim equi-join + aggregation (diff-join machinery
    // building block, SURVEY.md §2.3): revenue per customer market segment.
    "j1_join_agg" -> ((s, dir) => {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      orders.join(broadcast(cust),
          orders("o_custkey") === cust("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),
  )

  /** DuckDB oracle SQL per query (column names MUST match the Spark
    * result — the driver sorts columns by name and hashes values). */
  def oracleSql: Map[String, String] = Map(
    "p1_filter_project" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang IN ('es','en') AND n_chars > 500
        |ORDER BY doc_id""".stripMargin,
    "a1_gated_avg" ->
      """SELECT event_type,
        |  ROUND(SUM(CASE WHEN value > 60.0 THEN value ELSE 0.0 END)
        |        / GREATEST(1, COUNT(CASE WHEN value > 60.0 THEN 1 END)), 4)
        |    AS gated_avg,
        |  COUNT(CASE WHEN value > 60.0 THEN 1 END) AS n_over
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "w1_first_k" ->
      """SELECT event_type, event_id, rn FROM (
        |  SELECT event_type, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,
    "j1_join_agg" ->
      """SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
