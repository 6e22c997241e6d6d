package ocrspark.job

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end extraction job over the `pages` lake table —
  * partitioning, skew handling, and the single-projection extraction
  * stage (SURVEY.md §3.1 Spark restatement, §4 O3-O5).
  *
  * Scale design (10^12 docs / 100 TB):
  *   - `bucket = pmod(xxhash64(url), nBuckets)` — explicit url-hash
  *     bucketing; the bucket is the unit of lineage + resume (north
  *     rule). nBuckets scales with cluster size, not data size per se
  *     (target ≈ 2-4 tasks per core at full fleet).
  *   - `salt = pmod(xxhash64(url, warc_ts), nSalts)` folded into the
  *     repartition key: per-row extraction cost varies ~100× between a
  *     5-page PDF and a nav-only HTML shell, and host-locality in crawl
  *     order makes byte-size per bucket skewed; the salt spreads each
  *     bucket across `nSalts` tasks while `partitionBy(bucket)` still
  *     lands files under one bucket dir for manifest commits.
  *   - AQE + skew-join stay enabled as belt-and-braces (session conf).
  *   - The extraction itself is ONE UDF projection: no intermediate
  *     wide rows, no exploded page shuffle — pages stay inside their
  *     document row (SURVEY.md §2.4 A4).
  */
object ExtractJob {

  val DefaultBuckets = 64
  val DefaultSalts = 8

  /** The extraction stage as a column over (html, text, lang,
    * force_ocr). */
  val extractUdf =
    udf((html: Array[Byte], text: String, lang: String, forceOcr: Boolean) =>
      Extract.extractDocument(html, text, lang, forceOcr))

  /** The `force_ocr` override column: present on the input table →
    * honored per row; absent → false (reference form param default,
    * app.py:906). */
  private def forceOcrCol(pages: DataFrame): Column =
    if (pages.columns.contains("force_ocr"))
      coalesce(col("force_ocr"), lit(false))
    else lit(false)

  def bucketCol(nBuckets: Int): Column =
    pmod(xxhash64(col("url")), lit(nBuckets)).cast("int")

  def saltCol(nSalts: Int): Column =
    pmod(xxhash64(col("url"), col("warc_ts")), lit(nSalts)).cast("int")

  /** pages(url, warc_ts, html, text, lang) → extracted table
    * (FIXTURES.md §1.2). `repartitionTasks` sizes the shuffle: pass
    * cores×2..4 locally; on a real cluster, executors×cores×2.
    *
    * Stage order matters at 100 TB: extraction runs in the SCAN stage
    * (map-side, before any exchange), so the one shuffle carries only
    * the extracted output (text + fields + metadata — typically ≪ raw
    * html payload), grouped by (bucket, salt) for the bucketed lineage
    * write. Per-task input balance comes from parquet split sizing
    * (`spark.sql.files.maxPartitionBytes`); the salt balances the write
    * so one hot bucket cannot serialize into one reducer. */
  def run(pages: DataFrame, nBuckets: Int = DefaultBuckets,
          nSalts: Int = DefaultSalts,
          repartitionTasks: Option[Int] = None): DataFrame = {
    val parts = repartitionTasks.getOrElse(
      pages.sparkSession.sessionState.conf.numShufflePartitions)
    pages
      .withColumn("r",
        extractUdf(col("html"), col("text"), col("lang"), forceOcrCol(pages)))
      .withColumn("bucket", bucketCol(nBuckets))
      .withColumn("salt", saltCol(nSalts))
      .select(
        col("url"), col("warc_ts"), col("lang"), col("bucket"), col("salt"),
        col("r.text").as("text"), col("r.fields").as("fields"),
        col("r.method").as("method"), col("r.pages").as("pages"),
        col("r.confidence").as("confidence"),
        col("r.processed_pages").as("processed_pages"),
        col("r.low_confidence_pages").as("low_confidence_pages"),
        col("r.route").as("route"),
        col("r.error").as("error"))
      .repartition(parts, col("bucket"), col("salt"))
      .drop("salt")
  }

  /** The routing-analysis-only stage as a column (cheap: 3-page PDF
    * sample, no normalize/fields — Extract.analyzeDocument). */
  val analyzeUdf =
    udf((html: Array[Byte], text: String, lang: String) =>
      Extract.analyzeDocument(html, text, lang))

  /** The /analyze-shaped metadata query (SURVEY.md §3.3): routing
    * analysis only, no extraction text in the output — demonstrates the
    * route being a composable column, and lets Parquet prune `html`
    * consumers downstream. Runs the DEDICATED analyze kernel (first-3-
    * pages sample, no normalization — app.py:258-286), not the full
    * extraction; the reference /analyze endpoint likewise has no
    * force_ocr parameter. */
  def analyzeOnly(pages: DataFrame): DataFrame = {
    pages
      .withColumn("r", analyzeUdf(col("html"), col("text"), col("lang")))
      .select(
        col("url"),
        col("r.route").as("route"),
        col("r.route_confidence").as("route_confidence"),
        col("r.has_text").as("has_text"),
        col("r.has_images").as("has_images"),
        col("r.text_length").as("text_length"),
        col("r.pages").as("pages"),
        col("r.text_density").as("text_density"))
  }

  /** Stage counters for the metrics table — the Spark analog of the
    * reference's batch summary (app.py:1146-1163). One tiny aggregate
    * row set; partial aggregation makes this map-side cheap. */
  def metrics(extracted: DataFrame): DataFrame = {
    extracted.agg(
      count(lit(1)).as("docs_in"),
      sum(when(col("error").isNull, 1L).otherwise(0L)).as("successful"),
      sum(when(col("error").isNotNull, 1L).otherwise(0L)).as("failed"),
      sum(when(col("route") === "text_extraction", 1L).otherwise(0L)).as("route_text"),
      sum(when(col("route") === "hybrid", 1L).otherwise(0L)).as("route_hybrid"),
      sum(when(col("route") === "ocr", 1L).otherwise(0L)).as("route_ocr"),
      sum(when(col("method") === Extract.MethodHtml, 1L).otherwise(0L)).as("route_html"),
      sum(col("pages").cast("long")).as("total_pages"),
      avg(col("confidence")).as("avg_confidence"))
  }
}
