package ocrspark.model

import java.sql.Timestamp

/** Typed row models for the lake tables (FIXTURES.md §1; SURVEY.md §1.2). */

/** One row of the input lake table of Common-Crawl-style pages
  * (BASELINE.json `input_hint`, authoritative schema). */
case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String, // pre-extracted text when upstream provided it (nullable)
    lang: String)

/** One parsed page span produced by the PDF/HTML parse stage — plays the
  * role of `PdfReader.pages[i].extract_text()` + the per-page result
  * (reference app.py:542-548,627). `error` is null when extraction
  * succeeded. */
case class RawPage(page: Int, text: String, error: String)

/** Per-page processing result in the OCR-shaped path (reference
  * PageProcessingResult, app.py:542-548 minus wall-clock timing, which
  * is non-deterministic and lives in the metrics table instead). */
case class PageResult(page: Int, text: String, confidence: Double, error: String)

/** Analysis record driving the routing decision (reference
  * app.py:235-245). */
case class Analysis(
    has_text: Boolean,
    has_images: Boolean,
    text_length: Int,
    page_count: Int,
    text_density: Double,
    processing_recommendation: String,
    confidence: Double,
    sample_text: String,
    file_size_mb: Double)

/** One row of the `extracted` output table (FIXTURES.md §1.2; mirrors
  * reference metadata app.py:644-649,777-784). */
case class ExtractedRow(
    url: String,
    warc_ts: Timestamp,
    text: String,
    fields: Map[String, String],
    method: String,
    pages: Int,
    confidence: Double,
    processed_pages: Int,
    low_confidence_pages: Int,
    bucket: Int,
    error: String)

/** Per-partition lineage row (FIXTURES.md §1.3). */
case class LineageRow(
    bucket: Int,
    snapshot_id: Long,
    n_docs: Long,
    n_bytes: Long,
    committed_ts: Timestamp)

/** Counter row in the metrics table (FIXTURES.md §1.3) — the Spark analog
  * of the reference batch summary (app.py:1149-1163). */
case class MetricRow(snapshot_id: Long, stage: String, counter: String, value: Long)
