package ocrspark.text

import ocrspark.model.{PageResult, RawPage}

/** Ordered page reassembly with separators + error placeholders (F3/A4).
  *
  * Re-expresses `get_page_separator` (reference app.py:538-540) and the
  * two assembly shapes: the text path's skip-empty-pages loop
  * (app.py:625-635) and the OCR path's every-page fan-in
  * (app.py:753-765). Runs as a per-row fold over the page array — pages
  * never leave their document row, so assembly costs ZERO shuffle
  * (SURVEY.md §2.4 A4).
  */
object PageAssembly {

  /** `f"\n\n--- Página {page_num} de {total_pages} ---\n\n"` (app.py:540). */
  def separator(pageNum: Int, totalPages: Int): String =
    s"\n\n--- Página $pageNum de $totalPages ---\n\n"

  /** Text-extraction path (app.py:625-635): a page contributes
    * separator + normalized text iff its RAW text is non-blank (the gate
    * runs before correction); a failed page contributes separator +
    * error placeholder; blank pages contribute NOTHING (no separator).
    * The combined text is NOT stripped (reference keeps the leading
    * separator's "\n\n"). */
  def assembleTextPath(pages: Seq[RawPage], lang: String): String = {
    val total = pages.length
    val sb = new java.lang.StringBuilder
    pages.foreach { p =>
      if (p.error != null) {
        sb.append(separator(p.page, total))
        sb.append(s"[Error extrayendo texto de la página ${p.page}]")
      } else {
        val raw = if (p.text == null) "" else p.text
        if (Normalize.pyStrip(raw).nonEmpty) {
          sb.append(separator(p.page, total))
          sb.append(Normalize.normalize(raw, lang))
        }
      }
    }
    sb.toString
  }

  /** OCR-shaped path fan-in (app.py:753-765): EVERY page 1..N gets a
    * separator; a missing result renders "[Página no procesada]"; a
    * result carrying an error appends "\n[ERROR: {msg}]". Page texts
    * are already normalized (the reference corrects inside
    * perform_ocr_optimized, app.py:494). */
  def assembleOcrPath(results: Seq[PageResult], totalPages: Int): String = {
    val byPage = results.iterator.map(r => r.page -> r).toMap
    val sb = new java.lang.StringBuilder
    var p = 1
    while (p <= totalPages) {
      val r = byPage.getOrElse(p, PageResult(p, "[Página no procesada]", 0.0, null))
      sb.append(separator(p, totalPages))
      sb.append(if (r.text == null) "" else r.text)
      if (r.error != null) sb.append(s"\n[ERROR: ${r.error}]")
      p += 1
    }
    sb.toString
  }
}

/** Confidence model (A1/A3 + constants; reference app.py:491,647,735-775).
  *
  * The reference's page confidence comes from tesseract (external,
  * non-deterministic); our engine substitutes a deterministic per-page
  * score with the same downstream contract: the 50.0 fallback constant,
  * the >60.0 counting gate, the max(1,·)-guarded average, and the 95.0
  * text-path constant.
  */
object Confidence {
  /** Text-extraction path document confidence (app.py:647). */
  val TextPathConfidence = 95.0
  /** Fallback confidence when extraction yields nothing (app.py:491). */
  val FallbackConfidence = 50.0
  /** Pages count toward the average iff confidence > this (app.py:70). */
  val MinThreshold = 60.0

  /** Deterministic per-page confidence stand-in for the OCR-shaped path:
    * 0 on error; 50.0 (the reference's fallback constant) on blank text;
    * otherwise 55 + 42·alnumRatio capped at 97 — monotone in how
    * "clean" the page text is, so low-quality pages fall under the
    * 60.0 counting gate exactly like low-confidence OCR pages. */
  def pageConfidence(text: String, error: String): Double = {
    if (error != null) 0.0
    else if (text == null || Normalize.pyStrip(text).isEmpty) FallbackConfidence
    else {
      var alnum = 0
      var i = 0
      val n = text.length
      while (i < n) {
        if (Character.isLetterOrDigit(text.charAt(i))) alnum += 1
        i += 1
      }
      math.min(97.0, 55.0 + 42.0 * alnum / n)
    }
  }

  /** Document average over pages that pass the >60 gate, divide guarded
    * by max(1, count) (app.py:735-737,775). Returns
    * (avg, processedPages). */
  def documentConfidence(pageConfs: Seq[Double]): (Double, Int) = {
    var total = 0.0
    var n = 0
    pageConfs.foreach { c =>
      if (c > MinThreshold) { total += c; n += 1 }
    }
    (total / math.max(1, n), n)
  }
}
