package ocrspark.job

import org.scalatest.funsuite.AnyFunSuite

import ocrspark.model.RawPage
import ocrspark.parse.{PdfExtract, PdfWriter}
import ocrspark.route.Analyze
import ocrspark.text.{Confidence, PageAssembly}

class ExtractSpec extends AnyFunSuite {

  // ---- routing goldens (FIXTURES.md §4, app.py:288-297) -------------
  private def docWith(pageTexts: Seq[String], pageCount: Int,
                      images: Boolean): PdfExtract.Doc = {
    val pages = (1 to pageCount).map { i =>
      val t = if (i <= pageTexts.length) pageTexts(i - 1) else ""
      PdfExtract.Page(i, Vector.empty, t, hasImage = images && i <= 3, null)
    }.toVector
    PdfExtract.Doc(pageCount, pages)
  }

  test("routing: ≥800 chars, no images → text_extraction/0.9") {
    // one page of exactly 800 chars (after ws-normalize + concat/strip)
    val a = Analyze.analyzePdf(Right(docWith(Seq("x" * 800), 1, images = false)), 0.1)
    assert(a.text_length == 800)
    assert(a.processing_recommendation == "text_extraction")
    assert(a.confidence == 0.9)
    assert(a.has_text)
  }

  test("routing: 800 chars WITH images, density 800 → hybrid/0.7") {
    val a = Analyze.analyzePdf(Right(docWith(Seq("x" * 800), 1, images = true)), 0.1)
    assert(a.processing_recommendation == "hybrid")
    assert(a.confidence == 0.7)
  }

  test("routing: 799 chars, density ≤100 → ocr; density >100 → hybrid") {
    // 8 pages → density 799/8 ≈ 100 → ocr
    val low = Analyze.analyzePdf(Right(docWith(Seq("x" * 799), 8, images = false)), 0.1)
    assert(low.processing_recommendation == "ocr")
    assert(low.confidence == 0.8)
    // 1 page → density 799 > 100 → hybrid
    val hi = Analyze.analyzePdf(Right(docWith(Seq("x" * 799), 1, images = false)), 0.1)
    assert(hi.processing_recommendation == "hybrid")
  }

  test("routing: 199 chars high density → ocr (length gate)") {
    val a = Analyze.analyzePdf(Right(docWith(Seq("x" * 199), 1, images = false)), 0.1)
    assert(a.processing_recommendation == "ocr")
  }

  test("routing: exactly 200 chars, density must EXCEED 100") {
    // 2 pages → density 100.0 exactly → NOT hybrid
    val a = Analyze.analyzePdf(Right(docWith(Seq("x" * 200), 2, images = false)), 0.1)
    assert(a.processing_recommendation == "ocr")
  }

  test("routing: only first 3 pages sampled; density over full count") {
    // 4 pages × 300 chars each, but only 3 sampled → 300*3+2 spaces = 902
    val a = Analyze.analyzePdf(
      Right(docWith(Seq("x" * 300, "y" * 300, "z" * 300, "w" * 300), 4, images = false)), 0.1)
    assert(a.text_length == 902)
    assert(a.text_density == 902.0 / 4)
    assert(a.processing_recommendation == "text_extraction")
  }

  test("routing: parse failure → ocr with confidence 0.0") {
    val a = Analyze.analyzePdf(Left("boom"), 0.5)
    assert(a.processing_recommendation == "ocr")
    assert(a.confidence == 0.0)
    assert(a.file_size_mb == 0.5)
  }

  test("routing: has_text iff text_length > 50") {
    val a50 = Analyze.analyzePdf(Right(docWith(Seq("x" * 50), 1, images = false)), 0.1)
    assert(!a50.has_text)
    val a51 = Analyze.analyzePdf(Right(docWith(Seq("x" * 51), 1, images = false)), 0.1)
    assert(a51.has_text)
  }

  // ---- page assembly (FIXTURES.md §3) -------------------------------
  test("text path: blank page contributes nothing, failed page a placeholder") {
    val pages = Seq(
      RawPage(1, "uno", null),
      RawPage(2, "   \n ", null), // blank → skipped entirely
      RawPage(3, null, "broken stream"))
    val text = PageAssembly.assembleTextPath(pages, "es")
    assert(text ==
      "\n\n--- Página 1 de 3 ---\n\nuno" +
        "\n\n--- Página 3 de 3 ---\n\n[Error extrayendo texto de la página 3]")
  }

  test("OCR path: every page gets a separator; missing → no-procesada; error appends") {
    import ocrspark.model.PageResult
    val text = PageAssembly.assembleOcrPath(
      Seq(PageResult(1, "alpha", 80.0, null),
        PageResult(3, "gamma", 70.0, "worker died")), 3)
    assert(text ==
      "\n\n--- Página 1 de 3 ---\n\nalpha" +
        "\n\n--- Página 2 de 3 ---\n\n[Página no procesada]" +
        "\n\n--- Página 3 de 3 ---\n\ngamma\n[ERROR: worker died]")
  }

  test("confidence: >60 gate and max(1,n) guard; text path constant 95") {
    assert(Confidence.documentConfidence(Seq(80.0, 61.0, 60.0, 10.0)) ==
      ((80.0 + 61.0) / 2, 2))
    assert(Confidence.documentConfidence(Seq(10.0, 60.0)) == (0.0, 0))
    assert(Confidence.TextPathConfidence == 95.0)
    assert(Confidence.pageConfidence("", null) == 50.0)
    assert(Confidence.pageConfidence("abc", "err") == 0.0)
  }

  // ---- end-to-end per-row extraction --------------------------------
  private val longBody =
    ("Contenido legal de prueba con suficiente texto para superar el " +
      "umbral de extraccion directa. ") * 12 // > 800 chars

  test("e2e: text PDF routes text_extraction, normalizes, extracts fields") {
    val body = Synth.bodyFor(0L, longBody) // doc 0 gets legal header 0
    val pdf = Synth.textPdfFor(0L, body)
    val r = Extract.extractDocument(pdf, null, "es")
    assert(r.method == Extract.MethodText)
    assert(r.route == "text_extraction")
    assert(r.confidence == 95.0)
    assert(r.error == null)
    assert(r.text.startsWith("\n\n--- Página 1 de "))
    // normalization applied: MlNlSTERlO → MINISTERIO, PUBLICO → PÚBLICO
    assert(r.text.contains("MINISTERIO PÚBLICO"))
    assert(r.fields.get("carpeta_fiscal").contains("5006014504-2024-215-0"))
    assert(r.fields.get("imputado").contains("JUAN CARLOS QUISPE MAMANI"))
    assert(r.fields.get("delito").exists(_.startsWith("CONTRA EL PATRIMONIO")))
  }

  test("e2e: scanned PDF routes ocr/hybrid via advanced_ocr with separators") {
    val pdf = Synth.scannedPdfFor(16L, longBody)
    val r = Extract.extractDocument(pdf, null, "es")
    assert(r.method == Extract.MethodOcr)
    assert(Set("ocr", "hybrid").contains(r.route))
    assert(r.pages >= 1)
    (1 to r.pages).foreach { p =>
      assert(r.text.contains(s"--- Página $p de ${r.pages} ---"))
    }
    assert(r.low_confidence_pages == r.pages - r.processed_pages)
  }

  test("e2e: corrupt PDF yields a typed error row") {
    val r = Extract.extractDocument(Synth.corruptPdfFor(18L, longBody), null, "es")
    // either doc-level error or parsed-with-page-errors; never a throw
    assert(r.error != null || r.text.contains("[Error"))
  }

  test("e2e: HTML page extracts main content, drops boilerplate") {
    val r = Extract.extractDocument(Synth.htmlFor(7L, longBody), null, "es")
    assert(r.method == Extract.MethodHtml)
    assert(r.text.contains("Contenido legal de prueba"))
    assert(!r.text.contains("Sponsored"))
    assert(r.error == null)
  }

  test("e2e: image payload routes ocr with has_images, typed error, no mojibake") {
    Seq(Synth.imageFor(7L), Synth.imageFor(27L)).foreach { img =>
      val r = Extract.extractDocument(img, null, "es")
      assert(r.method == Extract.MethodOcr)
      assert(r.route == "ocr")
      assert(r.route_confidence == 0.8) // constant analysis, app.py:864-871
      assert(r.has_images && !r.has_text)
      assert(r.error != null)
      assert(r.text.isEmpty) // never parsed as HTML
    }
  }

  test("e2e: force_ocr sends a text-routed PDF down the OCR path") {
    val body = Synth.bodyFor(0L, longBody)
    val pdf = Synth.textPdfFor(0L, body)
    val normal = Extract.extractDocument(pdf, null, "es")
    assert(normal.method == Extract.MethodText) // would route text_extraction
    val forced = Extract.extractDocument(pdf, null, "es", forceOcr = true)
    assert(forced.method == Extract.MethodOcr)
    assert(forced.route == "ocr" && forced.route_confidence == 1.0)
    assert(forced.error == null)
    // OCR-shaped output: per-page separators + per-page confidence model
    assert(forced.text.contains("--- Página 1 de "))
    assert(forced.confidence != Confidence.TextPathConfidence)
    // same normalization corpus flows through: fields still extracted
    assert(forced.fields.get("carpeta_fiscal").contains("5006014504-2024-215-0"))
  }

  test("e2e: force_ocr wins over the upstream-text shortcut") {
    val body = Synth.bodyFor(0L, longBody)
    val pdf = Synth.textPdfFor(0L, body)
    // non-blank upstream text present: unforced takes the trusted path…
    val trusted = Extract.extractDocument(pdf, "texto precomputado", "es")
    assert(trusted.method == Extract.MethodUpstream)
    // …but forcing OCR means "the cached text is not to be trusted":
    // re-extract from the raw bytes
    val forced = Extract.extractDocument(pdf, "texto precomputado", "es",
      forceOcr = true)
    assert(forced.method == Extract.MethodOcr)
    assert(forced.route == "ocr" && forced.route_confidence == 1.0)
    assert(forced.text.contains("--- Página 1 de "))
  }

  test("e2e: force_ocr on a non-PDF payload fails like the reference OCR path") {
    val r = Extract.extractDocument(Synth.htmlFor(1L, longBody), null, "es",
      forceOcr = true)
    assert(r.method == Extract.MethodOcr && r.route == "ocr")
    assert(r.error != null)
    val img = Extract.extractDocument(Synth.imageFor(7L), null, "es",
      forceOcr = true)
    assert(img.error != null && img.has_images)
  }

  test("analyze fast path agrees with full extraction's routing columns") {
    // PDFs of every flavor: the 3-page-sample analyzer must produce the
    // exact routing values the full pipeline reports
    val pdfs = Seq(
      Synth.textPdfFor(0L, Synth.bodyFor(0L, longBody)),
      Synth.textPdfFor(8L, longBody * 4), // multi-page
      Synth.scannedPdfFor(16L, longBody),
      Synth.scannedPdfFor(17L, "corto"),
      Synth.corruptPdfFor(18L, longBody),
      Synth.corruptPdfFor(38L, longBody))
    pdfs.foreach { pdf =>
      val full = Extract.extractDocument(pdf, null, "es")
      val fast = Extract.analyzeDocument(pdf, null, "es")
      assert(fast.route == full.route)
      assert(fast.route_confidence == full.route_confidence)
      assert(fast.has_text == full.has_text)
      assert(fast.has_images == full.has_images)
      assert(fast.text_length == full.text_length)
      assert(fast.text_density == full.text_density)
      assert(fast.pages == full.pages)
    }
    // image: constant analysis dict
    val img = Extract.analyzeDocument(Synth.imageFor(7L), null, "es")
    assert(img.route == "ocr" && img.route_confidence == 0.8 && img.has_images)
    // html / upstream report their routes without running normalization
    assert(Extract.analyzeDocument(Synth.htmlFor(1L, longBody), null, "es")
      .route == "html_extraction")
    assert(Extract.analyzeDocument(null, "texto upstream", "es")
      .route == "upstream")
  }

  test("e2e: upstream text wins over html payload") {
    val r = Extract.extractDocument(Synth.htmlFor(19L, "ignored"),
      "texto  upstream\n\n\ncon espacios", "es")
    assert(r.method == Extract.MethodUpstream)
    assert(r.text == "TEXTO upstream con espacios".replace("TEXTO", "texto"))
    assert(r.confidence == 95.0)
  }

  test("e2e: null/empty payload → error result, no throw") {
    assert(Extract.extractDocument(null, null, "es").error != null)
    assert(Extract.extractDocument(Array.emptyByteArray, null, "es").error != null)
  }

  test("synth determinism: same doc_id → identical bytes") {
    val a = Synth.pageFor(123L, longBody, "es")
    val b = Synth.pageFor(123L, longBody, "es")
    assert(java.util.Arrays.equals(a.html, b.html))
    assert(a.url == b.url)
    assert(a.warc_ts == b.warc_ts)
  }

  test("synth: zipfian hosts are skewed") {
    val counts = (0L until 2000L).map(Synth.hostFor)
      .groupBy(identity).map(_._2.size)
    assert(counts.max > 5 * counts.min, s"max=${counts.max} min=${counts.min}")
  }
}
