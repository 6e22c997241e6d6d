package ocrspark.job

import org.scalatest.funsuite.AnyFunSuite

/** Throwaway micro-profile of the per-row kernels (not part of CI
  * assertions — prints timings; enabled via -Dgraft.profile=1). */
class KernelProfile extends AnyFunSuite {
  test("kernel timing breakdown") {
    assume(sys.env.get("GRAFT_PROFILE").contains("1"))
    val body = ("Contenido legal de prueba con suficiente texto para " +
      "superar el umbral de extraccion directa en analisis. ") * 12
    val kinds = Seq(
      ("html", Synth.htmlFor(1L, body)),
      ("textpdf", Synth.textPdfFor(8L, body * 4)),
      ("scanned", Synth.scannedPdfFor(16L, body)),
      ("corrupt", Synth.corruptPdfFor(38L, body)),
      ("image", Synth.imageFor(7L)))
    def time(label: String, n: Int)(f: => Unit): Unit = {
      var i = 0; while (i < n / 10) { f; i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0; while (i < n) { f; i += 1 }
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e3 / n}%.1f us/doc")
    }
    kinds.foreach { case (k, bytes) =>
      time(s"analyze/$k", 2000) { Extract.analyzeDocument(bytes, null, "es") }
      time(s"extract/$k", 2000) { Extract.extractDocument(bytes, null, "es") }
    }
    // stage-level breakdown of the extract kernel on a text PDF
    val pdf = Synth.textPdfFor(8L, body * 4)
    val doc = ocrspark.parse.PdfExtract.parse(pdf).toOption.get
    val rawText = doc.pages.map(_.text).mkString("\n")
    val norm = ocrspark.text.Normalize.normalize(rawText, "es")
    time("stage/pdf_parse", 2000) { ocrspark.parse.PdfExtract.parse(pdf) }
    time("stage/normalize", 2000) { ocrspark.text.Normalize.normalize(rawText, "es") }
    time("stage/fields", 2000) { ocrspark.text.Fields.extract(norm) }
    val html = Synth.htmlFor(1L, body)
    val htmlStr = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val arc = ocrspark.parse.HtmlExtract.extractMain(htmlStr)
    time("stage/arc90", 2000) { ocrspark.parse.HtmlExtract.extractMain(htmlStr) }
    time("stage/html_norm", 2000) { ocrspark.text.Normalize.normalize(arc.text, "es") }
    // compressed vs uncompressed PDF parse: how much is inflate?
    val lines = (body * 4).split('\n').toVector
    val spec = (0 until 4).map(p => ocrspark.parse.PdfWriter.PageSpec(
      Vector(lines.slice(p * 3, p * 3 + 3))))
    val pdfC = ocrspark.parse.PdfWriter.build(spec, compress = true)
    val pdfU = ocrspark.parse.PdfWriter.build(spec, compress = false)
    time("stage/parse_compressed", 2000) { ocrspark.parse.PdfExtract.parse(pdfC) }
    time("stage/parse_plain", 2000) { ocrspark.parse.PdfExtract.parse(pdfU) }
  }
}
