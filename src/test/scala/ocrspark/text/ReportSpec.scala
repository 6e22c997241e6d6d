package ocrspark.text

import org.scalatest.funsuite.AnyFunSuite

/** Pins the markdown report template against a hand-mirrored expected
  * string (reference generate_markdown_report, app.py:1014-1054). */
class ReportSpec extends AnyFunSuite {

  test("full template: info section, ordered title-cased fields, fenced text") {
    val out = Report.markdown(
      filename = "123.pdf", method = "text_extraction_enhanced",
      pages = 3, confidence = 95.0, language = "spa", sizeMb = 0.02,
      fields = Seq("carpeta_fiscal" -> "5006014504-2024-215-0",
        "distrito_fiscal" -> "AREQUIPA"),
      text = "MINISTERIO PÚBLICO\nlinea dos",
      processedAt = java.time.Instant.parse("2024-01-01T00:02:03Z"))
    val expected =
      """# Procesamiento OCR - 123.pdf
        |
        |## Información del Procesamiento
        |- **Archivo**: 123.pdf
        |- **Método**: text_extraction_enhanced
        |- **Páginas**: 3
        |- **Tiempo**: 0.0s
        |- **Confianza**: 95.0%
        |- **Idioma**: spa
        |- **Tamaño**: 0.02MB
        |
        |## Campos Extraídos
        |
        |- **Carpeta Fiscal**: 5006014504-2024-215-0
        |- **Distrito Fiscal**: AREQUIPA
        |
        |## Contenido Extraído
        |
        |```
        |MINISTERIO PÚBLICO
        |linea dos
        |```
        |
        |---
        |*Procesado el 01/01/2024 00:02:03*""".stripMargin
    assert(out == expected)
  }

  test("no fields → section omitted entirely (app.py:1035)") {
    val out = Report.markdown("a.html", "html_extraction", 1, 50.0, "spa",
      0.0, Seq.empty, "texto", java.time.Instant.EPOCH)
    assert(!out.contains("Campos Extraídos"))
    assert(out.contains("## Contenido Extraído"))
  }

  test("titleCase mirrors Python .title() on snake keys") {
    assert(Report.titleCase("carpeta_fiscal") == "Carpeta Fiscal")
    assert(Report.titleCase("juez") == "Juez")
    assert(Report.titleCase("distrito_fiscal") == "Distrito Fiscal")
  }
}
