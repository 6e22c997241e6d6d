package ocrspark.text

import org.scalatest.funsuite.AnyFunSuite

/** Opt-in micro-profile of normalization sub-stages (GRAFT_PROFILE=1). */
class NormProfile extends AnyFunSuite {
  test("normalize sub-stage timing") {
    assume(sys.env.get("GRAFT_PROFILE").contains("1"))
    val body = ("Contenido legal de prueba con suficiente texto para " +
      "superar el umbral de extraccion directa en analisis. ") * 12
    val pdf = ocrspark.job.Synth.textPdfFor(8L, body * 4)
    val doc = ocrspark.parse.PdfExtract.parse(pdf).toOption.get
    val raw = doc.pages.map(_.text).mkString("\n")
    val legal = ocrspark.job.Synth.bodyFor(0L, body * 4)
    def time(label: String, n: Int)(f: => Any): Unit = {
      var i = 0; while (i < n / 5) { f; i += 1 }
      val t0 = System.nanoTime()
      i = 0; while (i < n) { f; i += 1 }
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e3 / n}%.1f us (len=${raw.length})")
    }
    time("corrections(raw)", 3000) { Normalize.applyCorrections(raw) }
    time("corrections(legal)", 3000) { Normalize.applyCorrections(legal) }
    time("full chain(raw)", 3000) { Normalize.normalizeLegal(raw) }
    time("cleanupTail(raw)", 3000) { Normalize.cleanupTail(raw) }
    // per-pattern cost over the raw text
    Normalize.patternTable.zipWithIndex.foreach { case ((p, r), i) =>
      val pat = java.util.regex.Pattern.compile(p,
        Normalize.UniFlags | java.util.regex.Pattern.MULTILINE)
      time(f"pat$i%02d ${p.take(24)}", 2000) { pat.matcher(raw).replaceAll(r) }
    }
  }
}
