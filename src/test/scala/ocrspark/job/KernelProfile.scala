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
  }
}
