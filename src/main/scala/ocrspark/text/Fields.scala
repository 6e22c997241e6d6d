package ocrspark.text

import java.util.regex.{Matcher, Pattern}
import scala.collection.immutable.ListMap

/** Key-field extraction for Peruvian legal documents (F2).
  *
  * Re-expresses `extract_peruvian_legal_fields` and its pattern table
  * (reference `/root/reference/app.py:147-201,505-533`): 12 fields, per
  * field an ordered pattern list where the FIRST match with a non-empty
  * cleaned value wins; value = group(1) when any group matched, else the
  * whole match (quirks 7/9 of SURVEY.md §2.7); keys are absent (not
  * null/empty) when nothing matched — hence a Map, not a struct.
  *
  * Python fidelity: patterns compiled `re.I` ⇒ Java
  * `CASE_INSENSITIVE|UNICODE_CASE|UNICODE_CHARACTER_CLASS`;
  * `match.lastindex` ⇒ highest non-null Java group; value cleanup is
  * `\s+`→' ', trailing `[|#]+` strip, Python-strip.
  */
object Fields {

  /** Field → ordered pattern sources (reference app.py:147-201). */
  val fieldPatterns: Vector[(String, Vector[String])] = Vector(
    "carpeta_fiscal" -> Vector(
      """CARPETA\s+FISCAL[:\s]*(\d{10}-\d{4}-\d{1,3}-\d{1,2})""",
      """CARPETA\s+FlSCAL[:\s]*(\d{10}-\d{4}-\d{1,3}-\d{1,2})""",
    ),
    "expediente" -> Vector(
      """EXP(?:EDIENTE)?\.?\s*N[°º]?\s*[:\s]*(\d{4,5}-\d{4}-\d{1,3}-\w{2,4}-\w{2})""",
      """EXP(?:EDlENTE)?\.?\s*N[°º]?\s*[:\s]*(\d{4,5}-\d{4}-\d{1,3}-\w{2,4}-\w{2})""",
    ),
    // group(2) — the office name — is captured but discarded (quirk 7)
    "fiscalia" -> Vector(
      """FISCALÍA\s+(PROVINCIAL|SUPERIOR|SUPREMA)\s+(.+?)(?:DISTRITO|$)""",
      """FlSCALÍA\s+(PROVlNClAL|SUPERlOR|SUPREMA)\s+(.+?)(?:DlSTRlTO|$)""",
    ),
    "distrito_fiscal" -> Vector(
      """DISTRITO\s+FISCAL\s+DE\s+([A-ZÁÉÍÓÚÑ\s]+)""",
      """DlSTRlTO\s+FlSCAL\s+DE\s+([A-ZÁÉÍÓÚÑ\s]+)""",
    ),
    "delito" -> Vector(
      """DELITO[:\s]+(.+?)(?:\n|$)""",
      """DELlTO[:\s]+(.+?)(?:\n|$)""",
      """CONTRA\s+EL\s+(PATRIMONIO|HONOR|VIDA)""",
      """USURPACIÓN""", // no groups → group(0) (quirk 9)
      """APROPIACIÓN\s+ILÍCITA""",
    ),
    "imputado" -> Vector(
      """IMPUTADO[:\s]+([A-ZÁÉÍÓÚÑ\s,]+?)(?:\n|DELITO|AGRAVIADO)""",
      """lMPUTADO[:\s]+([A-ZÁÉÍÓÚÑ\s,]+?)(?:\n|DELlTO|AGRAVlADO)""",
      """INVESTIGADO[:\s]+([A-ZÁÉÍÓÚÑ\s,]+?)(?:\n|DELITO|AGRAVIADO)""",
    ),
    "agraviado" -> Vector(
      """AGRAVIADO[:\s]+([A-ZÁÉÍÓÚÑ\s,]+?)(?:\n|DELITO|IMPUTADO)""",
      """AGRAVlADO[:\s]+([A-ZÁÉÍÓÚÑ\s,]+?)(?:\n|DELlTO|lMPUTADO)""",
    ),
    // long-form date stores group(1) = just the day (quirk 8)
    "fecha" -> Vector(
      """(\d{1,2})\s+de\s+(\w+)\s+del?\s+(\d{4})""",
      """FECHA[:\s]+(\d{1,2}[/-]\d{1,2}[/-]\d{4})""",
      """(\d{1,2})[/-](\d{1,2})[/-](\d{4})""",
    ),
    "resolucion" -> Vector(
      """RESOLUCIÓN\s*N[°º]?\s*(\d+[-\s]?\d*)""",
      """RESOLUCION\s*N[°º]?\s*(\d+[-\s]?\d*)""",
    ),
    "juzgado" -> Vector(
      """JUZGADO\s+([A-ZÁÉÍÓÚÑ\s]+?)(?:DE|$)""",
      """JUZGADO\s+PENAL\s+([A-ZÁÉÍÓÚÑ\s\d]+)""",
    ),
    "juez" -> Vector(
      """JUE[ZS][:\s]+([A-ZÁÉÍÓÚÑ\s]+?)(?:\n|$)""",
      """MAGISTRADO[:\s]+([A-ZÁÉÍÓÚÑ\s]+?)(?:\n|$)""",
    ),
    "fiscal" -> Vector(
      """FISCAL[:\s]+([A-ZÁÉÍÓÚÑ\s]+?)(?:\n|$)""",
      """FlSCAL[:\s]+([A-ZÁÉÍÓÚÑ\s]+?)(?:\n|$)""",
    ),
  )

  private val compiled: Array[(String, Array[Pattern])] =
    fieldPatterns.map { case (f, ps) =>
      f -> ps.map(Pattern.compile(_, Normalize.UniFlags)).toArray
    }.toArray

  /** Cheap skip-guards per field (perf only): a field whose patterns all
    * hinge on a distinctive case-folded literal (or any digit) is
    * skipped when none occurs — one lowercase copy feeds every check.
    * Same exotic-case-fold caveat as Normalize.patternGuards; the golden
    * corpus arbitrates. Needle lists include the OCR l-variants. */
  private val fieldGuards: Map[String, (Array[String], Boolean)] = Map(
    "carpeta_fiscal" -> (Array("carpeta"), true),
    "expediente" -> (Array("exp"), true),
    "fiscalia" -> (Array("fiscal", "flscal"), false),
    "distrito_fiscal" -> (Array("distrito", "dlstrlto"), false),
    "delito" -> (Array("delito", "dellto", "contra", "usurpaci", "apropiaci"), false),
    "imputado" -> (Array("imputado", "lmputado", "investigado"), false),
    "agraviado" -> (Array("agraviado", "agravlado"), false),
    "fecha" -> (Array.empty[String], true),
    "resolucion" -> (Array("resoluci"), true),
    "juzgado" -> (Array("juzgado"), false),
    "juez" -> (Array("jue", "magistrado"), false),
    "fiscal" -> (Array("fiscal", "flscal"), false),
  )
  private val compiledWithGuards: Array[(String, Array[Pattern], Array[String], Boolean)] =
    compiled.map { case (f, ps) =>
      val (needles, digit) = fieldGuards(f)
      (f, ps, needles, digit)
    }

  @inline private def hasDigit(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (Character.isDigit(s.charAt(i))) return true
      i += 1
    }
    false
  }

  private val reWs = Pattern.compile("""\s+""", Pattern.UNICODE_CHARACTER_CLASS)
  private val reTrailJunk = Pattern.compile("""[|#]+$""")
  // fecha post-processing (app.py:528)
  private val reLongDate = Pattern.compile(
    """(\d{1,2})\s+de\s+(\w+)\s+del?\s+(\d{4})""", Normalize.UniFlags)

  /** Python `match.lastindex`: highest group number that participated. */
  private def lastIndex(m: Matcher): Int = {
    var i = m.groupCount()
    while (i >= 1 && m.group(i) == null) i -= 1
    i
  }

  private def cleanValue(raw: String): String = {
    var v = reWs.matcher(raw).replaceAll(" ")
    v = reTrailJunk.matcher(v).replaceAll("")
    Normalize.pyStrip(v)
  }

  /** Extract fields; insertion order mirrors the reference's dict order,
    * with `fecha_normalizada` appended last (app.py:524-531). */
  def extract(text: String): Map[String, String] = {
    if (text == null) return Map.empty
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val digits = hasDigit(text)
    var fields = ListMap.empty[String, String]
    var fi = 0
    while (fi < compiledWithGuards.length) {
      val (name, pats, needles, needsDigit) = compiledWithGuards(fi)
      val applicable =
        (!needsDigit || digits) &&
          (needles.isEmpty || needles.exists(lowered.contains(_)))
      var pi = 0
      var done = !applicable
      while (pi < pats.length && !done) {
        val m = pats(pi).matcher(text)
        if (m.find()) {
          val raw =
            if (lastIndex(m) >= 1) Normalize.pyStrip(m.group(1))
            else Normalize.pyStrip(m.group(0))
          val v = cleanValue(raw)
          if (v.nonEmpty) {
            fields = fields.updated(name, v)
            done = true // first match wins (app.py:521)
          }
        }
        pi += 1
      }
      fi += 1
    }
    fields.get("fecha").foreach { dateText =>
      val dm = reLongDate.matcher(dateText)
      if (dm.find()) {
        val norm = s"${dm.group(1)} de ${dm.group(2).toLowerCase(java.util.Locale.ROOT)} del ${dm.group(3)}"
        fields = fields.updated("fecha_normalizada", norm)
      }
    }
    fields
  }
}
