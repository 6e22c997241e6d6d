package ocrspark.text

import org.apache.spark.sql.functions.udf

/** Markdown report assembly — mirrors the reference's
  * `generate_markdown_report` (app.py:1014-1054) section by section:
  * header, processing-info bullet list, extracted fields (title-cased
  * keys, insertion order), fenced text content, footer.
  *
  * Deterministic deviations (documented; the reference values are
  * runtime wall-clock): `Tiempo` is fixed at 0.0s and `Procesado el`
  * formats the row's warc_ts instead of now().
  */
object Report {

  /** Python str(float)-style rendering for the confidence/size values
    * the reference interpolates (95.0 → "95.0", 87.25 → "87.25"). */
  private def pyNum(d: Double): String =
    if (d == math.floor(d) && !d.isInfinite) f"$d%.1f" else d.toString

  /** field.replace('_',' ').title() (app.py:1038). */
  private[text] def titleCase(field: String): String =
    field.split('_').map { w =>
      if (w.isEmpty) w else w.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + w.substring(1).toLowerCase(java.util.Locale.ROOT)
    }.mkString(" ")

  private val dateFmt = java.time.format.DateTimeFormatter
    .ofPattern("dd/MM/yyyy HH:mm:ss")
    .withZone(java.time.ZoneOffset.UTC)

  /** The reference template, as a pure row-local function. `fields`
    * iterates in the extraction order ([[Fields.fieldPatterns]] — the
    * Python dict's insertion order). */
  def markdown(filename: String, method: String, pages: Int,
               confidence: Double, language: String, sizeMb: Double,
               fields: Seq[(String, String)], text: String,
               processedAt: java.time.Instant): String = {
    val sb = new StringBuilder
    sb.append(s"# Procesamiento OCR - $filename\n\n")
    sb.append("## Información del Procesamiento\n")
    sb.append(s"- **Archivo**: $filename\n")
    sb.append(s"- **Método**: $method\n")
    sb.append(s"- **Páginas**: $pages\n")
    sb.append(s"- **Tiempo**: 0.0s\n") // deterministic stand-in
    sb.append(s"- **Confianza**: ${pyNum(confidence)}%\n")
    sb.append(s"- **Idioma**: $language\n")
    sb.append(s"- **Tamaño**: ${pyNum(sizeMb)}MB\n")
    sb.append("\n")
    if (fields.nonEmpty) {
      sb.append("## Campos Extraídos\n\n")
      fields.foreach { case (k, v) =>
        sb.append(s"- **${titleCase(k)}**: $v\n")
      }
      sb.append("\n")
    }
    sb.append("## Contenido Extraído\n\n")
    sb.append("```\n")
    sb.append(text)
    sb.append("\n```\n\n")
    sb.append("---\n")
    sb.append(s"*Procesado el ${dateFmt.format(processedAt)}*")
    sb.toString
  }

  /** Reference language codes for the report (app.py:915-919: spa /
    * eng / spa+eng). */
  private def refLang(lang: String): String = lang match {
    case "es" => "spa"
    case "en" => "eng"
    case other => if (other == null) "spa" else other
  }

  /** round-half-up to 2 decimals, cross-engine stable (the reference's
    * get_file_size_mb rounds to 2). */
  private def sizeMb(bytes: Long): Double =
    math.floor(bytes / (1024.0 * 1024.0) * 100.0 + 0.5) / 100.0

  /** Column form over the extraction result. `fields` arrives as the
    * engine's map; ordering is re-imposed from [[Fields.fieldPatterns]]
    * so the section matches the reference's insertion order. */
  val markdownUdf = udf((url: String, warcTs: java.sql.Timestamp,
                         lang: String, sizeBytes: Long, method: String,
                         pages: Int, confidence: Double, text: String,
                         fields: Map[String, String]) => {
    val filename = url.substring(url.lastIndexOf('/') + 1)
    val ordered = Fields.fieldPatterns.iterator.map(_._1)
      .flatMap(k => fields.get(k).map(k -> _)).toSeq
    // the reference reports round(confidence, 2) (metadata, app.py:780)
    val conf2 = math.floor(confidence * 100.0 + 0.5) / 100.0
    markdown(filename, method, pages, conf2, refLang(lang),
      sizeMb(sizeBytes), ordered, if (text == null) "" else text,
      warcTs.toInstant)
  })
}
