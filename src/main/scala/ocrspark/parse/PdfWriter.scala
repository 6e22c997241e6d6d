package ocrspark.parse

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Minimal deterministic PDF 1.4 writer — the synthesis side of the
  * parse-your-own-writer pair (SURVEY.md §7.5 risk 3). Emits the exact
  * subset [[PdfExtract]] understands: Catalog → Pages → Page objects,
  * per-page Flate-or-raw content streams using only BT/ET, Tf, Td,
  * Tj text operators, optional 1×1 image XObjects (so the router's
  * has_images detection — reference app.py:268-276 — has something real
  * to detect), and a classic xref table + trailer.
  *
  * Strings: Latin-1-representable text is written as escaped literal
  * strings; anything else as UTF-16BE hex strings with BOM (both are
  * standard PDF text-string encodings).
  */
object PdfWriter {

  /** One logical page: text blocks, each a list of lines; whether the
    * page carries an image XObject. */
  case class PageSpec(blocks: Seq[Seq[String]], hasImage: Boolean = false)

  private val latin1 = StandardCharsets.ISO_8859_1

  private def isLatin1(s: String): Boolean = s.forall(_ <= 0xFF)

  /** Escape a PDF literal string per spec: backslash, parens, CR/LF. */
  private def escapeLiteral(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\r' => sb.append("\\r")
      case '\n' => sb.append("\\n")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def pdfString(s: String): Array[Byte] =
    if (isLatin1(s)) ("(" + escapeLiteral(s) + ")").getBytes(latin1)
    else { // UTF-16BE hex string with BOM
      val bytes = ("\uFEFF" + s).getBytes(StandardCharsets.UTF_16BE)
      val hex = new StringBuilder("<")
      bytes.foreach(b => hex.append(f"${b & 0xFF}%02X"))
      hex.append(">")
      hex.toString.getBytes(latin1)
    }

  private def contentStream(spec: PageSpec): Array[Byte] = {
    val out = new ByteArrayOutputStream
    var y = 720
    spec.blocks.foreach { lines =>
      out.write(s"BT\n/F1 12 Tf\n72 $y Td\n".getBytes(latin1))
      var first = true
      lines.foreach { line =>
        if (!first) out.write("0 -14 Td\n".getBytes(latin1))
        first = false
        out.write(pdfString(line))
        out.write(" Tj\n".getBytes(latin1))
      }
      out.write("ET\n".getBytes(latin1))
      y -= 14 * lines.size + 28 // block gap: 2 line-heights
    }
    if (spec.hasImage)
      out.write("q 10 0 0 10 500 50 cm /Im1 Do Q\n".getBytes(latin1))
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](math.max(64, data.length + 64))
    val out = new ByteArrayOutputStream
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }

  /** Build a complete PDF. `compress` chooses FlateDecode streams. */
  def build(pages: Seq[PageSpec], compress: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    def pos: Long = out.size().toLong
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    def wb(b: Array[Byte]): Unit = out.write(b, 0, b.length)

    // Object numbering: 1 catalog, 2 pages-tree, 3 font,
    // then per page i: (4+3i) page, (5+3i) content, (6+3i) image (always
    // reserved; emitted only when hasImage — reserving keeps ids simple).
    val n = pages.size
    def pageObj(i: Int) = 4 + 3 * i
    def contObj(i: Int) = 5 + 3 * i
    def imgObj(i: Int) = 6 + 3 * i
    val maxObj = 3 + 3 * n

    w("%PDF-1.4\n%âãÏÓ\n")

    val objOffsets = new Array[Long](maxObj + 1)
    def beginObj(id: Int): Unit = { objOffsets(id) = pos; w(s"$id 0 obj\n") }
    def endObj(): Unit = w("\nendobj\n")

    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>"); endObj()
    beginObj(2)
    w(s"<< /Type /Pages /Kids [${(0 until n).map(i => s"${pageObj(i)} 0 R").mkString(" ")}] /Count $n >>")
    endObj()
    beginObj(3)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    endObj()

    pages.zipWithIndex.foreach { case (spec, i) =>
      val xobj =
        if (spec.hasImage) s" /XObject << /Im1 ${imgObj(i)} 0 R >>" else ""
      beginObj(pageObj(i))
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${contObj(i)} 0 R /Resources << /Font << /F1 3 0 R >>$xobj >> >>")
      endObj()

      val raw = contentStream(spec)
      val (data, filter) =
        if (compress) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      beginObj(contObj(i))
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      wb(data)
      w("\nendstream")
      endObj()

      if (spec.hasImage) {
        beginObj(imgObj(i))
        w("<< /Type /XObject /Subtype /Image /Width 1 /Height 1 " +
          "/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 1 >>\nstream\n")
        out.write(0x7F)
        w("\nendstream")
        endObj()
      }
    }

    // xref: free entry 0 + entries 1..maxObj (unused reserved image slots
    // are written as free entries).
    val xrefPos = pos
    w(s"xref\n0 ${maxObj + 1}\n")
    w("0000000000 65535 f \n")
    (1 to maxObj).foreach { id =>
      if (objOffsets(id) == 0L && id != 1) w("0000000000 00000 f \n")
      else w(f"${objOffsets(id)}%010d 00000 n \n")
    }
    w(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }
}
