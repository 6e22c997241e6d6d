package ocrspark.parse

import scala.collection.mutable.ArrayBuffer

/** Hand-written HTML tokenizer + DOM + Arc90/Readability-style
  * main-content extraction (north-star extension; the reference is
  * PDF-only so these semantics are engine-defined and pinned by our own
  * fixtures — SURVEY.md §2.9 `extract_main_html`).
  *
  * Subset (honest, SURVEY.md §7.5 risk 2): tags + attributes (quoted /
  * unquoted / bare), comments, doctype, processing instructions, raw-text
  * containers (script/style/noscript/textarea), void elements, the ~25
  * common named entities + numeric refs. No external deps — JDK only.
  *
  * Scoring: candidate nodes (div/p/td/article/section/main/body) score
  * `textLen / (1 + descendantTags) * (1 - linkDensity)` — text-to-tag
  * ratio with a link-density penalty; best candidate's subtree renders
  * to text with block-level line breaks. Deterministic: ties resolve to
  * document order.
  */
object HtmlExtract {

  case class Result(text: String, title: String, score: Double, nodeCount: Int)

  // ------------------------------------------------------------------
  // DOM
  // ------------------------------------------------------------------
  sealed trait Node
  final case class Elem(tag: String, attrs: Map[String, String],
                        children: ArrayBuffer[Node]) extends Node
  final case class TextNode(s: String) extends Node

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  private val rawTextTags = Set("script", "style", "noscript", "textarea")
  private val blockTags = Set("address", "article", "aside", "blockquote",
    "br", "div", "dl", "dd", "dt", "fieldset", "figure", "figcaption",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr",
    "li", "main", "nav", "ol", "p", "pre", "section", "table", "tbody",
    "td", "th", "thead", "tr", "ul")
  // container tags only (Readability scores paragraph CONTAINERS; a bare
  // <p> must not outscore the block that holds the article's paragraphs)
  private val candidateTags =
    Set("div", "td", "article", "section", "main", "body")

  private val entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "hellip" -> "…", "mdash" -> "—", "ndash" -> "–", "lsquo" -> "‘",
    "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”", "aacute" -> "á",
    "eacute" -> "é", "iacute" -> "í", "oacute" -> "ó", "uacute" -> "ú",
    "ntilde" -> "ñ", "Aacute" -> "Á", "Eacute" -> "É", "Iacute" -> "Í",
    "Oacute" -> "Ó", "Uacute" -> "Ú", "Ntilde" -> "Ñ", "uuml" -> "ü",
    "ouml" -> "ö", "auml" -> "ä", "szlig" -> "ß", "deg" -> "°")

  /** Decode &name;, &#123;, &#x1f; — unknown refs pass through verbatim. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(
                Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(
                Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            else entities.get(body)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------------------
  // parser
  // ------------------------------------------------------------------
  def parse(html: String): Elem = {
    val root = Elem("#root", Map.empty, ArrayBuffer.empty)
    val stack = ArrayBuffer[Elem](root)
    def top: Elem = stack.last
    var i = 0
    val n = html.length
    lazy val lower = html.toLowerCase(java.util.Locale.ROOT) // computed once, only if raw-text tags occur

    def readRawText(tag: String): Unit = {
      val close = "</" + tag
      val idx = lower.indexOf(close, i)
      val end = if (idx < 0) n else idx
      // raw text is intentionally NOT added to the DOM text (script/style
      // never contribute to content); textarea content dropped too.
      i = end
      if (idx >= 0) {
        val gt = html.indexOf('>', idx)
        i = if (gt < 0) n else gt + 1
      }
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        top.children += TextNode(decodeEntities(html.substring(i)))
        i = n
      } else {
        if (lt > i) top.children += TextNode(decodeEntities(html.substring(i, lt)))
        if (lt + 1 >= n) { i = n }
        else html.charAt(lt + 1) match {
          case '!' =>
            if (html.startsWith("<!--", lt)) {
              val end = html.indexOf("-->", lt + 4)
              i = if (end < 0) n else end + 3
            } else { // doctype / CDATA-ish: skip to '>'
              val end = html.indexOf('>', lt)
              i = if (end < 0) n else end + 1
            }
          case '?' =>
            val end = html.indexOf('>', lt)
            i = if (end < 0) n else end + 1
          case '/' =>
            val end = html.indexOf('>', lt)
            val name = html.substring(lt + 2, if (end < 0) n else end)
              .trim.toLowerCase(java.util.Locale.ROOT)
            i = if (end < 0) n else end + 1
            // pop the matching open tag and everything nested above it;
            // an unmatched close tag is ignored (never pops #root)
            val idx = stack.lastIndexWhere(_.tag == name)
            if (idx > 0) stack.remove(idx, stack.length - idx)
          case c if c.isLetter =>
            val (elem, selfClosed, next) = parseTag(html, lt)
            i = next
            top.children += elem
            val tag = elem.tag
            if (rawTextTags.contains(tag)) readRawText(tag)
            else if (!selfClosed && !voidTags.contains(tag)) stack += elem
          case _ =>
            top.children += TextNode("<")
            i = lt + 1
        }
      }
    }
    root
  }

  /** Single-pass visible-text length — the cheap analyzer metric
    * (mirrors the reference analyzer's raw `page.extract_text()`
    * measure, app.py:264-266: ALL page text ws-collapsed, no
    * main-content extraction, no entity decoding). Counts characters
    * outside tags with whitespace runs collapsed to one space;
    * script/style/comment content excluded. ~10× cheaper than building
    * the DOM, for metadata-only queries. */
  // allocation-free raw-text-container check at position i+1 of a '<';
  // the char after the name must end the tag name (not a letter/digit)
  @inline private def rawTagAt(html: String, i: Int): String = {
    @inline def ends(j: Int): Boolean =
      j >= html.length || !Character.isLetterOrDigit(html.charAt(j))
    if (html.regionMatches(true, i, "script", 0, 6) && ends(i + 6)) "script"
    else if (html.regionMatches(true, i, "style", 0, 5) && ends(i + 5)) "style"
    else if (html.regionMatches(true, i, "noscript", 0, 8) && ends(i + 8)) "noscript"
    else if (html.regionMatches(true, i, "textarea", 0, 8) && ends(i + 8)) "textarea"
    else null
  }

  def visibleTextLength(html: String): Int = {
    val n = html.length
    var i = 0
    var count = 0
    var pendingWs = false
    var started = false
    while (i < n) {
      val lt = html.indexOf('<', i)
      val end = if (lt < 0) n else lt
      // count the ws-collapsed text run [i, end) in a tight loop
      var k = i
      while (k < end) {
        val c = html.charAt(k)
        if (c > ' ' && c != '\u00A0') {
          if (pendingWs && started) count += 1
          pendingWs = false; started = true
          count += 1
        } else if (isWsOrNbsp(c)) pendingWs = true
        else { // rare control chars: visible
          if (pendingWs && started) count += 1
          pendingWs = false; started = true
          count += 1
        }
        k += 1
      }
      if (lt < 0) i = n
      else if (html.startsWith("<!--", lt)) {
        val e = html.indexOf("-->", lt + 4)
        i = if (e < 0) n else e + 3
      } else if (lt + 1 < n && (html.charAt(lt + 1).isLetter ||
          html.charAt(lt + 1) == '/' || html.charAt(lt + 1) == '!' ||
          html.charAt(lt + 1) == '?')) {
        val raw = rawTagAt(html, lt + 1)
        val gt = html.indexOf('>', lt)
        i = if (gt < 0) n else gt + 1
        if (raw != null) {
          // skip raw content up to the matching close tag
          val close = "</" + raw
          var k2 = i
          var found = -1
          while (found < 0 && k2 >= 0 && k2 < n) {
            k2 = html.indexOf('<', k2)
            if (k2 < 0) found = n
            else if (html.regionMatches(true, k2, close, 0, close.length))
              found = k2
            else k2 += 1
          }
          if (found < 0 || found >= n) i = n
          else {
            val g2 = html.indexOf('>', found)
            i = if (g2 < 0) n else g2 + 1
          }
        }
      } else {
        // bare '<' as text
        if (pendingWs && started) count += 1
        pendingWs = false; started = true
        count += 1
        i = lt + 1
      }
    }
    count
  }

  /** Parse `<tag attr=v ...>` starting at `lt`; returns (elem,
    * selfClosed, indexAfter). */
  private def parseTag(html: String, lt: Int): (Elem, Boolean, Int) = {
    var i = lt + 1
    val n = html.length
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    val tag = html.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
    var attrs = Map.empty[String, String]
    var selfClosed = false
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && html.charAt(i + 1) == '>') {
            selfClosed = true; i += 2; done = true
          } else i += 1
        case _ =>
          val as = i
          while (i < n && !html.charAt(i).isWhitespace &&
                 html.charAt(i) != '=' && html.charAt(i) != '>' &&
                 html.charAt(i) != '/') i += 1
          val aname = html.substring(as, i).toLowerCase(java.util.Locale.ROOT)
          while (i < n && html.charAt(i).isWhitespace) i += 1
          var avalue = ""
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i)
              val end = html.indexOf(q, i + 1)
              avalue = html.substring(i + 1, if (end < 0) n else end)
              i = if (end < 0) n else end + 1
            } else {
              val vs = i
              while (i < n && !html.charAt(i).isWhitespace &&
                     html.charAt(i) != '>') i += 1
              avalue = html.substring(vs, i)
            }
          }
          if (aname.nonEmpty) attrs += (aname -> decodeEntities(avalue))
      }
    }
    (Elem(tag, attrs, ArrayBuffer.empty), selfClosed, i)
  }

  // ------------------------------------------------------------------
  // scoring + rendering
  // ------------------------------------------------------------------
  private case class Stats(textLen: Int, tagCount: Int, linkLen: Int)

  // hot path: called once per DOM text node — String.replaceAll would
  // recompile its pattern on every call, which dominates the profile
  // and destroys multi-core scaling (allocation churn).
  @inline private def isWsOrNbsp(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00A0'

  /** Manual single-pass whitespace collapse (no regex, minimal alloc). */
  private def collapseWs(s: String): String = {
    // fast path: most DOM text nodes are already collapsed — detect in
    // one scan and return the original instance (zero alloc)
    var clean = true
    var j = 0
    while (clean && j < s.length) {
      val c = s.charAt(j)
      if (c == ' ') { if (j + 1 < s.length && isWsOrNbsp(s.charAt(j + 1))) clean = false }
      else if (isWsOrNbsp(c)) clean = false
      j += 1
    }
    if (clean) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (isWsOrNbsp(c)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    if (pendingSpace && sb.length > 0) sb.append(' ') // keep trailing marker
    sb.toString
  }

  private def stats(node: Node, inLink: Boolean): Stats = node match {
    case TextNode(s) =>
      val len = normalizeWs(s).length
      Stats(len, 0, if (inLink) len else 0)
    case Elem(tag, _, children) =>
      var t = 0; var tags = 0; var l = 0
      val link = inLink || tag == "a"
      children.foreach { c =>
        val st = stats(c, link)
        t += st.textLen; tags += st.tagCount; l += st.linkLen
      }
      Stats(t, tags + children.count(_.isInstanceOf[Elem]), l)
  }

  private def normalizeWs(s: String): String = {
    val t = collapseWs(s)
    if (t.nonEmpty && t.charAt(t.length - 1) == ' ') t.substring(0, t.length - 1)
    else t
  }

  /** Render a subtree to text: block boundaries become newlines, inline
    * text flows with single spaces; blank lines collapse. */
  def renderText(node: Node): String = {
    val sb = new StringBuilder
    def walk(nd: Node): Unit = nd match {
      case TextNode(s) =>
        val t = collapseWs(s)
        if (t.nonEmpty && t != " ") sb.append(t)
        else if (t == " " && sb.nonEmpty && sb.last != '\n' && sb.last != ' ')
          sb.append(' ')
      case Elem(tag, _, children) =>
        val block = blockTags.contains(tag)
        if (block && sb.nonEmpty && sb.last != '\n') sb.append('\n')
        children.foreach(walk)
        if (block && sb.nonEmpty && sb.last != '\n') sb.append('\n')
    }
    walk(node)
    sb.toString
      .split('\n').iterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
  }

  private def collectCandidates(root: Elem): Vector[Elem] = {
    val out = Vector.newBuilder[Elem]
    def walk(e: Elem): Unit = {
      if (candidateTags.contains(e.tag)) out += e
      e.children.foreach { case c: Elem => walk(c); case _ => () }
    }
    walk(root)
    out.result()
  }

  private def findFirst(root: Elem, tag: String): Option[Elem] = {
    def walk(e: Elem): Option[Elem] =
      if (e.tag == tag) Some(e)
      else e.children.iterator.collect { case c: Elem => c }
        .map(walk).collectFirst { case Some(x) => x }
    walk(root)
  }

  /** Main-content extraction: parse, score candidates, render winner. */
  def extractMain(html: String): Result = {
    val root = parse(html)
    val title = findFirst(root, "title")
      .map(renderText).map(normalizeWs).getOrElse("")
    val candidates = collectCandidates(root)
    val totalNodes = {
      var c = 0
      def count(e: Elem): Unit = {
        c += 1
        e.children.foreach { case ch: Elem => count(ch); case _ => () }
      }
      count(root)
      c - 1 // exclude #root
    }
    val MinTextLen = 25
    var best: Elem = null
    var bestScore = -1.0
    candidates.foreach { e =>
      val st = stats(e, inLink = false)
      if (st.textLen >= MinTextLen) {
        val linkDensity = st.linkLen.toDouble / math.max(1, st.textLen)
        val score = st.textLen.toDouble / (1 + st.tagCount) * (1.0 - linkDensity)
        if (score > bestScore + 1e-9) { best = e; bestScore = score }
      }
    }
    if (best == null) {
      // degenerate page: fall back to whole-document text
      val text = renderText(root)
      Result(text, title, 0.0, totalNodes)
    } else Result(renderText(best), title, bestScore, totalNodes)
  }
}
