package ocrspark.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, fingerprinting.
  * Everything here is row-local (no shuffle); the column-expressible
  * parts stay in `org.apache.spark.sql.functions` so they compile into
  * whole-stage codegen and are DuckDB-oracle-comparable; only languageId
  * and fingerprint need Scala UDFs.
  */
object TextOps {

  // precompiled hot-path patterns (per-call String.replaceAll/split
  // recompiles — measurable at 32 threads)
  private val WsRun = java.util.regex.Pattern.compile("\\s+")
  private val NonLetter = java.util.regex.Pattern.compile("[^\\p{L}]+")

  // ------------------------------------------------------------------
  // token counting
  // ------------------------------------------------------------------

  /** Trim ALL edge whitespace as a column expression: `trim()` strips
    * only ' ' (both Spark and DuckDB), so a tab/newline-edged text kept
    * a leading/trailing empty token in `split` and over-counted by one,
    * and whitespace-only text like "\n" counted 1 token. Explicit class
    * (see [[WsClassRegex]]) so Java regex and RE2 agree byte-for-byte. */
  def wsTrim(text: Column): Column =
    regexp_replace(text,
      "^[ \\t\\n\\u000B\\f\\r]+|[ \\t\\n\\u000B\\f\\r]+$", "")

  /** Whitespace token count — pure column expression (codegen'd). The
    * split uses the explicit ws class, not "\\s+": Java's \s includes
    * \x0B, RE2's (the DuckDB oracle's engine) does not — [[WsClassRegex]]
    * exists for exactly this parity and the oracle splits on the same
    * class. */
  def wsTokenCount(text: Column): Column = {
    val t = wsTrim(text)
    when(length(t) === 0, lit(0))
      .otherwise(size(split(t, "[ \\t\\n\\x0B\\f\\r]+")))
  }

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alnum marks counted separately (the shape a byte-pair
    * tokenizer's pre-tokenizer uses). Regex chosen to behave
    * identically in Spark (Java regex) and DuckDB (RE2): no
    * lookarounds, explicit character ranges. */
  // \s spelled as the explicit ASCII class: the same pattern string is
  // interpolated into the DuckDB oracle, and Java's \s includes \x0B
  // while RE2's does not
  val BpeTokenRegex =
    "[A-Za-zÀ-ÖØ-öø-ÿ]+|[0-9]+|[^A-Za-zÀ-ÖØ-öø-ÿ0-9 \\t\\n\\x0B\\f\\r]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenRegex), lit(0)))

  /** Whitespace class that behaves identically in Java regex (Spark)
    * and RE2 (DuckDB): Java's \s is ASCII-only by default and RE2's \s
    * lacks \x0B, so both sides use this explicit class. */
  val WsClassRegex = "[ \\t\\n\\u000B\\f\\r]+"

  /** Token frequency histogram — the vocabulary-building primitive of a
    * training-data pipeline. Classic word-count shape: tokenize
    * row-locally (explode), ONE shuffle on the token key with map-side
    * partial aggregation, then a global top-N (each partition sorts its
    * slice; only N rows per partition reach the driver-side merge).
    * Deterministic tie-break on the token itself. */
  def tokenHistogram(df: DataFrame, textCol: String, topN: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), WsClassRegex)).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)

  // ------------------------------------------------------------------
  // quality scoring (length / punct / stopword / caps ratios)
  // ------------------------------------------------------------------

  /** Small multilingual stopword list (en+es) for the stopword-ratio
    * quality signal; deliberately tiny and frozen. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "el", "la", "los", "las", "de", "del", "y", "o", "en", "que", "un",
    "una", "es", "por", "con", "para", "su", "al", "se", "no")

  /** Oracle-proof 6-decimal rounding: `floor(x*1e6 + 0.5)/1e6` is the
    * same double-arithmetic formula in Spark and DuckDB, so both engines
    * produce the IDENTICAL double even at half-ulp boundaries (Spark's
    * `round` is BigDecimal HALF_UP, DuckDB's is C rounding — they
    * disagree one ulp from a .5 boundary; non-negative inputs only). */
  def r6(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Word-quality ratios as a struct column; every field is a plain
    * column expression so the whole thing is one codegen'd projection
    * and is mirrorable in ANSI SQL for the oracle. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val t = wsTrim(text)
    val nChars = length(t)
    val nTokens = wsTokenCount(t)
    val punct = nChars - length(regexp_replace(t, "[\\.,;:!\\?\\|#\"']", ""))
    val upper = nChars - length(regexp_replace(t, "[A-ZÁÉÍÓÚÑÜ]", ""))
    val stops = size(regexp_extract_all(t,
      lit("(?i)\\b(" + Stopwords.mkString("|") + ")\\b"), lit(0)))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "punct_ratio" -> r6(punct.cast("double") / greatest(lit(1), nChars)),
      "upper_ratio" -> r6(upper.cast("double") / greatest(lit(1), nChars)),
      "stopword_ratio" -> r6(stops.cast("double") / greatest(lit(1), nTokens)),
      "mean_token_len" -> r6(nChars.cast("double") / greatest(lit(1), nTokens)))
  }

  /** Composite quality score in [0,1]: long-enough, not punct-heavy,
    * has stopwords (prose-like), sane mean token length. Frozen
    * weights; arithmetic only (oracle-friendly). */
  def qualityScore(text: Column): Column = {
    val cols = qualityColumns(text).toMap
    val lenScore = least(cols("n_chars").cast("double") / lit(400.0), lit(1.0))
    val punctOk = when(cols("punct_ratio") <= 0.1, lit(1.0))
      .otherwise(greatest(lit(0.0), lit(1.0) - (cols("punct_ratio") - 0.1) * 5.0))
    val stopOk = least(cols("stopword_ratio") * lit(5.0), lit(1.0))
    val tokLen = cols("mean_token_len")
    val tokOk = when(tokLen >= 3.0 && tokLen <= 12.0, lit(1.0)).otherwise(lit(0.3))
    r6(lenScore * 0.3 + punctOk * 0.2 + stopOk * 0.3 + tokOk * 0.2)
  }

  // ------------------------------------------------------------------
  // language ID (n-gram/stopword heuristic — UDF, row-local)
  // ------------------------------------------------------------------

  private val langMarkers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it", "with",
      "was", "for", "are", "this", "have", "from"),
    "es" -> Set("el", "la", "los", "las", "de", "del", "que", "y", "en",
      "un", "una", "es", "por", "con", "para"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "von", "zu", "den", "im", "für", "auf"),
    "fr" -> Set("le", "la", "les", "des", "et", "est", "une", "dans",
      "que", "pour", "sur", "avec", "pas", "au", "du"))

  /** Heuristic language ID: CJK-char share decides 'zh'; otherwise the
    * language whose marker-stopword hit-rate wins (ties → lexicographic
    * for determinism); 'und' when nothing scores. */
  def languageIdImpl(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var letters = 0
    var i = 0
    val n = math.min(text.length, 4000) // sample cap: cost is bounded per row
    while (i < n) {
      val c = text.charAt(i)
      val ub = Character.UnicodeBlock.of(c)
      if (ub == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS) cjk += 1
      if (Character.isLetter(c)) letters += 1
      i += 1
    }
    if (letters > 0 && cjk * 10 >= letters) return "zh"
    val tokens = NonLetter.split(text.substring(0, n)
      .toLowerCase(java.util.Locale.ROOT))
    if (tokens.isEmpty) return "und"
    var best = "und"
    var bestHits = 0
    langMarkers.toSeq.sortBy(_._1).foreach { case (lang, markers) =>
      val hits = tokens.count(markers.contains)
      if (hits > bestHits) { best = lang; bestHits = hits }
    }
    if (bestHits * 50 < tokens.length) "und" else best // <2% hit-rate → unknown
  }

  val languageId = udf(languageIdImpl _)

  // ------------------------------------------------------------------
  // document fingerprinting (rolling hash winnowing)
  // ------------------------------------------------------------------

  /** Winnowing fingerprint: rolling Rabin-Karp over 8-char grams,
    * window-4 minima, XOR-folded to one stable 64-bit doc fingerprint.
    * Whitespace-insensitive (text is ws-normalized first) so
    * formatting-only edits keep the same fingerprint. */
  def fingerprintImpl(text: String): Long = {
    if (text == null) return 0L
    val s = WsRun.matcher(text).replaceAll(" ").trim.toLowerCase(java.util.Locale.ROOT)
    val k = 8
    if (s.length < k) return s.hashCode.toLong
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    val grams = new Array[Long](s.length - k + 1)
    grams(0) = h
    i = k
    while (i < s.length) {
      h = (h - s.charAt(i - k) * pow) * B + s.charAt(i)
      grams(i - k + 1) = h
      i += 1
    }
    // winnow: min of each window of 4, folded
    var fp = 0L
    val w = 4
    var j = 0
    while (j + w <= grams.length) {
      var m = grams(j)
      var x = j + 1
      while (x < j + w) { if (grams(x) < m) m = grams(x); x += 1 }
      fp ^= java.lang.Long.rotateLeft(m, (j % 63) + 1)
      j += w
    }
    fp
  }

  val fingerprint = udf(fingerprintImpl _)
}
