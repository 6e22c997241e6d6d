package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import ocrspark.text.{Fields, Normalize}

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` holds DuckDB-runnable ANSI SQL for every SQL-expressible
  * query (UDF-based text operators are covered by the golden byte-identity
  * suite instead and get the driver's rows-only check).
  */
object SparkEntry {

  // --- shared UDFs (registered lazily per call; Spark caches) ----------
  private val normalizeUdf = udf((text: String, lang: String) => Normalize.normalize(text, lang))
  private val extractFieldsUdf = udf((text: String) => Fields.extract(text))

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * normalize + field-extract over the documents table (the minimum
    * end-to-end slice of SURVEY.md §7.3 step 1). */
  def entry(spark: SparkSession): DataFrame =
    queries("f1_normalize_extract")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1+F2: the byte-identity text engine over the documents table.
    // Not SQL-expressible (24 regex passes + quirk semantics) → golden
    // suite is the oracle; driver records rows-only.
    "f1_normalize_extract" -> ((s, dir) => {
      docs(s, dir)
        .select(
          col("doc_id"),
          normalizeUdf(col("text"), col("lang")).as("text_norm"),
          extractFieldsUdf(normalizeUdf(col("text"), col("lang"))).as("fields"))
        .orderBy(col("doc_id"))
    }),

    // P1-P4-shaped filter/projection with pushdown: long Spanish/English
    // docs only, projecting two columns (scan must prune columns).
    "p1_filter_project" -> ((s, dir) => {
      docs(s, dir)
        .filter(col("lang").isin("es", "en") && col("n_chars") > lit(500))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),
  )

  /** DuckDB oracle SQL per query (column names MUST match the Spark
    * result — the driver sorts columns by name and hashes values). */
  def oracleSql: Map[String, String] = Map(
    "p1_filter_project" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang IN ('es','en') AND n_chars > 500
        |ORDER BY doc_id""".stripMargin,
  )
}
