package ocrspark.ops

import org.apache.spark.sql.DataFrame

/** Deterministic planted-duplicate corpus for dedup evaluation: the
  * documents table unioned with near-duplicate copies (every 7th doc,
  * id + 1_000_000, every 20th token mutated) and exact copies (every
  * 11th doc, id + 2_000_000). The planted ids double as ground truth
  * for recall/precision tests and as the driver-visible dedup queries'
  * input so their outputs are stable. */
object DedupCorpus {

  val NearOffset = 1000000L
  val ExactOffset = 2000000L

  def mutate(text: String): String = {
    val toks = text.split(" ")
    var i = 0
    while (i < toks.length) {
      if (i % 20 == 0) toks(i) = s"qz$i"
      i += 1
    }
    toks.mkString(" ")
  }

  /** documents(doc_id, text, lang) → corpus with planted dups. */
  def withPlantedDups(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .flatMap { case (id, t, l) =>
        val base = Seq((id, t, l))
        val near =
          if (id % 7 == 0 && t != null && t.length > 100)
            Seq((id + NearOffset, mutate(t), l)) else Nil
        val exact = if (id % 11 == 0 && t != null) Seq((id + ExactOffset, t, l)) else Nil
        base ++ near ++ exact
      }
      .toDF("doc_id", "text", "lang")
  }
}
