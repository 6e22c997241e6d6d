package ocrspark.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the
  * greatest right timestamp ≤ the left timestamp within the same key —
  * the "latest state at event time" operator (market data, session
  * diagnostics, slowly-changing dimensions). Spark has no native as-of
  * join, and the naive formulation (range join + per-key argmax) is
  * O(L×R) per key.
  *
  * This is the union-scan shape: tag both sides, ONE shuffle on the
  * key, sort (ts, tag) inside the window, and carry the most recent
  * right payload forward with `last(ignoreNulls)` — O((L+R)·log(L+R))
  * per key, NO join node in the plan at all. At a tie (right.ts ==
  * left.ts) the right row sorts first, so "at-or-before" includes the
  * equal instant, matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`
  * (which the driver oracle uses as the cross-engine check).
  *
  * Scale notes: the shuffle carries each side exactly once; the window
  * needs a key's rows co-partitioned (true of any as-of semantics). A
  * pathologically hot key concentrates in one task — the standard
  * mitigation (split the key by coarse time range, as-of within range,
  * then stitch the boundary) composes on top of this operator.
  *
  * Determinism: callers must ensure (key, ts) is unique on the RIGHT
  * side (or accept an arbitrary-but-stable pick among exact ties).
  */
object AsOfJoin {

  /** Left rows + an `asof` struct holding the matched right row (null
    * when no right row is at-or-before the left timestamp). */
  def asOf(left: DataFrame, right: DataFrame,
           keyCol: String, tsCol: String): DataFrame = {
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val lp = left.select(
      col(keyCol).as("__k"), col(tsCol).cast("timestamp").as("__ts"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"), lit(0).as("__tag"))
    val rp = right.select(
      col(keyCol).as("__k"), col(tsCol).cast("timestamp").as("__ts"),
      lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col): _*).as("__r"), lit(1).as("__tag"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__tag").desc) // right first at ties
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lp.unionByName(rp)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .select(col("__l.*") +: Seq(col("__asof").as("asof")): _*)
  }
}
