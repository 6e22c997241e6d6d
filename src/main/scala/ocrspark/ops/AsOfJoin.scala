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
  *
  * NULL keys: `Window.partitionBy` groups NULL keys into ONE partition,
  * which would let null-key left rows match null-key right rows — a
  * divergence from join-equality semantics (and the DuckDB ASOF oracle)
  * where NULL never equals NULL. Null-key RIGHT rows are therefore
  * dropped before the union: a null-key left row always gets asof=null.
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
    val rp = right.filter(col(keyCol).isNotNull).select(
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

  /** [[asOf]] with the hot-key mitigation its scaladoc names: split each
    * key by coarse time range so a pathological key (one user with 10^8
    * events) spreads across tasks instead of funneling into one window
    * partition. Semantics are identical to [[asOf]].
    *
    * Three passes, all bounded:
    *  1. WITHIN: the union-scan as-of with `(key, range)` as the window
    *     partition key — the hot key's rows split across its ranges, so
    *     no task ever holds more than one range of one key.
    *  2. CARRY: per `(key, range)` the latest right row (max_by — a
    *     map-side-combining aggregation, one row out per key-range),
    *     then a per-key window over the RANGE INDEX ordering `(range,
    *     tag)` with left-tags sorting before right-tags at the same
    *     range, so `last(ignoreNulls)` hands each left range the latest
    *     right row of any STRICTLY earlier range. The per-key window
    *     input is O(#ranges), not O(#events) — that is the whole point.
    *  3. STITCH: a left row whose range has no preceding right row takes
    *     the carry-in (`coalesce`).
    *
    * `rangeWidthUs` (microseconds) trades shuffle key cardinality
    * against carry-table size; pick it so a key's densest range fits a
    * task (e.g. 1 hour for event streams). */
  def asOfRanged(left: DataFrame, right: DataFrame,
                 keyCol: String, tsCol: String,
                 rangeWidthUs: Long): DataFrame = {
    require(rangeWidthUs > 0, "rangeWidthUs must be positive")
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    def rg(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / rangeWidthUs).cast("long")
    val lp = left.select(
      col(keyCol).as("__k"), rg(col(tsCol)).as("__rg"),
      col(tsCol).cast("timestamp").as("__ts"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"), lit(0).as("__tag"))
    val rp = right.filter(col(keyCol).isNotNull).select(
      col(keyCol).as("__k"), rg(col(tsCol)).as("__rg"),
      col(tsCol).cast("timestamp").as("__ts"),
      lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col): _*).as("__r"), lit(1).as("__tag"))
    // pass 1: within-range as-of; the range is IN the partition key
    val w = Window.partitionBy(col("__k"), col("__rg"))
      .orderBy(col("__ts"), col("__tag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = lp.unionByName(rp)
      .withColumn("__in", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .select(col("__k"), col("__rg"), col("__l"), col("__in"))
    // pass 2: carry-in per left range from per-range right maxima
    val perRange = rp.groupBy(col("__k"), col("__rg"))
      .agg(max_by(col("__r"), col("__ts")).as("__rmax"))
      .withColumn("__ctag", lit(1))
    val leftRanges = lp.select(col("__k"), col("__rg")).distinct()
      .withColumn("__rmax", lit(null).cast(rType))
      .withColumn("__ctag", lit(0))
    val cw = Window.partitionBy(col("__k"))
      .orderBy(col("__rg"), col("__ctag")) // left range before same-range maxima
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = leftRanges.unionByName(perRange)
      .withColumn("__carry", last(col("__rmax"), ignoreNulls = true).over(cw))
      .filter(col("__ctag") === 0)
      .select(col("__k"), col("__rg"), col("__carry"))
    // pass 3: stitch
    within.join(carry, Seq("__k", "__rg"), "left")
      .withColumn("__asof", coalesce(col("__in"), col("__carry")))
      .select(col("__l.*") +: Seq(col("__asof").as("asof")): _*)
  }
}
