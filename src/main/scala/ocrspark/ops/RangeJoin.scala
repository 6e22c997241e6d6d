package ocrspark.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via time binning.
  *
  * The naive formulation (`p.ts BETWEEN i.start AND i.end` as a join
  * condition) has no equi-key, so Spark plans a BroadcastNestedLoopJoin
  * — O(P×I) and a scale-killer the moment neither side broadcasts. The
  * binned shape turns it into an EQUI-join: intervals explode into the
  * time bins they overlap (≤ 2 bins each when `binWidth` ≥ the longest
  * interval), points land in exactly one bin, the join runs on
  * (key, bin) — hash-partitionable, AQE-skew-splittable — and the exact
  * containment predicate filters the bin-collision false positives.
  * Shuffle payload is each side ~once (intervals ≤ 2×).
  */
object RangeJoin {

  /** Inner join of points to the intervals containing them (same key,
    * `startCol ≤ pCol ≤ endCol`, all three numeric — e.g. epoch
    * micros). `binWidth` MUST be ≥ the longest interval so an interval
    * spans at most 2 bins; values must be non-negative (epoch time).
    * Output: point columns + interval columns (names must not clash
    * apart from `keyCol`).
    *
    * `maxBins` guards the symmetric corruption to an inverted interval:
    * one row with an absurd end bound (a year-9999 timestamp) would
    * explode into hundreds of millions of ascending bins. An interval
    * spanning more than `maxBins` bins violates the binWidth contract
    * (legit intervals span ≤ 2) and is treated exactly like an inverted
    * one — corrupt data, zero matches. The default leaves 2× slack over
    * the contract so a marginally mis-sized binWidth degrades to extra
    * bin rows, not dropped data.
    *
    * RETURN CONTRACT — the filter is a silent drop BY DESIGN, so a
    * caller whose binWidth might be mis-sized by more than the slack
    * (legit long intervals, not corruption) must assert
    * `droppedIntervals(intervals, startCol, endCol, binWidth, maxBins)
    * .isEmpty` (or count it) before trusting completeness; a non-empty
    * result means either binWidth must grow or maxBins must be raised. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCol: String, pCol: String,
                      startCol: String, endCol: String,
                      binWidth: Long, maxBins: Int = 4): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBins >= 2, "maxBins must allow the contract's 2-bin span")
    // guard inverted intervals: sequence(start, stop) defaults to step
    // -1 when start > stop, so one corrupted row with swapped bounds
    // would explode into millions of descending bins; the correct
    // semantics for an empty interval is zero matches
    val ivl = intervals.filter(col(endCol) >= col(startCol))
      .filter(floor(col(endCol) / binWidth).cast("long") -
        floor(col(startCol) / binWidth).cast("long") < lit(maxBins.toLong))
      .withColumn("__bin",
        explode(sequence(floor(col(startCol) / binWidth).cast("long"),
          floor(col(endCol) / binWidth).cast("long"))))
    val pts = points.withColumn("__bin",
      floor(col(pCol) / binWidth).cast("long"))
    pts.join(ivl, Seq(keyCol, "__bin"))
      .filter(col(pCol) >= col(startCol) && col(pCol) <= col(endCol))
      .drop("__bin")
  }

  /** The intervals [[pointInInterval]] would EXCLUDE as corrupt under
    * the given binning (inverted bounds, or spanning ≥ maxBins bins).
    * Callers that cannot rule out legit long intervals assert this is
    * empty — a cheap metadata-only aggregation — instead of discovering
    * missing matches downstream; rows returned here mean binWidth is
    * mis-sized for the data, not that the data was joined. */
  def droppedIntervals(intervals: DataFrame,
                       startCol: String, endCol: String,
                       binWidth: Long, maxBins: Int = 4): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    intervals.filter(col(endCol) < col(startCol) ||
      floor(col(endCol) / binWidth).cast("long") -
        floor(col(startCol) / binWidth).cast("long") >= lit(maxBins.toLong))
  }
}
