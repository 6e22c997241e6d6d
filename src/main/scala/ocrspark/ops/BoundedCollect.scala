package ocrspark.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}

/** Bounded-memory "collect the cap smallest members" aggregates for the
  * LSH bucket paths.
  *
  * `collect_list` over a degenerate bucket (boilerplate pages, mirrored
  * sites, near-empty docs) is unbounded: at 10^12 docs a single hot
  * (band, signature) key can hold 10^9 members and OOM its reduce task
  * before any size filter runs. These aggregators keep AT MOST `cap`
  * elements per group at every point — reduce and merge both trim — and
  * they are Aggregator-based, so Spark runs them with map-side partial
  * aggregation: the shuffle carries pre-trimmed partial buffers, never
  * the full degenerate bucket.
  *
  * "Smallest by id" is the invariant the dedup semantics need: the
  * bucket's keeper (min id) always survives trimming, so an over-cap
  * bucket can still emit member→keeper pairs (see Dedup).
  */
object BoundedCollect {

  /** Trim helper: keep the `cap` smallest by `key`, ties broken by the
    * ordering itself (ids are unique in every caller). Sorting only
    * happens when the buffer exceeds cap, so in-cap groups pay nothing
    * beyond the append. */
  private def trim[T](s: Seq[T], cap: Int)(implicit ord: Ordering[T]): Seq[T] =
    if (s.length <= cap) s else s.sorted.take(cap)

  class BoundedLongs(cap: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], a: Long): Seq[Long] = trim(b :+ a, cap)
    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y, cap)
    def finish(b: Seq[Long]): Seq[Long] = b.sorted
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  case class IdSh(id: Long, sh: Long)
  private implicit val idShOrd: Ordering[IdSh] = Ordering.by(_.id)

  class BoundedIdSh(cap: Int)
      extends Aggregator[IdSh, Seq[IdSh], Seq[IdSh]] {
    def zero: Seq[IdSh] = Vector.empty
    def reduce(b: Seq[IdSh], a: IdSh): Seq[IdSh] = trim(b :+ a, cap)
    def merge(x: Seq[IdSh], y: Seq[IdSh]): Seq[IdSh] = trim(x ++ y, cap)
    def finish(b: Seq[IdSh]): Seq[IdSh] = b.sorted
    def bufferEncoder: Encoder[Seq[IdSh]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[IdSh]] = ExpressionEncoder()
  }

  case class IdVec(id: Long, v: Seq[Float])
  private implicit val idVecOrd: Ordering[IdVec] = Ordering.by(_.id)

  class BoundedIdVec(cap: Int)
      extends Aggregator[IdVec, Seq[IdVec], Seq[IdVec]] {
    def zero: Seq[IdVec] = Vector.empty
    def reduce(b: Seq[IdVec], a: IdVec): Seq[IdVec] = trim(b :+ a, cap)
    def merge(x: Seq[IdVec], y: Seq[IdVec]): Seq[IdVec] = trim(x ++ y, cap)
    def finish(b: Seq[IdVec]): Seq[IdVec] = b.sorted
    def bufferEncoder: Encoder[Seq[IdVec]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[IdVec]] = ExpressionEncoder()
  }

  /** Column aggregates, ready for `groupBy(...).agg(...)`. */
  def boundedIds(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new BoundedLongs(cap), ExpressionEncoder[Long]())
  def boundedIdSh(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new BoundedIdSh(cap), ExpressionEncoder[IdSh]())
  def boundedIdVec(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new BoundedIdVec(cap), ExpressionEncoder[IdVec]())
}
