package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate. Total order: higher score first, then smaller id
  * — the same deterministic order the window form (`ORDER BY cos DESC,
  * neighbor_id`) uses, so both forms emit identical rankings. The score
  * is non-nullable by encoder (a NULL score row would crash the udaf
  * deserializer with no hint of the cause) — callers drop NULL scores
  * first; see [[graft.operators.Similarity]]'s scoredTopK. */
final case class ScoredId(score: Double, id: Long)

/** Bounded top-k buffer. */
final case class TopKBuf(items: Seq[ScoredId])

/** Typed `Aggregator` keeping the top k [[ScoredId]]s per group
  * (SURVEY.md §7 "TypedImperativeAggregate/Aggregator candidate if
  * heap-based top-k beats sort-limit").
  *
  * Why this beats the window `row_number` form at scale: the window sorts
  * EVERY scored candidate of a group on one partition (shuffle volume =
  * all candidates); an aggregator does partial top-k map-side, so each
  * partition ships at most k rows per group, and the final merge is
  * O(k·partitions). Ranking is identical because the comparator is the
  * same total order.
  *
  * The buffer is pruned to k whenever it doubles — amortized O(log k)
  * per element without a mutable heap (keeps the buffer encodable as a
  * plain product). */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, TopKBuf, Seq[ScoredId]] {

  // Spark's double ordering, descending (round 15): Ordering.by(-score)
  // broke the "identical to ORDER BY score DESC" claim on the edges —
  // -NaN is NaN, which a tuple key sorts LAST where Spark ranks NaN
  // FIRST (greater than every double), and -0.0 vs 0.0 tie-broke by
  // sign instead of by id. java.lang.Double.compare matches Spark's
  // nan-safe semantics once zeros are normalized (Spark treats
  // -0.0 == 0.0).
  private val ord: Ordering[ScoredId] = new Ordering[ScoredId] {
    private def norm(x: Double): Double = if (x == 0.0) 0.0 else x
    override def compare(a: ScoredId, b: ScoredId): Int = {
      val c = java.lang.Double.compare(norm(b.score), norm(a.score))
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  private def prune(items: Seq[ScoredId]): Seq[ScoredId] =
    if (items.length <= k) items else items.sorted(ord).take(k)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf = {
    val appended = b.items :+ a
    TopKBuf(if (appended.length >= 2 * k) prune(appended) else appended)
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf(prune(x.items ++ y.items))

  override def finish(b: TopKBuf): Seq[ScoredId] = b.items.sorted(ord).take(k)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
