package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

import graft.operators.Packing

/** Streaming sequence packing — [[graft.operators.Packing.nextFitPack]]
  * over an unbounded document stream. Next-fit is a left fold with O(1)
  * state, which is exactly what `flatMapGroupsWithState` persists: per
  * shard, the open bin's (id, fill) survives across micro-batches, so
  * bins CONTINUE across batches instead of restarting — a replayed corpus
  * packs identically whether it arrives in one batch or many (the
  * prefix-stability property StreamingPackingSpec pins).
  *
  * Ordering contract: next-fit output depends on document order, and a
  * stream has no global order — so the operator defines it as (arrival
  * micro-batch, doc_id within the batch). Feed batches in doc_id order
  * and the result is bit-identical to the batch operator on the same
  * corpus; feed them out of order and the packing is still valid
  * (capacity/density invariants hold), just a different valid packing —
  * the same trade every order-sensitive streaming operator makes.
  *
  * Scale: state is three longs per shard — thousands of shards cost KBs.
  * Per-batch memory is one shard's batch slice (sorted in-memory), the
  * same bound as the batch `mapPartitions` pass. No timeout: an idle
  * shard's open bin must survive arbitrary silence (dropping it would
  * re-open bin 0 and corrupt ids); callers retiring shards should close
  * them upstream.
  */
object StreamingPacking {

  /** Input row: shard key + document id + whitespace-token count (derive
    * with `size(split(text, ' '))` upstream — the Packing definition). */
  case class DocTok(shard: String, doc_id: Long, n_tokens: Long)

  /** Per-shard fold state: the open bin and its fill. */
  case class PackState(bin: Long, fill: Long, started: Boolean)

  /** Streaming next-fit: one output row per document, assigned bin ids
    * dense from 0 per shard, exactly the batch operator's semantics. */
  def nextFitStream(docs: Dataset[DocTok], capacity: Int): Dataset[Packing.Packed] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.shard)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (shard: String, batch: Iterator[DocTok],
         state: GroupState[PackState]) =>
          var st = state.getOption.getOrElse(PackState(0L, 0L, started = false))
          val out = batch.toArray.sortBy(_.doc_id).map { d =>
            st =
              if (!st.started) PackState(0L, d.n_tokens, started = true)
              else if (st.fill + d.n_tokens <= capacity)
                st.copy(fill = st.fill + d.n_tokens)
              else PackState(st.bin + 1L, d.n_tokens, started = true)
            Packing.Packed(shard, d.doc_id, d.n_tokens, st.bin)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Convenience: the tokenizing projection from a raw (shard, doc_id,
    * text) frame to [[DocTok]] — shared shape with the batch operator so
    * the two surfaces cannot disagree on token counts. */
  def tokenize(docs: DataFrame, shardCol: String = "source",
               orderCol: String = "doc_id"): Dataset[DocTok] = {
    import docs.sparkSession.implicits._
    docs.select(col(shardCol).cast("string").as("shard"),
      col(orderCol).cast("long").as("doc_id"),
      Packing.tokenCount(col("text")).as("n_tokens"))
      .as[DocTok]
  }
}
