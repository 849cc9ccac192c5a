package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Streaming ANN serve — the production vector-search topology (§2i ×
  * the similarity surface): the corpus is indexed ONCE in batch
  * ([[graft.operators.Similarity.buildIvfIndex]] → parquet, the
  * ann_ivf_persisted path), and an unbounded QUERY stream is answered
  * per micro-batch by the IDENTICAL batch serve operator inside
  * foreachBatch. Stream-static at its purest: the query stream is the
  * small side; the 100 TB corpus never moves — per batch, assignment
  * broadcasts the O(K) centroid set, candidates equi-join the posting
  * lists, and the exact re-rank touches only candidate rows.
  *
  * Batch parity is the fidelity contract (StreamingSimilaritySpec): the
  * union of per-batch results equals the batch `ivfTopKWithIndex` over
  * the same query set, row for row — ANN serve is per-query, so batch
  * boundaries cannot change any answer.
  *
  * Delivery: each micro-batch writes to its own `batch=<id>` directory
  * with overwrite — the standard idempotent-foreachBatch-sink recipe, so
  * an at-least-once replay of a batch overwrites its own output instead
  * of appending duplicates. */
object StreamingSimilarity {

  /** Serve top-k from a prebuilt [[Similarity.IvfIndex]] for every query
    * micro-batch; results land in `outDir/batch=<id>/`. The stream needs
    * (vec_id, embedding) rows — the corpus frame's own shape. */
  def runIvfServe(queryStream: DataFrame, index: Similarity.IvfIndex,
                  corpus: DataFrame, k: Int, nProbe: Int,
                  outDir: String, checkpointDir: String): StreamingQuery =
    queryStream
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          Similarity.ivfTopKWithIndex(batch, corpus, index, k, nProbe)
            .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
      }
      .start()
}
