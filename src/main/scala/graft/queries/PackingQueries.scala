package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Packing

/** Sequence-packing rows — [[graft.operators.Packing]] differentially
  * tested against independent DuckDB re-derivations. The next-fit oracle
  * is a recursive CTE walking each shard in doc order (one recursion step
  * per document rank, all shards advancing in parallel) — an engine-
  * independent restatement of the sequential fold the Spark side runs in
  * `mapPartitions`. Capacity 256 against the 10-99-token corpus exercises
  * multi-bin shards and block-straddling documents at sf0.01.
  */
object PackingQueries {

  private val Cap = 256

  /** Shared DuckDB CTE: whitespace token counts per doc, shard = source —
    * the ext_token_count n_ws_tokens definition. */
  private val duckToksCte =
    """toks AS (
      |  SELECT source AS shard, doc_id,
      |    CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tokens,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM documents)""".stripMargin

  /** Next-fit packing as a recursive CTE: bin/fill state advances rank by
    * rank within every shard simultaneously. */
  private val duckNextFitCte =
    s"""pack AS (
       |  SELECT shard, doc_id, n_tokens, rn,
       |         CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
       |  FROM toks WHERE rn = 1
       |  UNION ALL
       |  SELECT t.shard, t.doc_id, t.n_tokens, t.rn,
       |         CASE WHEN p.fill + t.n_tokens <= $Cap
       |              THEN p.bin_id ELSE p.bin_id + 1 END,
       |         CASE WHEN p.fill + t.n_tokens <= $Cap
       |              THEN p.fill + t.n_tokens ELSE t.n_tokens END
       |  FROM pack p JOIN toks t ON t.shard = p.shard AND t.rn = p.rn + 1)"""
      .stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Concat-and-chunk: per-doc token span in the shard's concatenated
    // stream and the capacity-sized blocks it covers. Pure window + integer
    // division — exact on both engines.
    "pack_chunk" -> QueryDef(
      (s, dir) => Packing.chunkPack(Tables.documents(s, dir), Cap)
        .orderBy("shard", "doc_id"),
      s"""WITH $duckToksCte,
         |o AS (
         |  SELECT shard, doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS end_off
         |  FROM toks)
         |SELECT shard, doc_id, n_tokens,
         |  end_off - n_tokens AS start_off,
         |  (end_off - n_tokens) // $Cap AS first_block,
         |  (end_off - 1) // $Cap AS last_block,
         |  (end_off - 1) // $Cap - (end_off - n_tokens) // $Cap + 1 AS n_blocks
         |FROM o ORDER BY shard, doc_id""".stripMargin),

    // GLOBAL concat-and-chunk: the corpus as ONE token stream, ranked by
    // the distributed prefix-sum (no single-partition window — the plan
    // difference is the point), graded against DuckDB's global window
    // cumsum: two algorithms, one exact answer.
    "pack_chunk_global" -> QueryDef(
      (s, dir) => Packing.chunkPackGlobal(Tables.documents(s, dir), Cap)
        .orderBy("doc_id"),
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS end_off
         |  FROM t)
         |SELECT doc_id, n_tokens,
         |  end_off - n_tokens AS start_off,
         |  (end_off - n_tokens) // $Cap AS first_block,
         |  (end_off - 1) // $Cap AS last_block,
         |  (end_off - 1) // $Cap - (end_off - n_tokens) // $Cap + 1 AS n_blocks
         |FROM o ORDER BY doc_id""".stripMargin),

    // Next-fit whole-document bins: Spark's sequential mapPartitions fold
    // vs DuckDB's recursive-CTE fold — per-doc bin assignment must agree
    // exactly.
    "pack_nextfit" -> QueryDef(
      (s, dir) => Packing.nextFitPack(Tables.documents(s, dir), Cap)
        .orderBy("shard", "doc_id"),
      s"""WITH RECURSIVE $duckToksCte,
         |$duckNextFitCte
         |SELECT shard, doc_id, n_tokens, bin_id FROM pack
         |ORDER BY shard, doc_id""".stripMargin),

    // Per-shard packing economics: bins used vs the ceil(total/capacity)
    // lower bound, utilization in exact parts-per-million.
    "pack_summary" -> QueryDef(
      (s, dir) => Packing.packingSummary(
        Packing.nextFitPack(Tables.documents(s, dir), Cap), Cap),
      s"""WITH RECURSIVE $duckToksCte,
         |$duckNextFitCte
         |SELECT shard,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  max(bin_id) + 1 AS n_bins,
         |  (CAST(sum(n_tokens) AS BIGINT) + ${Cap - 1}) // $Cap AS min_bins,
         |  (CAST(sum(n_tokens) AS BIGINT) * 1000000) //
         |    ((max(bin_id) + 1) * $Cap) AS util_ppm
         |FROM pack GROUP BY shard ORDER BY shard""".stripMargin))
}
