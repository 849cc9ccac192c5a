package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-data-pipeline extension operators (north star, BASELINE.json):
  * deduplication, similarity search, text analysis over the `documents`
  * and `embeddings` tables. Filled in incrementally — see graft.operators
  * for the implementations.
  */
object ExtensionQueries {

  val defs: Map[String, QueryDef] = Map(

    // Exact dedup: hash-groupBy on document text, keep the smallest doc_id
    // as the survivor. One shuffle on the (hashed) text key; at 100 TB the
    // group key would be xxhash64(text) rather than the full text to keep
    // shuffle rows narrow — same survivors either way.
    "dedup_exact" -> QueryDef(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies")),
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin)
  )
}
