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

    // Exact dedup: groupBy on (xxhash64(text), length(text)) — 16-byte
    // shuffle rows instead of whole document bodies, the difference between
    // shuffling ~100 TB of corpus and ~1 TB of keys at scale. The oracle
    // groups by text itself: identical survivors unless a 64-bit hash AND
    // length collide across distinct texts (~2⁻⁶⁴ per pair; acceptable for
    // dedup, and the output columns don't expose the key either way).
    "dedup_exact" -> QueryDef(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(xxhash64(col("text")), length(col("text")))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies")),
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin)
  )
}
