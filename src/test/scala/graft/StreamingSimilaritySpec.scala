package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Pins the streaming ANN serve path: a query stream against a
  * parquet-persisted IVF index answers EXACTLY what the batch operator
  * answers for the same queries (batch parity — the §2i convention), and
  * replaying a batch overwrites its own output (idempotent sink). */
class StreamingSimilaritySpec extends SparkSpecBase {

  test("IVF serve stream: union of micro-batch results equals the batch answer; per-batch dirs are idempotent") {
    val emb = Tables.embeddings(spark, sf0001)
    val base = Files.createTempDirectory("graft_annserve").toString
    // batch half: build once, persist, reload — the serve job's view
    val built = Similarity.buildIvfIndex(emb, nCentroids = 8,
      refineIters = 2).get
    built.centroids.write.parquet(s"$base/idx/centroids")
    built.postings.write.parquet(s"$base/idx/postings")
    val index = Similarity.IvfIndex(
      spark.read.parquet(s"$base/idx/centroids"),
      spark.read.parquet(s"$base/idx/postings"))

    // two query micro-batches as JSON files (vec_id, embedding)
    val landing = s"$base/queries"; new java.io.File(landing).mkdirs()
    val queries = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
    val qRows = queries.collect()
    assert(qRows.length >= 4, "need several queries to split into batches")
    def jsonOf(rows: Seq[org.apache.spark.sql.Row]): String =
      rows.map { r =>
        s"""{"vec_id":${r.getLong(0)},"embedding":[${
          r.getSeq[Float](1).mkString(",")}]}"""
      }.mkString("\n")
    val (b1, b2) = qRows.splitAt(qRows.length / 2)
    Files.writeString(java.nio.file.Path.of(landing, "b1.json"), jsonOf(b1.toSeq))
    Files.writeString(java.nio.file.Path.of(landing, "b2.json"), jsonOf(b2.toSeq))

    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .json(landing)
    val q = graft.streaming.StreamingSimilarity.runIvfServe(
      stream, index, emb, k = 3, nProbe = 4,
      outDir = s"$base/out", checkpointDir = s"$base/ckpt", runId = "r1")
    q.awaitTermination(120000)

    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = resultSet(spark.read.parquet(s"$base/out"))
    val batch = resultSet(
      Similarity.ivfTopKWithIndex(queries, emb, index, k = 3, nProbe = 4))
    assert(streamed === batch,
      s"stream/batch divergence: ${streamed -- batch} vs ${batch -- streamed}")

    // idempotent sink: re-serving batch 0's queries into the same dir
    // replaces, never duplicates
    val dirs = new java.io.File(s"$base/out").listFiles
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(dirs.length === 2, s"expected 2 batch dirs, got ${dirs.toSeq}")
    val before = spark.read.parquet(s"$base/out").count()
    Similarity.ivfTopKWithIndex(
        spark.read.json(s"$landing/b1.json")
          .select(col("vec_id"), col("embedding").cast("array<float>")),
        emb, index, k = 3, nProbe = 4)
      .write.mode("overwrite").parquet(s"$base/out/${dirs.head}")
    assert(spark.read.parquet(s"$base/out").count() === before)
  }

  test("index grow stream: accumulated postings equal assign-on-union " +
    "against the frozen quantizer; late vectors servable; replayed batch no-op") {
    val emb = Tables.embeddings(spark, sf0001)
    val base = Files.createTempDirectory("graft_anngrow").toString
    // quantizer trained on 80%; the other 20% arrives later on the stream
    val seed = emb.filter(col("vec_id") % 5 =!= 0)
    val built = Similarity.buildIvfIndex(seed, nCentroids = 8,
      refineIters = 2).get
    built.centroids.write.parquet(s"$base/centroids")
    val centroids = spark.read.parquet(s"$base/centroids")
    built.postings.write.parquet(s"$base/postings/batch=seed")

    val landing = s"$base/vecs"; new java.io.File(landing).mkdirs()
    val newRows = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding")).collect()
    def jsonOf(rows: Seq[org.apache.spark.sql.Row]): String =
      rows.map { r =>
        s"""{"vec_id":${r.getLong(0)},"embedding":[${
          r.getSeq[Float](1).mkString(",")}]}"""
      }.mkString("\n")
    val (b1, b2) = newRows.splitAt(newRows.length / 2)
    Files.writeString(java.nio.file.Path.of(landing, "b1.json"), jsonOf(b1.toSeq))
    Files.writeString(java.nio.file.Path.of(landing, "b2.json"), jsonOf(b2.toSeq))

    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .json(landing)
    graft.streaming.StreamingSimilarity.runIndexGrow(
      stream, centroids, s"$base/postings", s"$base/ckpt", runId = "r1")
      .awaitTermination(120000)

    // accumulated postings (seed + 2 streamed batches) == one assignment
    // of the full union against the same frozen centroids, bit for bit
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("neighbor_id", "centroid_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val grown = spark.read.parquet(s"$base/postings")
    assert(rows(grown) === rows(
      Similarity.assign(centroids, emb, "neighbor_id", keep = 1)))

    // a late-arriving vector is servable: its own embedding finds itself
    val idx = Similarity.IvfIndex(centroids,
      grown.select("neighbor_id", "centroid_id"))
    val lateQ = emb.filter(col("vec_id") % 50 === 0) // ⊂ streamed batch
    val served = Similarity.ivfTopKWithIndex(lateQ, emb, idx,
      k = 3, nProbe = 8)
    val exactTop1 = Similarity.bruteForceTopK(lateQ, emb, k = 3)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val servedPairs = served.collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(exactTop1.subsetOf(servedPairs))

    // at-least-once replay: re-delivering batch 0 overwrites its own
    // dir — accumulated row set unchanged
    val before = rows(spark.read.parquet(s"$base/postings"))
    val b1df = spark.read.json(s"$landing/b1.json")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    graft.streaming.StreamingSimilarity.growBatch(b1df, 0L, centroids,
      s"$base/postings", runId = "r1")
    assert(rows(spark.read.parquet(s"$base/postings")) === before)

    // a SECOND run whose micro-batch ids restart at 0 (lost/relocated
    // checkpoint) lands in its own batch=r2-0 dir: nothing clobbered,
    // the served set only grows
    graft.streaming.StreamingSimilarity.growBatch(b1df, 0L, centroids,
      s"$base/postings", runId = "r2")
    assert(rows(spark.read.parquet(s"$base/postings")) === before)
    assert(new java.io.File(s"$base/postings/batch=r1-0").exists() &&
      new java.io.File(s"$base/postings/batch=r2-0").exists())
  }

  test("hybrid serve stream: per-batch RRF fusion equals the batch fusion; both rankers engage") {
    import graft.operators.TextAnalysis
    val emb = Tables.embeddings(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val base = Files.createTempDirectory("graft_hybserve").toString
    // batch-built artifacts: IVF index + inverted postings, persisted
    val built = Similarity.buildIvfIndex(emb, nCentroids = 8,
      refineIters = 2).get
    built.centroids.write.parquet(s"$base/idx/centroids")
    built.postings.write.parquet(s"$base/idx/postings")
    val index = Similarity.IvfIndex(
      spark.read.parquet(s"$base/idx/centroids"),
      spark.read.parquet(s"$base/idx/postings"))
    TextAnalysis.buildLexicalIndex(docs).write.parquet(s"$base/lex")
    val postings = spark.read.parquet(s"$base/lex")
    val nDocs = docs.filter(col("text").isNotNull).count()

    // queries: each query doc's embedding + its first three text tokens
    val queries = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .join(docs.select(col("doc_id").as("query_id"),
        slice(split(col("text"), " "), 1, 3).as("terms")), "query_id")
    val qRows = queries.collect()
    assert(qRows.length >= 4)
    def jsonOf(rows: Seq[org.apache.spark.sql.Row]): String =
      rows.map { r =>
        val terms = r.getSeq[String](2).map(t => s""""$t"""").mkString(",")
        s"""{"query_id":${r.getLong(0)},"embedding":[${
          r.getSeq[Float](1).mkString(",")}],"terms":[$terms]}"""
      }.mkString("\n")
    val landing = s"$base/queries"; new java.io.File(landing).mkdirs()
    val (b1, b2) = qRows.splitAt(qRows.length / 2)
    Files.writeString(java.nio.file.Path.of(landing, "b1.json"), jsonOf(b1.toSeq))
    Files.writeString(java.nio.file.Path.of(landing, "b2.json"), jsonOf(b2.toSeq))
    val stream = spark.readStream
      .schema("query_id LONG, embedding ARRAY<FLOAT>, terms ARRAY<STRING>")
      .option("maxFilesPerTrigger", 1)
      .json(landing)
    val q = graft.streaming.StreamingSimilarity.runHybridServe(
      stream, index, emb, postings, nDocs, k = 5, nProbe = 4,
      outDir = s"$base/out", checkpointDir = s"$base/ckpt", runId = "r1")
    q.awaitTermination(120000)

    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "rrf_q", "rank")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val streamed = resultSet(spark.read.parquet(s"$base/out"))
    val batch = resultSet(graft.streaming.StreamingSimilarity.hybridBatch(
      queries, index, emb, postings, nDocs, k = 5, nProbe = 4))
    assert(streamed === batch,
      s"stream/batch divergence: ${streamed -- batch} vs ${batch -- streamed}")
    // both rankers really contribute: some row carries both rank columns
    val fusedRows = spark.read.parquet(s"$base/out")
    assert(fusedRows.filter(col("lex_rank").isNotNull).count() > 0)
    assert(fusedRows.filter(col("sem_rank").isNotNull).count() > 0)
    // every query's final ranking is the dense 1..n order
    val perQuery = fusedRows.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"),
        min(col("rank")).as("mn"))
      .collect()
    perQuery.foreach { r =>
      assert(r.getAs[Long]("mn") === 1L && r.getAs[Long]("mx") === r.getAs[Long]("n"))
    }
  }
}
