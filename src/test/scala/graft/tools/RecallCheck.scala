package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Tables, operators}

/** Dev-only recall prober (test scope): prints LSH/IVF recall vs the
  * brute-force baseline at a given scale so invariant-floor choices are
  * measured, not guessed. */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs(operators.Similarity.bruteForceTopK(queries, emb, k = 5))
    def recall(s: Set[(Long, Long)]) = (brute & s).size.toDouble / brute.size
    for (mp <- Seq(0, 1, 2)) {
      val r = recall(pairs(operators.Similarity.lshTopK(
        queries, emb, k = 5, bits = 4, tables = 8, multiProbe = mp)))
      println(f"LSH bits=4 tables=8 multiProbe=$mp%d recall=$r%.3f")
    }
    val ivf = recall(pairs(operators.Similarity.ivfTopK(
      queries, emb, k = 5, nCentroids = 16, nProbe = 6)))
    println(f"IVF nCentroids=16 nProbe=6 recall=$ivf%.3f")
    for (kp <- Seq(16, 24, 32)) {
      val model = operators.Similarity.pcaFit(
        operators.Similarity.normalizedEmbeddings(emb), k = kp).get
      for (sl <- Seq(60, 80, 120)) {
        val r = recall(pairs(operators.Similarity.pcaTopK(
          queries, emb, model, k = 5, shortlist = sl)))
        println(f"PCA k'=$kp%d shortlist=$sl%d recall=$r%.3f")
      }
      for (np <- Seq(6, 8, 12)) {
        val r = recall(pairs(operators.Similarity.pcaIvfTopK(
          queries, emb, model, k = 5, nCentroids = 32, nProbe = np,
          refineIters = 2)))
        println(f"PCA+IVF k'=$kp%d nCentroids=32 nProbe=$np%d recall=$r%.3f")
      }
    }
    val full = operators.Similarity.pcaFit(
      operators.Similarity.normalizedEmbeddings(emb), k = 64).get
    val tot = full.eigenvalues.sum
    Seq(8, 16, 24).foreach(kp => println(
      f"PCA variance share k'=$kp%d: ${full.eigenvalues.take(kp).sum / tot}%.3f"))
    spark.stop()
  }
}
