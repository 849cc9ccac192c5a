package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Tables, operators}

/** Dev-only timing probe for the emb_pca_fit row's pieces. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("warmup count")(emb.count())
    var model: operators.Similarity.PcaModel = null
    t("pcaFit k=64") { model = operators.Similarity.pcaFit(emb, 64).get }
    t("pcaFit k=64 again")(operators.Similarity.pcaFit(emb, 64).get)
    val proj = operators.Similarity.pcaProject(emb, model)
    t("project+noop")(proj.write.format("noop").mode("overwrite").save())
    t("project+noop 2nd")(proj.write.format("noop").mode("overwrite").save())
    val proj2 = operators.Similarity.pcaProject(emb, model)
    t("project fresh plan")(proj2.write.format("noop").mode("overwrite").save())
    t("project+posexplode+var")(
      proj.select(posexplode(col("pca")).as(Seq("pos", "x")))
        .groupBy(col("pos")).agg(var_pop(col("x")).as("v"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
