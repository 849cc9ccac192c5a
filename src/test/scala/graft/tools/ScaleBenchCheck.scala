package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 ask #7 — composed-pipeline cost curve at sf1. The driver's
  * read-only test data tops out at sf0.1, so the 10× datapoint runs on a
  * SURROGATE sf1 built by replicating sf0.1 ten times with:
  *
  *  - events: per-copy user_id/event_id offsets — 10× the GROUPS at the
  *    same per-group depth, which is how a real corpus grows (more
  *    entities), and the shape under which a linear pipeline should
  *    measure ~10×;
  *  - documents: doc_id offsets and PER-DOC deterministic WORD-ORDER
  *    scrambles (sort words by xxhash64(word, copy, doc_id)) — token/
  *    char/quality statistics are preserved exactly (same multiset)
  *    while shingle n-grams differ completely, so the dedup stages see
  *    a realistic ~flat near-dup rate. The per-DOC salt is load-
  *    bearing: a first cut salted by copy alone CANONICALIZED word
  *    order within each copy, which inflated cross-doc shingle overlap
  *    ~25,000× (one band bucket reached 5,277 docs / 13.9M candidate
  *    pairs) and read as a phantom 126× super-linearity in the
  *    curation DAG — a fixture artifact, not a plan defect
  *    (BENCH_SF1.md records both runs);
  *  - embeddings: vec_id offsets and noise-dominated per-copy
  *    perturbations (±0.5·U[-1,1) per dim from xxhash64) — copies land
  *    ~uncorrelated (isotropy, the hard case — the ScaleRecallCheck
  *    argument).
  *
  * For each composed row the tool times median-of-3 noop
  * materializations (the Bench methodology: construction untimed, fresh
  * frame per pass, checkpoint blocks dropped between passes) at sf0.1
  * and at the surrogate sf1, and prints the ratio. ~10× is the linear
  * expectation; a materially super-linear row is a plan-audit flag
  * (results go to BENCH_SF1.md).
  *
  * Usage: sbt "Test/runMain graft.tools.ScaleBenchCheck [queryName ...]"
  */
object ScaleBenchCheck {

  private val Copies = 10

  private[tools] def buildSurrogate(spark: SparkSession, src: String,
                                    dst: String): Unit = {
    val copies = spark.range(Copies).select(col("id").cast("int").as("c"))

    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.crossJoin(broadcast(copies))
      .select(
        (col("event_id") + col("c").cast("long") * 1000000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("c").cast("long") * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.crossJoin(broadcast(copies))
      .select(
        (col("doc_id") + col("c").cast("long") * 1000000000L).as("doc_id"),
        // word-order scramble per copy: multiset-preserving, shingle-
        // destroying (array_sort on struct sorts by the hash field)
        expr("""array_join(transform(array_sort(transform(
                  split(text, ' '),
                  w -> struct(xxhash64(w, c, doc_id) AS h, w AS w))),
                  s -> s.w), ' ')""").as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    // lineitem (round 13 — graph rows build co-purchase edges from it):
    // per-copy offsets on the graph keys (orderkey, partkey, suppkey) →
    // 10 DISJOINT graph copies, the linear-expectation growth shape
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    li.crossJoin(broadcast(copies))
      .select(li.columns.map {
        case k @ ("l_orderkey" | "l_partkey" | "l_suppkey") =>
          (col(k) + col("c").cast("long") * 1000000000L).as(k)
        case other => col(other)
      }: _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.crossJoin(broadcast(copies))
      .select(
        (col("vec_id") + col("c").cast("long") * 1000000000L).as("vec_id"),
        expr("""transform(embedding, (x, j) -> CAST(x +
                  CASE WHEN c = 0 THEN 0.0D ELSE
                    ((CAST(pmod(xxhash64(vec_id, c, j), 2000) AS DOUBLE)
                      / 1000.0D - 1.0D) * 0.5D) END AS FLOAT))""")
          .as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val rows =
      if (args.nonEmpty) args.toSeq
      else Seq("ext_corpus_curation", "pipeline_e2e_routed",
        "pipeline_e2e_seq", "pipeline_e2e_ar1", "ext_training_pairs_prod")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/graft_sf1"
    println("building sf1 surrogate (10x sf0.1) ...")
    buildSurrogate(spark, sf01, sf1)
    for (t <- Seq("events", "documents", "embeddings"))
      println(f"  $t%-12s ${spark.read.parquet(s"$sf1/$t.parquet").count()}%9d rows")

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmup
    materialize(graft.Tables.events(spark, sf01).groupBy(lower(col("event_type"))).count())

    // SPARK_GRAFT_TIME_CONSTRUCTION=1 times fn() + materialize TOGETHER —
    // the honest mode for stream_* rows, whose micro-batch stream RUNS
    // during construction (the Bench methodology deliberately leaves
    // construction untimed, which for those rows times only the final
    // comparison frame)
    val timeConstruction =
      sys.env.get("SPARK_GRAFT_TIME_CONSTRUCTION").contains("1")
    def timed(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      Array.fill(3) {
        val t0c = System.nanoTime()
        val df = fn(spark, dir)
        val t0 = if (timeConstruction) t0c else System.nanoTime()
        materialize(df)
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        sec
      }.sorted.apply(1)
    }

    println(f"${"query"}%-24s ${"sf0.1 s"}%9s ${"sf1 s"}%9s ${"ratio"}%7s")
    for (name <- rows) {
      val a = timed(name, sf01)
      val b = timed(name, sf1)
      println(f"$name%-24s $a%9.2f $b%9.2f ${b / a}%7.2f")
    }
    spark.stop()
  }
}
