package graft

import org.apache.spark.sql.functions._

/** Registration-posture audit (round 12 — the mb_assoc lesson): an
  * operator's scale defense is only as good as the PARAMETERS its
  * registration passes. Round 11's mb_assoc_rules registered the
  * apriori miner at minSupport=2 on data where every item occurs ≥11
  * times — the prune was decorative and the full pair self-join ran as
  * the bench's most expensive row. This spec pins the production
  * posture of every registration class with a parameterized scale
  * defense, so a future re-registration at a degenerate value fails CI
  * instead of silently burning the pair budget.
  */
class RegistrationAuditSpec extends SparkSpecBase {

  test("mb_assoc posture: the registered 50-permille support DEMONSTRABLY " +
    "prunes on the fixture data (items pruned, pair budget reduced)") {
    // the same basket relation the registration builds (user-day
    // sessions, event-type head + props-tag tail), at the registered
    // threshold — via the oracle-checked pruneStats operator
    val e = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val bk = concat(col("user_id").cast("string"), lit("_"),
      col("ts").cast("date").cast("string"))
    val baskets = e.filter(col("event_type").isNotNull)
      .select(bk.as("bk"), col("event_type").as("it"))
      .unionByName(e.filter(col("props").isNotNull &&
          get_json_object(col("props"), "$.k").isNotNull)
        .select(bk.as("bk"),
          concat(lit("k"), get_json_object(col("props"), "$.k")).as("it")))
    val r = graft.operators.Association
      .pruneStats(baskets, "bk", "it", minSupportMilli = 50L).head()
    val (nPruned, before, after) =
      (r.getAs[Long]("n_pruned"), r.getAs[Long]("pairs_before"),
        r.getAs[Long]("pairs_after"))
    assert(nPruned > 0L,
      "the registered support prunes NOTHING - the round-11 decorative-" +
        "prune failure mode; raise minSupportMilli or fix the item domain")
    assert(after < before,
      s"the prune did not reduce the pair budget ($before -> $after)")
    // and the defense is material, not cosmetic: >= half the items
    // pruned, pair budget cut >= 2x (measured: 100/105 items, ~7x)
    assert(nPruned * 2 >= r.getAs[Long]("n_items"))
    assert(after * 2 <= before)
  }

  test("O(n^2) ground-truth registrations keep the default loud caps - " +
    "no registration silently overrides a scale guard upward") {
    // source-level lint: every queries/-side call of a guarded
    // ground-truth operator must rely on the operator's own default cap
    // (maxRows / maxPairsInput / maxPairBudget). Passing a bigger cap
    // from a registration would re-create the hazard the guard exists
    // to catch, silently.
    val guarded = Seq("jaccardPairs", "containmentPairs",
      "trainingPairsExact", "pairRules", "pairRulesRel")
    val overrides = Seq("maxRows", "maxPairsInput", "maxPairBudget")
    val dir = new java.io.File("src/main/scala/graft/queries")
    assert(dir.isDirectory, s"queries source dir missing: ${dir.getAbsolutePath}")
    val offenders = dir.listFiles().filter(_.getName.endsWith(".scala"))
      .flatMap { f =>
        val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        guarded.flatMap { op =>
          var idx = txt.indexOf(op + "(")
          var hits = List.empty[String]
          while (idx >= 0) {
            // scan this call's argument span (to the matching paren)
            var depth = 0; var i = idx + op.length; var end = -1
            while (end < 0 && i < txt.length) {
              txt.charAt(i) match {
                case '(' => depth += 1
                case ')' => depth -= 1; if (depth == 0) end = i
                case _ =>
              }
              i += 1
            }
            val span = txt.substring(idx, if (end < 0) txt.length else end)
            if (overrides.exists(o => span.contains(o + " =")))
              hits ::= s"${f.getName}: $op overrides a scale cap"
            idx = txt.indexOf(op + "(", idx + 1)
          }
          hits
        }
      }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("every O(n^2) ground-truth family registers a banded/bucketed " +
    "production twin alongside the reference row") {
    // the *_prod / lsh convention: ground-truth rows certify recall,
    // production rows prove the scale path exists. Pin the pairing so
    // deleting a production twin (or adding a ground-truth row without
    // one) fails here, not in a verdict.
    val q = SparkEntry.queries.keySet
    val pairs = Seq(
      "dedup_ngram_jaccard" -> "dedup_minhash_lsh",
      "dedup_containment" -> "dedup_minhash_lsh",
      "dedup_embedding_cosine" -> "dedup_embedding_cosine_lsh",
      "ext_training_pairs" -> "ext_training_pairs_prod",
      "dedup_simhash_pairs" -> "dedup_simhash_prod",
      "ext_decontaminate" -> "ext_decontaminate_prod",
      "mb_assoc_rules" -> "mb_assoc_prune_stats")
    pairs.foreach { case (truth, prod) =>
      assert(q.contains(truth), s"ground-truth row $truth vanished")
      assert(q.contains(prod),
        s"$truth has no production-posture twin $prod")
    }
  }
}
