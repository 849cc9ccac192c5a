package graft

import graft.operators.Association

/** Pins Association.pairRules semantics on a hand-checkable basket set:
  * exact counts, the integer confidence gate (directional), apriori
  * pruning, duplicate-row immunity, and loud guards. */
class AssociationSpec extends SparkSpecBase {
  import spark.implicits._

  // b1:{A,B,C} b2:{A,B} b3:{A,C} b4:{B,D} b5:{A}
  // n(A)=4 n(B)=3 n(C)=2 n(D)=1 ; pairs: (A,B)=2 (A,C)=2 (B,C)=1 (B,D)=1
  private val baskets = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "C"),
    (4L, "B"), (4L, "D"),
    (5L, "A")
  ).toDF("bk", "it")

  private def rules(minConfMilli: Long,
                    df: org.apache.spark.sql.DataFrame = baskets) =
    Association.pairRules(df, "bk", "it",
      minSupport = 2L, minConfMilli = minConfMilli)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))).toMap

  test("hand-checked rules: counts, confidence, lift exact") {
    val m = rules(500)
    assert(m.keySet === Set(("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")))
    // A→B: 2/4 = 0.5 ; lift = 5·2/(4·3)
    assert(m(("A", "B"))=== ((2L, 4L, 3L, 5L, 0.5, 10.0 / 12.0)))
    // B→A: 2/3 ; C→A hits confidence 1.0
    assert(m(("B", "A")) === ((2L, 3L, 4L, 5L, 2.0 / 3.0, 10.0 / 12.0)))
    assert(m(("C", "A")) === ((2L, 2L, 4L, 5L, 1.0, 1.25)))
  }

  test("confidence gate is directional and exact at the boundary") {
    // at 500 milli the 0.5-confidence directions pass (>= is inclusive);
    // at 501 they drop while the reverse directions survive
    val tight = rules(501)
    assert(tight.keySet === Set(("B", "A"), ("C", "A")))
  }

  test("apriori prune and the support floor exclude rare pairs") {
    val m = rules(0)
    // (B,C) co-occurs once (< minSupport) and D is infrequent: neither
    // appears in any direction even with the confidence gate open
    assert(!m.keySet.exists { case (a, c) => a == "D" || c == "D" })
    assert(!m.contains(("B", "C")) && !m.contains(("C", "B")))
  }

  test("duplicate (basket, item) rows and nulls do not distort counts") {
    val noisy = baskets
      .union(Seq((1L, "A"), (1L, "A")).toDF("bk", "it")) // repeat lines
      .union(Seq((6L, null.asInstanceOf[String])).toDF("bk", "it"))
    assert(rules(500, noisy) === rules(500))
  }

  test("guards fail loud") {
    intercept[IllegalArgumentException] {
      Association.pairRules(baskets, "bk", "it", 0L, 100L)
    }
    intercept[IllegalArgumentException] {
      Association.pairRules(baskets, "bk", "it", 2L, 1001L)
    }
  }

  test("pair-budget guard: a mega-basket fails loud BEFORE the self-join") {
    // one basket of 200 items = C(200,2) = 19900 post-prune pairs at
    // minSupport=1 (every item frequent)
    val mega = (1 to 200).map(i => (1L, s"i$i")).toDF("bk", "it")
    val e = intercept[IllegalArgumentException] {
      Association.pairRules(mega, "bk", "it", 1L, 0L,
        maxPairBudget = 10000L)
    }
    assert(e.getMessage.contains("19900") &&
      e.getMessage.contains("maxPairBudget=10000"))
    // the identical call with an adequate budget runs: 19900 pairs exist
    // but only those with support >= 1 and conf gate 0 survive — all of
    // them, 2 directions each
    assert(Association.pairRules(mega, "bk", "it", 1L, 0L,
      maxPairBudget = 20000L).count() === 39800L)
  }

  test("relative support: threshold = ceil(milli * n_baskets / 1000)") {
    // 5 baskets, 400 milli -> ceil(2.0) = 2: identical to minSupport=2
    val rel = Association.pairRulesRel(baskets, "bk", "it", 400L, 500L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rel === Set(("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")))
    // 401 milli -> ceil(2.005) = 3: only A (n=4) and B (n=3) survive the
    // item prune, and no pair reaches support 3 -> empty
    assert(Association.pairRulesRel(baskets, "bk", "it", 401L, 0L)
      .count() === 0L)
  }

  test("pruneStats reports the prune's exact effect as data") {
    // 400 milli -> threshold 2: D (n=1) is pruned; pairs_before =
    // C(3,2)+C(2,2 items... per-basket sizes 3,2,2,2,1 -> 3+1+1+1+0 = 6;
    // after dropping D, basket 4 shrinks to {B}: 3+1+1+0+0 = 5
    val r = Association.pruneStats(baskets, "bk", "it", 400L).head()
    assert(r.getLong(0) === 5L) // n_baskets
    assert(r.getLong(1) === 4L) // n_items
    assert(r.getLong(2) === 3L) // n_frequent
    assert(r.getLong(3) === 1L) // n_pruned
    assert(r.getLong(4) === 6L) // pairs_before
    assert(r.getLong(5) === 5L) // pairs_after
  }
}
