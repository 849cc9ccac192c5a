package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry ↔ pin audit (round 14, VERDICT r13 item 8): the bench's
  * over-pin gate silently SKIPS any query missing from BENCH_REF — so a
  * renamed query would orphan its pin (never compared again) and a pin
  * for a deleted query would rot in the file. SparkEntry.all already
  * fails loudly on duplicate registrations; this is the inverse audit:
  * the pinned key set and the registered key set must be EQUAL.
  *
  * Parsing mirrors Bench.scala's pin reader exactly (pre-"history"
  * prefix only — history entries carry full stale queries maps), so
  * what this spec certifies is what the bench actually compares.
  *
  * Maintenance contract: a round that registers a new query must pin it
  * in the same round (append-only history entry per pin_policy) — this
  * spec is the reminder that fails the build until that happens.
  */
class RegistrationAuditSpec extends AnyFunSuite {

  private def pinnedKeys(): Set[String] = {
    val p = java.nio.file.Paths.get("BENCH_REF.json")
    assert(java.nio.file.Files.exists(p), "BENCH_REF.json missing")
    val txt = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val head = txt.indexOf("\"history\"") match {
      case -1 => txt
      case i => txt.substring(0, i)
    }
    val qblock = head.substring(head.indexOf("\"queries\":{") + 11)
    "\"([A-Za-z0-9_]+)\":(-?[0-9][0-9.eE+-]*)".r.findAllMatchIn(qblock)
      .map(_.group(1)).toSet
  }

  test("every registered query has a BENCH_REF pin and every pin names " +
    "a registered query") {
    val registered = SparkEntry.queries.keySet
    val pinned = pinnedKeys()
    val unpinned = registered -- pinned
    val orphaned = pinned -- registered
    assert(unpinned.isEmpty,
      s"registered but UNPINNED (add to BENCH_REF with a history entry): " +
        s"${unpinned.toSeq.sorted.mkString(", ")}")
    assert(orphaned.isEmpty,
      s"pinned but NOT registered (renamed/deleted query left a stale " +
        s"pin): ${orphaned.toSeq.sorted.mkString(", ")}")
  }
}
