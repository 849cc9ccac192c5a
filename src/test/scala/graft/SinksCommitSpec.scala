package graft

import org.apache.hadoop.fs.Path

import graft.operators.Sinks

/** Round-16 commit-protocol hardening of the versioned snapshot layout:
  *
  *  - [[Sinks.hasCommittedVersion]] is the existence gate serving paths
  *    use — it must see COMMITTED versions only (a crashed first write
  *    leaves a dir with no committed version and must read as "absent"),
  *  - marker-less legacy tables (written where the committer does not
  *    emit `_SUCCESS`) stay readable via the no-marker fallback,
  *  - [[Sinks.vacuumSnapshotIfGrown]] amortizes the streaming hot-path
  *    vacuum: no reclaim until the raw trail exceeds 2×keepLast, full
  *    vacuum after.
  */
class SinksCommitSpec extends SparkSpecBase {
  import spark.implicits._

  private def fs =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def freshDir(tag: String): String =
    s"/tmp/graft_sinkscommit_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"

  test("hasCommittedVersion: false on absent dir, false on uncommitted debris, true after commit") {
    val dir = freshDir("gate")
    assert(!Sinks.hasCommittedVersion(spark, dir), "absent dir must gate false")

    // simulate a crash during the FIRST write: v=1 exists, no _SUCCESS,
    // in-flight _temporary debris still present (so the legacy fallback
    // must NOT adopt it either)
    fs.mkdirs(new Path(s"$dir/v=1/_temporary"))
    assert(!Sinks.hasCommittedVersion(spark, dir),
      "uncommitted v=1 (crash mid-first-write) must gate false")
    intercept[IllegalArgumentException] { Sinks.readSnapshot(spark, dir) }

    // a real commit past the debris: gate flips true, reader sees it
    val v = Sinks.replaceSnapshot(spark, dir,
      Seq((1, "a")).toDF("id", "s"))
    assert(v === 2, "next version must advance past crashed debris")
    assert(Sinks.hasCommittedVersion(spark, dir))
    assert(Sinks.readSnapshot(spark, dir).count() === 1)
    fs.delete(new Path(dir), true)
  }

  test("legacy marker-less table stays readable; a marker-bearing version disables the fallback") {
    val dir = freshDir("legacy")
    Sinks.replaceSnapshot(spark, dir, Seq((1, "a"), (2, "b")).toDF("id", "s"))
    Sinks.replaceSnapshot(spark, dir, Seq((3, "c")).toDF("id", "s"))
    // strip EVERY marker — the pre-round-15 on-disk layout, or a cluster
    // whose committer never writes markers
    Seq(1, 2).foreach(v => fs.delete(new Path(s"$dir/v=$v/_SUCCESS"), false))
    assert(Sinks.hasCommittedVersion(spark, dir),
      "marker-less-but-nonempty legacy table must stay readable")
    assert(Sinks.readSnapshot(spark, dir).as[(Int, String)].collect().toSet
      === Set((3, "c")), "fallback must still serve the LATEST version")
    // in fallback mode, mid-write debris is still excluded
    fs.mkdirs(new Path(s"$dir/v=3/_temporary"))
    assert(Sinks.readSnapshot(spark, dir).as[(Int, String)].collect().toSet
      === Set((3, "c")), "in-flight _temporary dir must not be adopted")
    fs.delete(new Path(s"$dir/v=3"), true)
    // one marker-bearing version → strict mode: only IT is committed
    Sinks.replaceSnapshot(spark, dir, Seq((4, "d")).toDF("id", "s"))
    assert(Sinks.readSnapshot(spark, dir).as[(Int, String)].collect().toSet
      === Set((4, "d")),
      "a marker-bearing version must put the table back in strict mode")
    fs.delete(new Path(dir), true)
  }

  test("vacuumSnapshotIfGrown: no reclaim until the trail exceeds 2x keepLast, full vacuum after") {
    val dir = freshDir("vacgate")
    def rawCount: Int =
      fs.listStatus(new Path(dir)).count(_.getPath.getName.startsWith("v="))
    (1 to 4).foreach { i =>
      Sinks.replaceSnapshot(spark, dir, Seq((i, s"r$i")).toDF("id", "s"))
      Sinks.vacuumSnapshotIfGrown(spark, dir, keepLast = 2)
    }
    assert(rawCount === 4, "trail of 4 <= 2x keepLast=2 must not be vacuumed")
    Sinks.replaceSnapshot(spark, dir, Seq((5, "r5")).toDF("id", "s"))
    Sinks.vacuumSnapshotIfGrown(spark, dir, keepLast = 2) // 5 > 4: vacuums
    assert(rawCount === 2, "exceeding 2x keepLast must trigger a full vacuum")
    assert(Sinks.readSnapshot(spark, dir).as[(Int, String)].collect().toSet
      === Set((5, "r5")), "latest version survives the gated vacuum")
    fs.delete(new Path(dir), true)
  }
}
