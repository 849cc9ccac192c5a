package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Sinks

/** Pins the PLAN contract of bucketed persistence (Sinks.writeBucketed):
  * a join of two tables bucketed on the join key must read pre-clustered
  * data and plan NO shuffle of either side — the property that makes
  * repeated fact-table joins affordable at 100 TB. The value-level
  * contract (bucketed read-back + join == plain join) is oracle-checked
  * by the opt_bucketed_join query; this spec checks what the oracle
  * can't see: the physical plan. */
class BucketingSpec extends SparkSpecBase {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("join of two same-key bucketed tables plans zero exchanges; unbucketed plans two") {
    val dir = Files.createTempDirectory("graft_bucket").toString
    val e = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("value"))
    val d = e.groupBy(col("user_id")).agg(count(lit(1)).as("user_n"))
    Sinks.writeBucketed(e, "spec_bucketed_fact", s"$dir/fact", Seq("user_id"), 4)
    Sinks.writeBucketed(d, "spec_bucketed_dim", s"$dir/dim", Seq("user_id"), 4)

    // disable broadcast so the join shape is sort-merge either way — the
    // comparison isolates what bucketing (not small-table broadcast) buys
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val bucketed = spark.table("spec_bucketed_fact")
        .join(spark.table("spec_bucketed_dim"), "user_id")
      bucketed.collect() // let AQE finalize the plan
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$bucketedPlan")

      val plain = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim"), "user_id")
      plain.collect()
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"),
        s"control: the unbucketed read of the same files must shuffle:\n$plainPlan")

      // same answer either way
      assert(bucketed.count() === plain.count())
    }
  }
}
