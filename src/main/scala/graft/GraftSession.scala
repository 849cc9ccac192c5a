package graft

import org.apache.spark.sql.SparkSession

/** The ONE engine-level session configuration (round 17, VERDICT r16
  * item 3): Bench, Plans, Verify and Serve previously each assembled
  * their own builder, and the round-16 AQE coalesce floor lived only in
  * the Bench/Plans builders — so the plans the bench measured were not
  * the plans Verify (or a production entry point) ran. Everything that
  * is ENGINE tuning (not harness instrumentation) now comes from here;
  * the entry points add only their own surface-specific knobs (event
  * logging for Plans, nothing for Verify).
  *
  * Shared configs:
  *  - `spark.sql.session.timeZone=UTC` + `nanosAsLong`: the fixture
  *    contract (deterministic timestamps across engines).
  *  - AQE on, with `coalescePartitions.minPartitionSize` floored at 256k
  *    (env `SPARK_GRAFT_AQE_MIN_PARTITION_SIZE`): CPU-dense-per-byte
  *    stages (hash fan-outs, codec chains, vector math) shuffle few
  *    bytes; AQE's byte-proxy coalescing at the 1 MB default collapses
  *    them to ONE partition and serializes the compute. The lower floor
  *    lets parallelismFirst deliver cluster width at small byte sizes;
  *    stages shuffling real volume are unaffected, and at production
  *    data volumes the floor is never the binding constraint (round 16,
  *    guide §2.2 — measured two-sided: 64k regressed small joins 3x and
  *    was rejected; 256k holds both families).
  *  - per-process warehouse dir: concurrent sessions must not share a
  *    derby metastore.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "256k"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current().pid()}")
}
