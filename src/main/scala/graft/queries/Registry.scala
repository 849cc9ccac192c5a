package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Queries with `oracle = None` get the
  * driver's weaker rows-only check and are pinned by ScalaTest instead.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(fn, Some(sql))
}

/** Per-process scratch-path factory — ONE source of truth for the root,
  * the call nonce, and the exit-time cleanup hook (SinkQueries,
  * ExtensionQueries, and CleaningQueries each had a private copy; only
  * SinkQueries' registered the hook, so a process that never constructed
  * a sink query leaked its scratch dirs). Paths are unique per process
  * AND per call, so re-constructing a query can never delete a directory
  * an earlier construction's still-live DataFrame reads from. */
private[queries] object Scratch {

  private val nonce = new java.util.concurrent.atomic.AtomicInteger(0)

  val root: String = s"/tmp/graft_scratch_${ProcessHandle.current().pid()}"

  // java.nio directly: the Hadoop FS may already be closed at shutdown
  private lazy val cleanupHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(root))
    }))
  }

  /** Fresh scratch path (not created on disk). */
  def dir(name: String): String = {
    cleanupHook
    s"$root/$name-${nonce.incrementAndGet()}"
  }
}

/** Oracle SQL fragments shared between queries — one source of truth for
  * the decimal-exact A6 semantics (a6_regression_metrics and
  * a8_metrics_summary embed the identical chain; keeping copies in sync
  * by hand already went wrong once). */
object OracleSql {

  /** The A6 CTE chain over `events`: lag-1 predictor, DECIMAL(17,6) sums
    * with the |x| < 1e11 domain guard, per-group metrics `m(user_id,
    * event_type, R2, MSE, Samples)` (mirrors Features.regressionMetrics —
    * see its scaladoc for the determinism rationale). */
  val a6MetricsCtes: String =
    """p AS (
      |  SELECT user_id, event_type, value,
      |    CAST(value AS DECIMAL(17,6)) AS a,
      |    lag(value) OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS pred_raw,
      |    CAST(lag(value) OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id)
      |      AS DECIMAL(17,6)) AS pred
      |  FROM events),
      |g AS (
      |  SELECT user_id, event_type, count(*) AS n,
      |    CAST(sum(CAST((a - pred) * (a - pred) AS DECIMAL(38,6))) AS DOUBLE) AS ss_res,
      |    CAST(sum(CAST(a * a AS DECIMAL(38,6))) AS DOUBLE) AS sum_a2,
      |    CAST(sum(a) AS DOUBLE) AS sum_a
      |  FROM p WHERE value IS NOT NULL AND pred_raw IS NOT NULL
      |    AND abs(value) < 1e11 AND abs(pred_raw) < 1e11
      |  GROUP BY user_id, event_type),
      |m AS (
      |  SELECT user_id, event_type,
      |    CASE WHEN sum_a2 - n * (sum_a / n) * (sum_a / n) = 0 THEN -1.0
      |         ELSE 1.0 - ss_res / (sum_a2 - n * (sum_a / n) * (sum_a / n))
      |    END AS R2,
      |    ss_res / n AS MSE,
      |    n AS Samples
      |  FROM g WHERE n >= 2)""".stripMargin
}
