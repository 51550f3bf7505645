package graft

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Telemetry for silent-drop guards (LSH bucket caps, stop-shingle caps).
  *
  * A cap that protects a join from skew is a RECALL knob at scale — a
  * pipeline must be able to see what it cost. Queries attach a named
  * [[Observation]] to the frame that decides the drop; Bench reads the
  * completed metrics after each run and emits them in its JSON line
  * (`"telemetry": {...}`). At fixture scale every counter is 0 — the caps
  * are sized never to fire there; non-zero values at production scale are
  * the signal to re-shard or raise the cap.
  *
  * Metrics ride Spark's CollectMetrics (zero extra jobs, evaluated inside
  * the existing action); the registry keeps the latest observation per
  * name, so re-running a query (Bench's warmup + 3 iterations) just
  * refreshes the value.
  */
object CapTelemetry {
  private val reg =
    scala.collection.concurrent.TrieMap.empty[String, Observation]

  /** Attach a fresh observation named `name` computing `metric` (an
    * aggregate expression) over `df`'s rows. Latest attachment wins. */
  def observed(df: DataFrame, name: String, metric: Column): DataFrame = {
    val o = Observation()
    reg.put(name, o)
    df.observe(o, metric.as(name))
  }

  /** Completed metric values, latest per name. Non-blocking: observations
    * whose query never executed are skipped (their future is pending). */
  def snapshot(): Map[String, Long] =
    reg.toMap.flatMap { case (n, o) =>
      for {
        tried <- o.future.value
        row   <- tried.toOption
        v     <- scala.util.Try(row.getAs[Long](n)).toOption
      } yield n -> v
    }
}
