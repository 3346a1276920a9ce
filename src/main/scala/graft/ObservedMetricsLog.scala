package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Prints every `Dataset.observe` metric to stderr when its query
  * completes — the zero-cost channel for "no silent caps" telemetry
  * (e.g. q34's shingle df-cap emits q34_shingles_{pre,post}_cap so a
  * driver log shows exactly how many candidate rows the cap dropped).
  */
object ObservedMetricsLog {
  def register(spark: SparkSession): Unit =
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val m = qe.observedMetrics
        if (m.nonEmpty)
          System.err.println("[observed] " + m.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(" "))
      }
      override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit = ()
    })
}
