package graft.pipeline

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Collect per-write metrics with `Dataset.observe`: the aggregate is
  * computed by the executors WHILE the action runs, so counting the rows of
  * a write costs zero extra passes — no cache of the increment (which for a
  * large delta would spill executor disks), no second scan.
  * `observe` metrics surface through the async listener bus, so the helper
  * registers a one-shot [[QueryExecutionListener]] and awaits its delivery. */
object Observed {

  /** Run `action` on an observed copy of `df`; returns the number of rows
    * the action actually processed. */
  def countRows(df: DataFrame)(action: DataFrame => Unit): Long = {
    val name = s"graft_obs_${System.nanoTime()}"
    val spark = df.sparkSession
    val latch = new CountDownLatch(1)
    @volatile var rows = -1L
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach { m =>
          rows = m.getLong(0)
          latch.countDown()
        }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      action(df.observe(name, count(lit(1)).as("rows")))
      if (!latch.await(60, TimeUnit.SECONDS))
        throw new IllegalStateException(s"observed metric $name never delivered")
      rows
    } finally spark.listenerManager.unregister(listener)
  }
}
