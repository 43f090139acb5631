package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators (builder prompt: "`KeyValueGrouped
  * Dataset.mapGroupsWithState`/`flatMapGroupsWithState` for custom state").
  *
  * [[runningUserTotals]] keeps one small state record per user and emits the
  * updated running aggregate every micro-batch — the canonical shape for
  * streaming feature accumulation (per-source ingest counters, per-user
  * quality stats, dedup bloom state…). State lives in the checkpointed
  * state store: exactly-once across restarts, proven in
  * `StatefulOpsSpec` by killing and restarting the query mid-stream.
  *
  * At scale: state is partitioned by the grouping key across executors;
  * the per-key record must stay O(1) (here: 2 longs + a double) — unbounded
  * per-key state is the streaming anti-pattern the timeout parameter exists
  * to cap.
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  def updateUser(userId: Long, events: Iterator[UserEvent],
                 state: GroupState[UserTotals]): UserTotals = {
    val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
    var n = prev.n_events
    var s = prev.sum_value
    events.foreach { e => n += 1; s += e.value }
    val next = UserTotals(userId, n, s)
    state.update(next)
    next
  }

  /** Running (n_events, sum_value) per user over a stream of
    * `(user_id, value)` rows. Works on a batch Dataset too (groupByKey +
    * mapGroups degenerate), but the point is the streaming state store.
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout())(updateUser)
  }

  /** Start the stateful query: update-mode rows written to parquet via
    * foreachBatch (the memory sink cannot recover from a checkpoint; a
    * foreachBatch sink can). Each micro-batch OVERWRITES its own
    * `batch_id=N` partition directory — foreachBatch is at-least-once, so
    * a batch replayed after a partial write must replace its earlier
    * attempt, not append duplicate rows next to it; overwrite-by-batch-id
    * is the standard idempotent-sink recipe for exactly-once output.
    */
  def startRunningTotals(events: DataFrame, outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = events.sparkSession
    import spark.implicits._
    runningUserTotals(events.as[UserEvent]).writeStream
      .foreachBatch { (batch: Dataset[UserTotals], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Read the [[startRunningTotals]] sink. `batch_id` is a PARTITION
    * DIRECTORY, not a data column, so schema inference would type it
    * IntegerType for small ids and LongType past 2³¹ — this reader pins
    * the sink contract to LongType (the type of foreachBatch's batchId)
    * regardless of the ids present. External readers should do the same
    * (or read single batch directories and ignore the column).
    */
  def readRunningTotals(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", outDir).parquet(outDir)
      .withColumn("batch_id", col("batch_id").cast("long"))
}
