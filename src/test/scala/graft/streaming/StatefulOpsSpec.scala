package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState: running totals accumulate ACROSS restarts via the state store") {
    val in = Files.createTempDirectory("graft_state_in").toString
    val ckpt = Files.createTempDirectory("graft_state_ck").toString
    val out = Files.createTempDirectory("graft_state_out").toString + "/totals"
    val schema = "user_id LONG, value DOUBLE"

    def stream = spark.readStream.schema(schema).csv(s"$in/*.csv")
    def rows() = spark.read.parquet(out).collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")),
        (r.getLong(r.fieldIndex("n_events")), r.getDouble(r.fieldIndex("sum_value")))))

    // batch 1: u1 gets 2 events, u2 gets 1
    Files.write(Paths.get(in, "b1.csv"),
      "1,10.0\n1,5.0\n2,7.0\n".getBytes(StandardCharsets.UTF_8))
    StatefulOps.startRunningTotals(stream, out, ckpt).awaitTermination()
    val r1 = rows().toMap
    assert(r1(1L) == (2L, 15.0))
    assert(r1(2L) == (1L, 7.0))

    // restart with a NEW file: state must recover from the checkpoint and
    // keep accumulating (not restart from zero)
    Files.write(Paths.get(in, "b2.csv"),
      "1,1.0\n3,2.5\n".getBytes(StandardCharsets.UTF_8))
    StatefulOps.startRunningTotals(stream, out, ckpt).awaitTermination()
    val r2 = rows()
    assert(r2.contains((1L, (3L, 16.0))), s"state did not survive restart: ${r2.toSeq}")
    assert(r2.contains((3L, (1L, 2.5))))
    // update mode: run 2 emits only touched keys -> u2 appears exactly once
    assert(r2.count(_._1 == 2L) == 1, "untouched key must not re-emit in update mode")

    // sink contract: batch_id is a partition directory that inference would
    // type IntegerType; the canonical reader pins it LongType
    val read = StatefulOps.readRunningTotals(spark, out)
    assert(read.schema("batch_id").dataType
      == org.apache.spark.sql.types.LongType)
    assert(read.select("batch_id").distinct().count() >= 2,
      "reader must see every batch partition")
  }

  test("the same logic runs in batch (groupByKey + the state fn degenerate)") {
    val batch = Seq(StatefulOps.UserEvent(1, 2.0), StatefulOps.UserEvent(1, 3.0),
      StatefulOps.UserEvent(9, 4.0)).toDS()
    val got = StatefulOps.runningUserTotals(batch).collect()
      .map(t => t.user_id -> (t.n_events, t.sum_value)).toMap
    assert(got(1L) == (2L, 5.0) && got(9L) == (1L, 4.0))
  }
}
