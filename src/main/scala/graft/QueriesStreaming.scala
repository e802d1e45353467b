package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.DistinctSketch
import graft.streaming.{FunnelStream, Replay, StreamingOps}

/** Streaming tiers lifted to the ORACLE contract: each query replays the
  * same parquet rows the batch twin reads as N micro-batches through the
  * streaming operator ([[graft.streaming.Replay]]) and returns the final
  * sink table — hash-checked by DuckDB against the SAME oracle SQL as the
  * batch query. This is strictly stronger than the in-spec streaming≡batch
  * assertions: the streaming result now faces the independent engine, so a
  * shared Spark-side bug in both tiers can't self-confirm.
  *
  * bench=false in the registry: the replay collects verify-SF rows to the
  * driver to control micro-batch boundaries (the harness's documented
  * seam) — not a scale-representative throughput path. The production
  * shape is `readStream` + the same transform; its scale story (bounded
  * state via watermarks / by-construction register bounds) is documented
  * on each operator.
  */
object QueriesStreaming {

  // -------------------------------------------------------------------
  // q133 — the q96 ordered funnel, computed BY THE STREAM: events replayed
  // event-time-sorted in 8 micro-batches through the per-entity
  // flatMapGroupsWithState funnel; the final per-user stage is the max of
  // the emitted advances. Oracle: q96's SQL, verbatim — for in-order
  // arrival the streaming funnel is batch-identical (the operator's
  // documented guarantee, here proven against DuckDB instead of against
  // our own batch code). idleTimeout is effectively disabled (decades):
  // a mid-replay state expiry would forget progress and re-emit stage 1,
  // which the CONTINUOUS operator accepts as its bounded-state trade but
  // would break whole-history replay equality.
  // -------------------------------------------------------------------
  def funnelStreamReplay(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .orderBy(col("ts"), col("user_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)].collect().toSeq
    val advances = Replay.replay(spark, rows, numBatches = 8,
        OutputMode.Append) { ds =>
      FunnelStream.funnelStream(ds.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        watermark = "1 hour", idleTimeout = "3650 days").toDF()
    }
    advances.groupBy(col("entity").as("user_id"))
      .agg(max(col("reached")).cast("long").as("reached"))
      .select(col("user_id"), col("reached"))
      .orderBy(col("user_id"))
  }

  // -------------------------------------------------------------------
  // q134 — the q119 distinct-count registers, maintained BY THE STREAM:
  // lineitem rows replayed in 8 micro-batches through the Complete-mode
  // register aggregation; the sink table after the last batch is the full
  // register state, summarized exactly like the batch tier. Oracle:
  // q119's SQL, verbatim — max-of-rho state is commutative, associative
  // and idempotent, so ANY batching must land on the identical registers
  // (no ordering of the replay is even needed; the default row order is
  // kept deliberately, exercising the no-order-guarantee claim).
  // -------------------------------------------------------------------
  def distinctRegistersStreamReplay(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_orderkey"))
    val rows = li.as[(String, Long)].collect().toSeq
    val regs = Replay.replay(spark, rows, numBatches = 8,
        OutputMode.Complete) { ds =>
      StreamingOps.distinctRegistersStream(
        ds.toDF("l_returnflag", "l_orderkey"), "l_returnflag", "l_orderkey")
    }
    val sk = DistinctSketch.summary(regs, Seq("l_returnflag"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
    sk.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_distinct"),
        col("reg_sum"), col("registers_hit"))
      .orderBy(col("l_returnflag"))
  }
}
