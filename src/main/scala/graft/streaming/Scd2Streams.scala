package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD Type-2 — the continuous form of
  * [[graft.operators.TemporalJoins.scd2History]]: a CDC stream folds
  * into versioned validity intervals as it arrives, instead of
  * re-deriving the whole history per batch.
  *
  * Contract (the Kafka/Debezium shape): rows arrive PER-KEY ordered
  * across micro-batches — a CDC log partitioned by entity key delivers
  * each key's changes in commit order, which is what makes closed
  * intervals final the moment they emit (no retraction channel exists
  * in append mode). Within a batch, rows are sorted by (ts, tie) before
  * folding, so any intra-batch shuffle scramble is repaired exactly as
  * the batch operator's window sort repairs it. A row that arrives
  * EARLIER than the open version's valid_from (a cross-batch contract
  * violation) fails the stream loudly rather than silently emitting an
  * inverted interval. Null event times are dropped (CDC commit
  * timestamps are non-null by construction; the batch operator would
  * sort them first, which has no meaning in a stream).
  *
  * Output (append mode): every CLOSED version the moment its successor
  * arrives — (k, version, v, valid_from, valid_to). The OPEN version
  * per key lives in the state store (version counter, current value,
  * valid_from): O(1) per key regardless of history length, because
  * closed intervals leave state the moment they emit. Stream output ∪
  * per-key open state ≡ the batch operator row-for-row
  * (Scd2StreamsSpec pins it across micro-batch splits, including
  * no-op updates and null-valued versions). */
object Scd2Streams {

  final case class Scd2Cdc(k: Long, ts: java.sql.Timestamp, tie: Long,
                           v: Option[String])
  final case class Scd2Closed(k: Long, version: Int, v: Option[String],
                              valid_from: java.sql.Timestamp,
                              valid_to: java.sql.Timestamp)
  /** The open version: counter, current value, and its start micros. */
  final case class Scd2State(version: Int, v: Option[String], fromMs: Long)

  /** `cdc` carries (k long, ts timestamp, tie long, v string). */
  def scd2Stream(cdc: DataFrame): DataFrame = {
    import cdc.sparkSession.implicits._
    cdc.select(col("k"), col("ts"), col("tie"), col("v"))
      .filter(col("ts").isNotNull)
      .as[Scd2Cdc]
      .groupByKey(_.k)
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[Scd2State]) =>
          var st = state.getOption
          val out = Seq.newBuilder[Scd2Closed]
          rows.toSeq.sortBy(r => (r.ts.getTime, r.tie)).foreach { r =>
            st match {
              case None =>
                st = Some(Scd2State(1, r.v, r.ts.getTime))
              // a row OLDER than the open version violates the per-key
              // ordering contract above (closed intervals already
              // emitted are final — no retraction channel exists), so
              // folding it silently would mint an inverted interval
              // and corrupt downstream history with no signal: fail
              // LOUDLY instead, naming the key (Scd2StreamsSpec pins it)
              case Some(s) if r.ts.getTime < s.fromMs =>
                throw new IllegalStateException(
                  s"scd2Stream: out-of-order CDC row for key $k — event time " +
                    s"${r.ts} precedes the open version's valid_from " +
                    s"${new java.sql.Timestamp(s.fromMs)}; the stream contract " +
                    "requires per-key commit order across micro-batches")
              case Some(s) if s.v != r.v => // Option equality: null-safe
                out += Scd2Closed(k, s.version, s.v,
                  new java.sql.Timestamp(s.fromMs), r.ts)
                st = Some(Scd2State(s.version + 1, r.v, r.ts.getTime))
              case Some(_) => // no-op update: CDC re-emitted the same value
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
      .toDF()
  }
}
