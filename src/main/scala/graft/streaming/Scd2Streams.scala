package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.util.DateTimeUtils
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
  * BEHIND the key's last processed (ts, tie) — a cross-batch contract
  * violation, whether it would invert an interval, lose an equal-ts
  * tie, or merely slot before an already-folded no-op — fails the
  * stream loudly rather than silently diverging from the batch
  * operator. Null event times are dropped (CDC commit
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
  /** The open version — counter, current value, start MICROS — plus the
    * last PROCESSED row's (ts, tie): the ordering contract is "per-key
    * commit order across micro-batches", and checking arrivals against
    * only the open version's start misses two silent-divergence shapes
    * (an equal-ts row with a smaller tie, and a row older than an
    * already-folded NO-OP — no-ops advance no interval, so a late row
    * slotting before one changes what the batch operator would have
    * collapsed). Still O(1) per key. Times are kept at Spark's native
    * MICROSECOND precision (DateTimeUtils) — `Timestamp.getTime`
    * truncates to millis, which would both blind the ordering guard to
    * sub-ms reorderings and emit valid_from rounded away from the batch
    * operator's output. NOTE: adding fields changes the state-store
    * encoder schema — a checkpoint written by an older build cannot be
    * restarted against this one. That restart does NOT fail opaquely:
    * Spark's state-schema check (`spark.sql.streaming.stateStore
    * .stateSchemaCheck`, on by default) compares the checkpoint's
    * recorded state schema at query start and aborts with a
    * STATE_STORE_*_SCHEMA_NOT_COMPATIBLE error printing both schemas —
    * which is also why an in-state version FIELD would add nothing: an
    * old state row is rejected by that check before any field of it
    * could be decoded and compared. RECOVERY procedure (also in
    * README's streaming notes): start the query against a FRESH
    * checkpoint dir replaying the CDC log from the earliest offset
    * still needed — closed intervals already emitted downstream are
    * final and unaffected; the replay re-derives only the open-version
    * state. */
  final case class Scd2State(version: Int, v: Option[String], fromUs: Long,
                             lastUs: Long, lastTie: Long)

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
          // convert ONCE per row, not per sort comparison (Ordering.by
          // applies the key function on every compare) and not a third
          // time in the fold — this sits on the state function's hot path
          rows.toSeq.map(r => (DateTimeUtils.fromJavaTimestamp(r.ts), r))
            .sortBy(p => (p._1, p._2.tie))
            .foreach { case (us, r) =>
            st match {
              case None =>
                st = Some(Scd2State(1, r.v, us, us, r.tie))
              // a row behind the last PROCESSED (ts, tie) violates the
              // per-key ordering contract above (closed intervals
              // already emitted are final — no retraction channel
              // exists; even a row that only slots before a folded
              // no-op changes what the batch operator would have
              // collapsed), so folding it silently would corrupt
              // downstream history with no signal: fail LOUDLY
              // instead, naming the key (Scd2StreamsSpec pins it)
              case Some(s) if us < s.lastUs ||
                  (us == s.lastUs && r.tie < s.lastTie) =>
                throw new IllegalStateException(
                  s"scd2Stream: out-of-order CDC row for key $k — (ts, tie) " +
                    s"(${r.ts}, ${r.tie}) precedes the last processed " +
                    s"(${DateTimeUtils.toJavaTimestamp(s.lastUs)}, ${s.lastTie}); " +
                    "the stream contract requires per-key commit order across " +
                    "micro-batches")
              case Some(s) if s.v != r.v => // Option equality: null-safe
                out += Scd2Closed(k, s.version, s.v,
                  DateTimeUtils.toJavaTimestamp(s.fromUs), r.ts)
                st = Some(Scd2State(s.version + 1, r.v, us, us, r.tie))
              case Some(s) => // no-op update: CDC re-emitted the same value;
                // still advances the ordering watermark
                st = Some(s.copy(lastUs = us, lastTie = r.tie))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
      .toDF()
  }
}
