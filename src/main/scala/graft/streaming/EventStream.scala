package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference's "streaming" is only
  * row-at-a-time async result push (`OSQLAsynchQuery`, SURVEY.md §2.10
  * — no watermarks/windows/state anywhere), so this is an extension
  * beyond parity: the `events` table schema as an unbounded stream.
  *
  * Scale design: windowed aggregation is partial-aggregated per
  * micro-batch before the state-store shuffle; watermarks bound state;
  * sessionization keeps per-key state in `flatMapGroupsWithState`
  * (co-partitioned by user, timing out via event-time watermark).
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** file-source stream over a directory of event parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", 8) // bound micro-batch size
      .parquet(dir)

  /** tumbling-window counts/sums per event type with a watermark that
    * bounds state retention. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** stream-STREAM interval join: pair each left event with right
    * events of the same user arriving within `intervalSec` AFTER it.
    * Both sides carry watermarks and the join condition bounds the
    * time range in both directions — the two things Structured
    * Streaming needs to know when buffered rows can never match again,
    * so state stays bounded (an unconstrained stream-stream join
    * buffers both streams forever at 100 TB/day). The join itself is
    * co-partitioned by the equi-key; state lives in the per-partition
    * store. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String, intervalSec: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
      .select(col(keyCol).as("__k"), col("ts").as("l_ts"),
        col("event_id").as("l_id"), col("event_type").as("l_type"))
    val r = right.withWatermark("ts", watermarkDelay)
      .select(col(keyCol).as("__rk"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("event_type").as("r_type"))
    l.join(r,
      col("__k") === col("__rk") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $intervalSec seconds"))
      .select(col("__k").as(keyCol), col("l_id"), col("r_id"),
        col("l_type"), col("r_type"), col("l_ts"), col("r_ts"))
  }

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int,
      total: Double)
  final case class Session(user_id: Long, start: Timestamp,
      end: Timestamp, n_events: Int, total_value: Double)

  /** event-time sessionization: per-user sessions closed after
    * `gapMs` of inactivity (custom state machine the reference could
    * never express — `mapGroupsWithState` surface).
    *
    * The watermark EventTimeTimeout requires is applied here
    * (`watermarkDelay`); out-of-order events within the gap extend the
    * session without moving its boundaries backwards. */
  def sessionize(events: Dataset[Ev], gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // late events extend but never shrink the session
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp: a timeout at/behind the watermark throws and
              // kills the query (lagging replays land here)
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.last + gapMs, wm + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** full-microsecond epoch value of a Timestamp — `getTime * 1000`
    * truncates to milliseconds, diverging from the batch funnel's
    * `unix_micros` time base on sub-millisecond components. `getNanos`
    * carries the complete fractional second, so micros = whole seconds
    * + nanos/1000. */
  private def tsUs(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def usToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  final case class FunnelProg(times: List[Long]) // micros, head = last
  final case class FunnelHit(user_id: Long, steps_reached: Int,
      t_first: Timestamp, t_last: Timestamp, converted: Boolean)

  /** Streaming ordered funnel — [[graft.ops.Funnel.orderedFunnel]]'s
    * real-time shape: per user, bind `steps` event types IN ORDER,
    * each within `windowUs` of the previous binding; emit a
    * `converted = true` row the moment the last step binds (state
    * clears — the funnel restarts for repeat conversions), and emit
    * the partial progress with `converted = false` when the event-time
    * timeout passes the open window (once `windowUs` elapses after the
    * last binding no later event can extend the chain, so the state is
    * dead weight — bounded state by construction: ≤ one in-flight
    * chain per active user).
    *
    * Semantics trade vs batch (documented, the sessionize "never
    * shrink" precedent): bindings are leftmost-greedy in event-time
    * order WITHIN each micro-batch, but an out-of-order event arriving
    * after its step already bound does NOT rebind — batch, which sees
    * all events at once, would have bound the earlier one. Fed
    * in-order, the first conversion per user matches the batch funnel
    * row exactly (spec-pinned). */
  def streamingFunnel(events: Dataset[Ev], steps: Seq[String],
      windowUs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[FunnelHit] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProg, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[FunnelProg]) =>
          def hit(times: List[Long], conv: Boolean) =
            FunnelHit(uid, times.size, usToTs(times.last),
              usToTs(times.head), conv)
          if (state.hasTimedOut) {
            val t = state.get.times
            state.remove()
            Iterator(hit(t, conv = false))
          } else {
            var times = state.getOption.map(_.times).getOrElse(Nil)
            var out = List.empty[FunnelHit]
            evs.toSeq.sortBy(e => (tsUs(e.ts), e.event_id)).foreach { e =>
              val k = times.size
              if (k < steps.size && e.event_type == steps(k)) {
                val tUs = tsUs(e.ts)
                if (times.isEmpty ||
                    (tUs > times.head && tUs - times.head <= windowUs)) {
                  times = tUs :: times
                  if (times.size == steps.size) {
                    out ::= hit(times, conv = true)
                    times = Nil
                  }
                }
              }
            }
            if (times.nonEmpty) {
              state.update(FunnelProg(times))
              val wm = state.getCurrentWatermarkMs()
              // ceil to ms: a floor-rounded timeout could fire one ms
              // before the true window end and drop a boundary event
              state.setTimeoutTimestamp(math.max(
                Math.floorDiv(times.head + windowUs + 999L, 1000L), wm + 1))
            } else if (state.exists) state.remove()
            out.reverseIterator
          }
      }
  }

  final case class TouchState(tUs: Long, channel: String)
  final case class Attribution(user_id: Long, event_id: Long,
      ts: Timestamp, channel: String)

  /** Streaming last-touch attribution —
    * [[graft.ops.Funnel.lastTouchAttribution]]'s real-time shape: per
    * user, state is ONLY the latest touch (one (time, channel) pair —
    * bounded by the active-user count, and evicted by event-time
    * timeout once the lookback window passes with no activity: an
    * expired touch can never attribute). Each conversion emits its
    * attributed channel the moment it arrives; same tie discipline as
    * batch (same-microsecond touches attribute, equal-time touches
    * resolve by event id).
    *
    * Streaming trade (documented, the funnel precedent): events are
    * time-ordered WITHIN each micro-batch, but a touch arriving in a
    * LATER batch cannot retro-attribute an already-emitted conversion
    * (append-mode contract). Fed in order, every conversion's channel
    * matches the batch operator exactly (spec-pinned). */
  def streamingAttribution(events: Dataset[Ev], convType: String,
      windowUs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Attribution] = {
    require(windowUs > 0, "attribution window must be positive")
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[TouchState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption
            var out = List.empty[Attribution]
            evs.toSeq.sortBy(e => (tsUs(e.ts),
                if (e.event_type == convType) 1 else 0, e.event_id))
              .foreach { e =>
                val t = tsUs(e.ts)
                if (e.event_type == convType) {
                  // t >= s.tUs guard: an out-of-order feed could leave a
                  // touch in state whose event time is AFTER this
                  // conversion — a pairing the batch operator can never
                  // produce. Degrade to '(none)' instead of attributing
                  // a future channel.
                  val ch = last match {
                    case Some(s) if t >= s.tUs && t - s.tUs <= windowUs =>
                      s.channel
                    case _ => "(none)"
                  }
                  out ::= Attribution(uid, e.event_id, e.ts, ch)
                } else if (last.forall(t >= _.tUs)) {
                  last = Some(TouchState(t, e.event_type))
                }
              }
            last match {
              case Some(s) =>
                state.update(s)
                val wm = state.getCurrentWatermarkMs()
                // ceil to ms (the funnel's boundary discipline)
                state.setTimeoutTimestamp(math.max(
                  Math.floorDiv(s.tUs + windowUs + 999L, 1000L), wm + 1))
              case None => if (state.exists) state.remove()
            }
            out.reverseIterator
          }
      }
  }

  final case class MtTouch(tUs: Long, id: Long, ch: String)
  final case class MtState(touches: List[MtTouch])
  final case class MtCredit(user_id: Long, event_id: Long,
      ts: Timestamp, channel: String, credit_micro: Long)

  /** Streaming MULTI-touch attribution —
    * [[graft.ops.Funnel.multiTouchAttribution]]'s real-time shape,
    * completing the attribution family: per user the state is a
    * CAPPED in-window touch list (newest `maxTouches` kept), and each
    * conversion emits one credit row per qualifying touch the moment
    * it arrives, with the batch operator's EXACT integer credit rules
    * (linear telescoping `i·10⁶ div k − (i−1)·10⁶ div k`; U-shaped
    * 40/40/20 with telescoped middles) and the same (ts, id) touch
    * order and same-microsecond tie discipline — so per-conversion
    * credits sum to exactly 10⁶ and per-channel sums equal the batch
    * close on the same feed.
    *
    * State-cap trade (the documented difference from batch): a user
    * with MORE than `maxTouches` in-window touches loses the OLDEST
    * ones — the bot/power-user account whose unbounded touch history
    * is exactly what unbounded streaming state must never carry.
    * Size the cap to the window's realistic human maximum (default
    * 1000); under the cap and fed in order, streamed ≡ batch
    * (spec-pinned). Touches whose window has passed the watermark are
    * pruned every batch, and idle users evict by event-time timeout —
    * state is bounded by (active users × cap). Out-of-order guard:
    * a state touch with event time after the conversion never
    * qualifies (x.t ≤ conv.t, the batch filter), and a touch arriving
    * in a later batch cannot retro-credit an emitted conversion
    * (append-mode contract, the [[streamingAttribution]] trade). */
  def streamingMultiTouchAttribution(events: Dataset[Ev],
      convType: String, windowUs: Long, model: String,
      maxTouches: Int = 1000,
      watermarkDelay: String = "10 minutes"): Dataset[MtCredit] = {
    require(windowUs > 0, "attribution window must be positive")
    require(model == "linear" || model == "position",
      s"model must be 'linear' or 'position', got '$model'")
    require(maxTouches >= 1, "maxTouches must be positive")
    import events.sparkSession.implicits._
    // the batch operator's credit expression in exact integer form —
    // Long./ truncates toward zero ≡ SQL div on these non-negative
    // operands
    def credit(i: Int, k: Int): Long = model match {
      case "linear" =>
        i.toLong * 1000000L / k - (i - 1).toLong * 1000000L / k
      case _ =>
        if (k == 1) 1000000L
        else if (k == 2) 500000L
        else if (i == 1 || i == k) 400000L
        else (i - 1).toLong * 200000L / (k - 2) -
          (i - 2).toLong * 200000L / (k - 2)
    }
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MtState, MtCredit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[MtState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // newest-first INVARIANT maintained by insertion position:
            // batch events arrive in ascending (ts, id) order, so the
            // common path is an O(1) head prepend; only a cross-batch
            // out-of-order touch walks the list. A full re-sort per
            // insert would pay O(cap log cap) per event on a bot
            // account's 10k-touch batch.
            def insertNewestFirst(l: List[MtTouch],
                t: MtTouch): List[MtTouch] = {
              if (l.isEmpty || t.tUs > l.head.tUs ||
                  (t.tUs == l.head.tUs && t.id >= l.head.id)) t :: l
              else {
                val buf = scala.collection.mutable.ListBuffer[MtTouch]()
                var rest = l
                while (rest.nonEmpty && (rest.head.tUs > t.tUs ||
                    (rest.head.tUs == t.tUs && rest.head.id > t.id))) {
                  buf += rest.head
                  rest = rest.tail
                }
                buf.toList ::: (t :: rest)
              }
            }
            var touches = state.getOption.map(_.touches).getOrElse(Nil)
            var nTouches = touches.size
            var out = List.empty[MtCredit]
            evs.toSeq.sortBy(e => (tsUs(e.ts),
                if (e.event_type == convType) 1 else 0, e.event_id))
              .foreach { e =>
                val t = tsUs(e.ts)
                if (e.event_type == convType) {
                  val tl = touches
                    .filter(s => s.tUs <= t && s.tUs >= t - windowUs)
                    .sortBy(s => (s.tUs, s.id))
                  val k = tl.size
                  if (k == 0)
                    out ::= MtCredit(uid, e.event_id, e.ts, "(none)",
                      1000000L)
                  else tl.zipWithIndex.foreach { case (s, ix) =>
                    out ::= MtCredit(uid, e.event_id, e.ts, s.ch,
                      credit(ix + 1, k))
                  }
                } else {
                  touches = insertNewestFirst(touches,
                    MtTouch(t, e.event_id, e.event_type))
                  nTouches += 1
                  if (nTouches > maxTouches) {
                    touches = touches.take(maxTouches) // drop the oldest
                    nTouches = maxTouches
                  }
                }
              }
            // prune touches whose qualification window has passed the
            // watermark — no future conversion can credit them
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            touches = touches.filter(_.tUs + windowUs >= wmUs)
            if (touches.nonEmpty) {
              state.update(MtState(touches))
              // ceil to ms (the funnel's boundary discipline)
              state.setTimeoutTimestamp(math.max(
                Math.floorDiv(touches.head.tUs + windowUs + 999L, 1000L),
                state.getCurrentWatermarkMs() + 1))
            } else if (state.exists) state.remove()
            out.reverseIterator
          }
      }
  }
}
