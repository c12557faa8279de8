package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._
import Det._
import Tables._

/** Streaming operators (SURVEY.md §2.10) over the `events` surface.
  *
  * Strategy: each op ships as a batch twin (DuckDB-oracle-checked via
  * `SparkEntry`) plus a Structured Streaming builder operating on any
  * streaming DataFrame with the events schema (exercised by scalatest with
  * a file/rate source — streaming output can't be oracle-hashed by the
  * driver). The streaming builders use event-time watermarks so state is
  * bounded: at 100 TB/day the state store only holds open windows, and
  * late data beyond the watermark is dropped deterministically.
  */
object Streaming {
  type Q = (SparkSession, String) => DataFrame

  /** 30-minute inactivity gap, µs — shared by batch twin and stream. */
  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  /** Epoch µs from a java.sql.Timestamp — getTime alone floors to ms, which
    * would diverge from the batch twin's unix_micros gap arithmetic.
    */
  private[graft] def epochUs(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  // ---- Structured Streaming builders (input: streaming events frame) ----

  /** Per-hour tumbling counts with a 10-minute watermark; append-safe. */
  def tumblingCountsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** 1-hour windows sliding every 15 minutes. */
  def slidingAggStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))

  /** Native session windows (30-minute gap) per user. */
  def sessionWindowStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Trending event type per hour via CHAINED stateful aggregations —
    * the Spark-3.5+/4.x multiple-stateful-operators-in-append-mode
    * feature: a first tumbling count per (window, type), then a SECOND
    * windowed aggregation over `window_time` picks the max-count type
    * (ties to the lexicographically LARGER type via the struct ordering,
    * mirrored exactly by the batch twin and its oracle). Both stages
    * share the upstream watermark; state for stage 2 is one row per hour.
    */
  def trendingTypeStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("w")), "1 hour").as("w2"))
      .agg(expr("max_by(event_type, struct(n, event_type))").as("trending_type"),
        max(col("n")).as("n_top"))
      .select(col("w2.start").as("hour_start"), col("trending_type"), col("n_top"))

  /** Stream–stream inner join: purchases within 1 hour of a signup by the
    * same user (the streaming twin of the batch `join_theta_range`). The
    * watermarks + the time-range condition bound both join buffers: a signup
    * can be dropped from state once the watermark passes s_ts + 1h.
    */
  def signupPurchaseJoinStream(signups: DataFrame, purchases: DataFrame): DataFrame = {
    val s = signups.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("signup_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_uid"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    s.join(p, expr(
        "user_id = p_uid AND p_ts > s_ts AND p_ts <= s_ts + INTERVAL 1 HOUR"))
      .select("signup_id", "purchase_id")
  }

  /** Stream-static enrichment join — THE everyday production streaming
    * shape: the fact stream joins a STATIC dimension snapshot (user
    * profile, product catalog) stateless, no watermark, no state store;
    * the dim broadcasts to every task and re-resolves per micro-batch. At
    * 100 TB/day of facts the dim is a compacted table maintained by the
    * batch side (etl_upsert_snapshot / cdcCompactStream) — this join adds
    * zero streaming state regardless of stream volume. Batch twin:
    * `stream_static_enrich`.
    */
  def staticEnrichStream(facts: DataFrame, dim: DataFrame): DataFrame =
    facts
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .join(broadcast(dim), Seq("user_id"))

  /** The static dim snapshot the enrichment joins: each user's FIRST
    * signup value (the "profile attribute"), first by (ts, event_id).
    * Shared by the batch twin and the streaming spec so both sides join
    * the identical snapshot.
    */
  def profileDim(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    events(s, d)
      .where(col("event_type") === "signup" && col("user_id").isNotNull)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("value").as("profile_value"))
  }

  /** Stateful dedup on event_id within the watermark horizon. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  case class EvtRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
  case class UserSessState(sessions: Long, lastTsUs: Long)
  case class UserSessUpdate(user_id: Long, sessions: Long, events_seen: Long)
  /** session_start_us (not a per-key counter) identifies the session: unique
    * and stable even after a timeout removes the key's state — a counter
    * would restart at 1 and collide with earlier sessions of the same user.
    */
  case class ClosedSession(user_id: Long, session_start_us: Long, n_events: Long)
  case class SessOpenState(sessions: Long, lastTsUs: Long, openCount: Long, startUs: Long)

  /** Custom per-key state via mapGroupsWithState: a running per-user session
    * counter (30-min gap), the KeyValueGroupedDataset escape hatch for
    * semantics windows can't express. State per key is two longs, and idle
    * keys are EVICTED via event-time timeout (emitting a final update), so
    * the state store tracks active users only — bounded at any volume.
    */
  def statefulSessionCountStream(events: Dataset[EvtRow]): Dataset[UserSessUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserSessState, UserSessUpdate](GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvtRow], state: GroupState[UserSessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            UserSessUpdate(uid, st.sessions, 0L)
          } else {
            val sorted = it.toSeq.sortBy(e => (epochUs(e.ts), e.event_id))
            var st = state.getOption.getOrElse(UserSessState(0L, Long.MinValue))
            var seen = 0L
            sorted.foreach { e =>
              val us = epochUs(e.ts)
              val isNew = st.lastTsUs == Long.MinValue || us - st.lastTsUs > SessionGapUs
              // max(): a late-but-within-watermark event must not regress the
              // frontier, or later gap checks measure from the wrong point.
              st = UserSessState(st.sessions + (if (isNew) 1 else 0),
                math.max(st.lastTsUs, us))
              seen += 1
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastTsUs / 1000L + SessionGapUs / 1000L)
            UserSessUpdate(uid, st.sessions, seen)
          }
      }
  }

  /** flatMapGroupsWithState: zero-or-many outputs per key per batch — emits
    * one row per session CLOSED either by a gap observed inside a batch or
    * by event-time TIMEOUT (the watermark passed lastTs + gap with no new
    * events), unlike mapGroupsWithState's exactly one row per key. Timeout
    * closure is what bounds state: an idle key's session flushes and its
    * state is removed, so state size tracks *active* users only.
    */
  def closedSessionsStream(events: Dataset[EvtRow]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessOpenState, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvtRow], state: GroupState[SessOpenState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            if (st.openCount > 0) Iterator.single(ClosedSession(uid, st.startUs, st.openCount))
            else Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (epochUs(e.ts), e.event_id))
            var st = state.getOption.getOrElse(SessOpenState(0L, Long.MinValue, 0L, 0L))
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            sorted.foreach { e =>
              val us = epochUs(e.ts)
              val isNew = st.lastTsUs == Long.MinValue || us - st.lastTsUs > SessionGapUs
              if (isNew) {
                if (st.sessions > 0 && st.openCount > 0)
                  closed += ClosedSession(uid, st.startUs, st.openCount)
                st = SessOpenState(st.sessions + 1, us, 1L, us)
              } else {
                // max(): late in-watermark events must not regress the frontier
                st = SessOpenState(st.sessions, math.max(st.lastTsUs, us),
                  st.openCount + 1, st.startUs)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastTsUs / 1000L + SessionGapUs / 1000L)
            closed.iterator
          }
      }
  }

  /** Unreached-stage sentinel for [[FunnelUserState]]. */
  private val Unreached = Long.MinValue

  /** Funnel stage priority for equal-ts ordering — object-level so the
    * state function does not rebuild a map per (user, micro-batch) group.
    */
  private def stagePrio(t: String): Int = t match {
    case "view" => 0; case "click" => 1; case "purchase" => 2; case _ => 3
  }
  case class FunnelUserState(t1Us: Long, t2Us: Long, t3Us: Long)
  case class StageReached(user_id: Long, stage: Int, at_us: Long)

  /** Streaming twin of the batch `funnel_stages` operator: a per-user
    * ordered-sequence state machine (view → click-at-or-after → purchase-at-
    * or-after) that EMITS a row the moment a user reaches a new stage —
    * live conversion tracking instead of a batch recount. State is three
    * longs per user; converted users hold a tombstone until the idle
    * event-time timeout evicts them (immediate removal would re-admit a
    * returning user and emit duplicate stage rows), so the store tracks
    * recent users only. Fed in event-time order, the emitted per-stage
    * DISTINCT-user counts equal the batch twin's (StreamingSpec pins this
    * equivalence on the sf0.001 fixture, plus the exact-tie edge: equal-ts
    * events process in stage order — see the sort key below — so a click
    * tying its stage-setting view's timestamp still advances, exactly as
    * the batch min(ts >= t) counts it).
    */
  def funnelStream(events: Dataset[EvtRow]): Dataset[StageReached] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelUserState, StageReached](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvtRow], state: GroupState[FunnelUserState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // Equal-ts events process in STAGE order (view < click <
            // purchase), not event_id order: the batch twin's min(ts >= t)
            // admits equality, so a click whose ts ties the stage-setting
            // view must see t1 already set — sorting ties by arrival id
            // would consume it a step early and miss the stage.
            val sorted = it.toSeq.sortBy(e =>
              (epochUs(e.ts), stagePrio(e.event_type), e.event_id))
            var st = state.getOption.getOrElse(
              FunnelUserState(Unreached, Unreached, Unreached))
            val out = scala.collection.mutable.ArrayBuffer.empty[StageReached]
            var lastUs = Long.MinValue
            sorted.foreach { e =>
              val us = epochUs(e.ts)
              lastUs = math.max(lastUs, us)
              e.event_type match {
                case "view" if st.t1Us == Unreached =>
                  st = st.copy(t1Us = us); out += StageReached(uid, 1, us)
                case "click" if st.t1Us != Unreached && st.t2Us == Unreached &&
                    us >= st.t1Us =>
                  st = st.copy(t2Us = us); out += StageReached(uid, 2, us)
                case "purchase" if st.t2Us != Unreached && st.t3Us == Unreached &&
                    us >= st.t2Us =>
                  st = st.copy(t3Us = us); out += StageReached(uid, 3, us)
                case _ => ()
              }
            }
            // Converted users keep their state as a TOMBSTONE (t3 set → the
            // guards match nothing further) until the idle timeout evicts
            // it: removing state at conversion would let a later view
            // restart the funnel and emit duplicate stage rows within the
            // retention horizon. After eviction a returning user re-enters
            // the funnel — the documented per-activity-epoch semantic; the
            // batch twin is the exact global recount. Same horizon bounds
            // the dual case: a user evicted mid-funnel loses their earlier
            // stage timestamps (inherent to bounded streaming state).
            state.update(st)
            // idle eviction: a user silent for 7 days is dropped
            state.setTimeoutTimestamp(lastUs / 1000L + 7L * 24 * 3600 * 1000)
            out.iterator
          }
      }
  }

  case class CdcState(nOps: Long, us: Long, id: Long, op: String, value: Double)
  case class CdcUpdate(user_id: Long, n_ops: Long, op: String, value: Double,
    version_us: Long)

  /** Streaming twin of the batch `etl_cdc_apply` compaction: a per-key
    * mapGroupsWithState state machine holding ONE row per live key — the
    * latest (version, op, value) plus the applied-op count. Out-of-order
    * arrivals within and across batches resolve by the same total version
    * order as the batch twin ((version_us, event_id) — last write wins),
    * so replaying the full log through any batch split yields the batch
    * result exactly (StreamingSpec pins set-equality on the fixture).
    * Emits the compacted current state per updated key per batch (Update
    * mode) — the changelog-to-table materialization loop; downstream sinks
    * drop keys whose latest op is a delete, exactly like the batch filter.
    * State never exceeds live keys — the bounded-state contract that makes
    * changelog compaction runnable forever.
    */
  def cdcCompactStream(events: Dataset[EvtRow]): Dataset[CdcUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[CdcState, CdcUpdate](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EvtRow], state: GroupState[CdcState]) =>
          var st = state.getOption.getOrElse(
            CdcState(0L, Long.MinValue, Long.MinValue, "", 0.0))
          it.foreach { e =>
            val us = epochUs(e.ts)
            val op = e.event_type match {
              case "signup" => "I"; case "error" => "D"; case _ => "U" }
            val newer = us > st.us || (us == st.us && e.event_id > st.id)
            st =
              if (newer) CdcState(st.nOps + 1, us, e.event_id, op, e.value)
              else st.copy(nOps = st.nOps + 1)
          }
          state.update(st)
          CdcUpdate(uid, st.nOps, st.op, st.value, st.us)
      }
  }

  case class FpState(repId: Long, nCopies: Long)
  case class FpUpdate(fingerprint: Long, rep_id: Long, n_copies: Long)

  /** Streaming twin of content dedup (VERDICT r6 #4) — how a training-data
    * pipeline dedups a CONTINUOUS ingest instead of a batch corpus. Keyed
    * on the SAME portable polynomial fingerprint as `text_fingerprint`
    * ([[TextOps.FingerprintExpr]], computed by the identical Spark
    * expression, not a JVM reimplementation), with one mapGroupsWithState
    * row per distinct content: the min doc_id seen (the representative
    * batch `dedup_exact` elects) and the copy count. min() is
    * arrival-order-INVARIANT, so any batch split or arrival shuffle
    * converges to the batch answer — StreamingSpec pins set-equality
    * against `dedup_exact` under shuffled multi-batch arrival, the
    * cdcCompactStream recipe applied to dedup. Update-mode emission: the
    * latest row per touched fingerprint per batch supersedes earlier ones
    * (reduce by max n_copies downstream).
    *
    * State is one 3-long row per DISTINCT document — bounded by unique
    * content, not stream length, the same contract as the batch
    * hash-groupBy. No timeout by default (content dedup semantically
    * remembers everything it has seen); a deployment wanting a horizon
    * attaches EventTimeTimeout exactly like [[statefulSessionCountStream]].
    * The 1e9+7 fingerprint space is the ORACLE-portability choice shared
    * with text_fingerprint (collision odds ~n²/2e9 — negligible at fixture
    * scale, and the spec cross-checks representatives against the raw-text
    * groups so a fixture collision fails loudly); a production deployment
    * swaps in a 128-bit digest key with the identical state machine.
    */
  case class EwmaState(acc: Double, nEvents: Long)
  case class EwmaUpdate(user_id: Long, n_events: Long, ewma_zero_seeded: Double)

  /** Streaming EWMA (round 8) — the O(1)-state streaming twin of
    * `window_ewma`: one (acc, count) pair per user, folded with the
    * IDENTICAL 0.0-seeded acc·½ + x·½ recursion. The batch twin
    * materializes each key's series (its bounded variant the last 64
    * rows); the stream never buffers a series at all — state is two
    * numbers regardless of stream length, which is the entire point of
    * the recursion being a left fold. Within a micro-batch the iterator
    * sorts by the batch twin's (epoch µs, event_id) total order (memory
    * bounded by batch size per key, not stream length); across batches
    * the fold follows arrival, so on time-ordered arrival — the contract
    * of an event-time-ordered ingest, and what the spec feeds as chunked
    * fixture batches — the final state per key is BIT-EQUAL to batch
    * `window_ewma` (StreamingSpec pins exact double equality).
    */
  def ewmaStream(events: Dataset[EvtRow]): Dataset[EwmaUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaUpdate](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EvtRow], state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(0.0, 0L))
          it.toSeq.sortBy(e => (epochUs(e.ts), e.event_id)).foreach { e =>
            st = EwmaState(st.acc * 0.5 + e.value * 0.5, st.nEvents + 1)
          }
          state.update(st)
          EwmaUpdate(uid, st.nEvents, st.acc)
      }
  }

  case class HllState(regs: Array[Long], nSeen: Long)
  case class HllUpdate(event_type: String, n_seen: Long, regs: Seq[Long])

  /** Streaming HLL distinct-count (round 10) — the streaming twin of
    * `agg_hll_sketch`: per event_type the state is the 256 max(rho)
    * registers (≤ 2 KB/key) regardless of stream length, updated with the
    * SAME portable hash pipeline ([[Aggregations.hllBucketRho]]) the batch
    * plan and its DuckDB oracle interpolate. max-merge is commutative and
    * idempotent, so arrival order and batch boundaries are irrelevant —
    * StreamingSpec feeds the corpus id-shuffled across 4 micro-batches and
    * pins final registers EQUAL to the batch sketch, register for
    * register. This is the canonical mergeable-sketch streaming shape: the
    * same state merges across streams, epochs, or partitions at 100 TB.
    *
    * PRECONDITION (ADVICE r10): the caller must pre-filter missing /
    * sentinel user ids — the batch twin's plan carries `user_id IS NOT
    * NULL`, but EvtRow.user_id is a primitive Long, so a source that
    * encodes missing users as 0 would fold uid 0's bucket/rho into the
    * registers here and silently diverge from agg_hll_sketch.
    * StreamingSpec's feed applies exactly the batch filter.
    */
  def hllStream(events: Dataset[EvtRow]): Dataset[HllUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[HllState, HllUpdate](GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[EvtRow], state: GroupState[HllState]) =>
          val st = state.getOption.getOrElse(
            HllState(Array.fill(Aggregations.HllRegisters)(0L), 0L))
          var n = st.nSeen
          it.foreach { e =>
            val (b, rho) = Aggregations.hllBucketRho(e.user_id)
            if (rho > st.regs(b)) st.regs(b) = rho
            n += 1
          }
          state.update(HllState(st.regs, n))
          HllUpdate(et, n, st.regs.toSeq)
      }
  }

  case class CmState(cells: Array[Long], nSeen: Long)
  case class CmUpdate(r: Int, n_seen: Long, cells: Seq[Long])

  /** Streaming count-min sketch (round 11, VERDICT r10 #5) — the streaming
    * twin of `agg_heavy_hitters`: per sketch ROW r the state is the
    * CmWidth bucket counters (≤ 2 KB/row — CmRows × CmWidth longs total,
    * regardless of stream length), incremented with the SAME portable
    * [[Aggregations.cmPolyFold]]/[[Aggregations.cmBucket]] hash family the
    * batch plan and its DuckDB oracle interpolate. Cells merge by
    * ADDITION exactly as [[hllStream]]'s registers merge by max —
    * commutative, so arrival order and micro-batch boundaries are
    * irrelevant; StreamingSpec feeds the corpus shuffled across 4
    * micro-batches and pins the min-over-rows estimates read from the
    * streamed cells EQUAL to the batch operator's est_cnt column. The
    * bucketing runs as Catalyst expressions BEFORE the stateful step, so
    * per-event work is codegen'd and the state update is a blind
    * counter increment — the shape a 100 TB ingest needs, where the
    * sketch row state also merges across parallel streams by the same
    * addition.
    */
  def cmStream(docs: DataFrame): Dataset[CmUpdate] = {
    import docs.sparkSession.implicits._
    docs
      .select(explode(split(col("text"), " ")).as("w"))
      .select(Aggregations.cmBase(col("w")).as("base"))
      .select(posexplode(array((0 until Aggregations.CmRows).map(r =>
        Aggregations.cmBucket(r, col("base"))): _*)).as(Seq("r", "bucket")))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[CmState, CmUpdate](GroupStateTimeout.NoTimeout) {
        (r: Int, it: Iterator[(Int, Long)], state: GroupState[CmState]) =>
          val st = state.getOption.getOrElse(
            CmState(Array.fill(Aggregations.CmWidth)(0L), 0L))
          var n = st.nSeen
          it.foreach { case (_, b) => st.cells(b.toInt) += 1L; n += 1 }
          state.update(CmState(st.cells, n))
          CmUpdate(r, n, st.cells.toSeq)
      }
  }

  case class QsState(bins: Array[Long], nSeen: Long)
  case class QsUpdate(event_type: String, n_seen: Long, bins: Seq[Long])

  /** Streaming quantile sketch (round 11) — the third mergeable-sketch
    * twin, completing the family: HLL registers merge by MAX
    * ([[hllStream]]), count-min cells and these histogram bins merge by
    * ADDITION ([[cmStream]] / here). Per event_type the state is the
    * QuantileSketchBins counters of `agg_quantile_sketch`'s bin rule
    * (clamp(floor(value / width), 0, bins−1) — the identical IEEE scaling
    * on both engines); quantile reads use the same integer
    * cross-multiplication, so StreamingSpec pins the p50/p90/p99 read
    * from the streamed bins EQUAL to the batch operator's output under
    * shuffled multi-batch arrival. PRECONDITION mirrors the batch plan's
    * `value IS NOT NULL` filter (EvtRow.value is a primitive Double).
    */
  def quantileSketchStream(events: Dataset[EvtRow]): Dataset[QsUpdate] = {
    import events.sparkSession.implicits._
    val m = Aggregations.QuantileSketchBins
    val w = Aggregations.QuantileSketchWidth
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[QsState, QsUpdate](GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[EvtRow], state: GroupState[QsState]) =>
          val st = state.getOption.getOrElse(QsState(Array.fill(m)(0L), 0L))
          var n = st.nSeen
          it.foreach { e =>
            val b = math.max(0L,
              math.min(math.floor(e.value / w).toLong, m - 1L)).toInt
            st.bins(b) += 1L
            n += 1
          }
          state.update(QsState(st.bins, n))
          QsUpdate(et, n, st.bins.toSeq)
      }
  }

  case class ZsState(ring: Seq[Long])
  case class ZsFlag(event_id: Long, event_type: String, value: Double, z: Double)

  /** Streaming trailing-window z-score (round 11) — the streaming twin of
    * `window_anomaly_zscore`: per event_type the state is a ring of the
    * last [[Windows.ZscoreWindow]] values as EXACT scale-4 fixed-point
    * longs (the decimal(18,4) unscaled value — ~160 bytes/key regardless
    * of stream length, where the batch twin's window frame re-reads 20
    * rows per row). Each arriving event with a full ring computes the
    * IDENTICAL IEEE op sequence as the batch plan: integer-exact Σv / Σv²
    * accumulated in BigInt (scaled 10⁴/10⁸ — the same rationals as the
    * batch DECIMAL(38,4)/(38,8) window sums; a Long Σx² would silently
    * wrap for |v| beyond ~3·10⁵ where the batch decimals stay exact —
    * ADVICE-class bug caught in round-11 review), one correctly-rounded
    * double render each (BigDecimal.doubleValue — the same render Spark's
    * Decimal.toDouble performs), then max(n·s2 − s1², 0)/n²,
    * z = (v − s1/n)/sqrt(var). The scale-4 fixed-point conversion uses
    * longValueExact, so a value outside the decimal(18,4) domain throws
    * loudly — matching the batch plan's ANSI decimal-overflow error
    * rather than silently diverging. Flags emit in Append mode (an
    * anomaly is a fact, never superseded).
    *
    * Unlike the mergeable sketches this state is ORDER-dependent (a ring
    * is a suffix, not a set): within a micro-batch the iterator sorts by
    * the batch twin's (epoch µs, event_id) total order; across batches
    * the ring follows arrival — on time-ordered arrival the flag stream
    * is BIT-EQUAL to the batch operator (StreamingSpec pins event ids and
    * exact z doubles over contiguous chunked arrival), while an event
    * arriving in a LATER micro-batch than a chronologically-later peer is
    * folded at its arrival position (no watermark reorder buffer by
    * design — a reorder buffer would trade the ~160-byte key state for
    * watermark-sized buffering; StreamingSpec pins the divergence under
    * cross-batch late arrival against an arrival-order JVM reference, so
    * the precondition is a tested contract, not a comment). PRECONDITION
    * mirrors the batch plan's `value IS NOT NULL` filter (EvtRow.value is
    * a primitive Double).
    *
    * MEMORY BOUND: the per-KEY state is the fixed ~160-byte ring, but the
    * intra-batch sort (`it.toSeq.sortBy`) materializes each key's slice
    * of the CURRENT micro-batch — O(batch rows per key), unbounded in
    * batch size (unlike cmStream/hllStream/quantileSketchStream, whose
    * folds are chunk-safe iterators). Production knob: cap the trigger
    * (maxOffsetsPerTrigger / maxFilesPerTrigger) so a micro-batch's
    * hottest key fits an executor — the same sizing rule any
    * sort-within-group stage obeys; the sort itself cannot be streamed
    * away while the twin contract requires the batch total order within
    * a trigger.
    */
  def zscoreStream(events: Dataset[EvtRow]): Dataset[ZsFlag] = {
    import events.sparkSession.implicits._
    val Zw = Windows.ZscoreWindow
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[ZsState, ZsFlag](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[EvtRow], state: GroupState[ZsState]) =>
          var ring = state.getOption.map(_.ring.toVector)
            .getOrElse(Vector.empty[Long])
          val out = Vector.newBuilder[ZsFlag]
          it.toSeq.sortBy(e => (epochUs(e.ts), e.event_id)).foreach { e =>
            val scaled = BigDecimal(e.value)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .underlying.unscaledValue.longValueExact
            ring = (ring :+ scaled).takeRight(Zw)
            if (ring.length == Zw) {
              val s1 = ring.foldLeft(BigInt(0))(_ + _)
              val s2 = ring.foldLeft(BigInt(0))((a, x) => a + BigInt(x) * x)
              val s1D = new java.math.BigDecimal(s1.bigInteger, 4).doubleValue
              val s2D = new java.math.BigDecimal(s2.bigInteger, 8).doubleValue
              val nD = Zw.toDouble
              val varPop = math.max(nD * s2D - s1D * s1D, 0.0) / (nD * nD)
              val z = (e.value - s1D / nD) / math.sqrt(varPop)
              if (varPop > 0.0 && math.abs(z) > Windows.ZscoreFlagSigma)
                out += ZsFlag(e.event_id, et, e.value, z)
            }
          }
          state.update(ZsState(ring))
          out.result().iterator
      }
  }

  def fingerprintDedupStream(docs: DataFrame): Dataset[FpUpdate] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id").cast(LongType).as("doc_id"),
        TextOps.polyFingerprint(col("text")).as("fingerprint"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .mapGroupsWithState[FpState, FpUpdate](GroupStateTimeout.NoTimeout) {
        (fp: Long, it: Iterator[(Long, Long)], state: GroupState[FpState]) =>
          var st = state.getOption.getOrElse(FpState(Long.MaxValue, 0L))
          it.foreach { case (id, _) =>
            st = FpState(math.min(st.repId, id), st.nCopies + 1)
          }
          state.update(st)
          FpUpdate(fp, st.repId, st.nCopies)
      }
  }

  /** Score-at-ingest surprisal (round 16) — the other half of
    * [[Bpe.encodeStream]]'s tokenize-at-ingest story, and the deployment
    * mode [[TextOps.lmScores]]' model-coupling note prescribes: a
    * production pipeline freezes a REFERENCE unigram model (here the
    * fixture corpus's counts — the exact frames lmScores memoizes) and
    * scores every ARRIVING document against it, instead of re-deriving a
    * corpus-relative model per batch. The count table joins the stream as
    * a broadcast static side (stream-static equi-join — append-safe); the
    * corpus total is frozen INTO the plan as a literal at stream
    * definition (loading the model IS freezing it). Unknown words take
    * the open-vocabulary cost log2µ(N) − log2µ(1) = log2µ(N), the
    * Unigram UNK convention — unseen text degrades to maximal surprisal
    * instead of erroring, which is exactly the filter's job on a crawl
    * stream. Same exact fixed-point kernel, so StreamingSpec pins the
    * streamed scores EQUAL to text_lm_surprisal's on the reference corpus
    * itself (where coalesce never fires) and pins the UNK cost on a
    * genuinely novel document. The per-doc aggregate is the one stateful
    * stage (update mode; production bounds it with a watermark on the
    * ingest timestamp — each doc lives in one micro-batch).
    */
  def surprisalStream(s: SparkSession, d: String, docs: DataFrame): DataFrame = {
    val tf = TextOps.tfIndex(s, d)
    val cnt = tf.groupBy("word").agg(Det.lsum(col("tf")).as("c"))
    val nTot = cnt.agg(Det.lsum(col("c"))).collect()(0).getLong(0)
    val surp = s"${TextOps.log2MicroSql(nTot.toString)} - ${TextOps.log2MicroSql("c1")}"
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(cnt), Seq("word"), "left")
      .withColumn("c1", coalesce(col("c"), lit(1L)))
      .withColumn("surp_micro", expr(surp))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("surp_micro")).as("bits_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("(bits_sum div n_tokens) div 1000").as("surprisal_millibits"))
      .withColumn("flagged",
        col("surprisal_millibits") >= lit(TextOps.LmSurprisalFlagMilli))
  }

  case class KmvState(hs: Array[Long])
  case class KmvUpdate(t: String, k_rows: Long, hk: Long, hs: Seq[Long])

  /** Streaming KMV sketch maintenance (round 16) — the CONTINUOUS WRITER
    * for [[KmvStore]]'s per-day artifact, completing its deployment story
    * the way [[fingerprintDedupStream]] feeds the exact-dedup index: state
    * per day is the bottom-k set of distinct user hashes (≤ KmvK longs —
    * KBs regardless of stream length), updated with the SAME portable
    * mhash the batch sketch and its DuckDB oracle interpolate. Bottom-k of
    * a distinct set is commutative and idempotent (insert-if-smaller,
    * duplicates no-op), so arrival order and micro-batch boundaries are
    * irrelevant — StreamingSpec feeds the corpus shuffled across 4
    * micro-batches and pins the final per-day sets EQUAL to the batch
    * [[Aggregations.kmvSketchFrame]] rows. At 100 TB parallel ingest
    * streams merge sketches by set-union-then-trim — the same
    * associativity the two-level batch pick exploits.
    */
  def kmvSketchStream(events: Dataset[EvtRow]): Dataset[KmvUpdate] = {
    import events.sparkSession.implicits._
    events
      // day key via toLocalDateTime — the exact inverse of the
      // Timestamp.valueOf(LocalDateTime) construction every EvtRow source
      // in this repo uses (both sides go through the SAME JVM default
      // zone, so the NTZ wall-clock round-trips regardless of what that
      // zone is); keying through to_date on the re-encoded TimestampType
      // column would instead convert epoch→session-tz and DIVERGE from
      // the batch frame whenever JVM default ≠ session tz
      .groupByKey(e => e.ts.toLocalDateTime.toLocalDate.toString)
      .mapGroupsWithState[KmvState, KmvUpdate](GroupStateTimeout.NoTimeout) {
        (t: String, it: Iterator[EvtRow], state: GroupState[KmvState]) =>
          val set = scala.collection.mutable.TreeSet.empty[Long]
          state.getOption.foreach(st => set ++= st.hs)
          it.foreach { e =>
            // JVM mirror of Tables.mhash with FULL pmod semantics
            // (code-review r16): a literal % keeps the sign, so a
            // negative user_id would hash negative — and then win every
            // bottom-k comparison — where the batch pmod is always
            // non-negative (the Tables.mhash doc's own warning)
            val a = ((e.user_id % 1000000007L) + 1000000007L) % 1000000007L
            val h = a * 2654435761L % Aggregations.KmvM
            if (set.size < Aggregations.KmvK) set += h
            else if (h < set.max && !set.contains(h)) { set -= set.max; set += h }
          }
          state.update(KmvState(set.toArray))
          KmvUpdate(t, set.size.toLong, set.max, set.toSeq)
      }
  }

  // ---- Batch twins (driver-verified against DuckDB) ----

  val queries: Map[String, Q] = Map(
    "stream_tumbling_counts" -> ((s, d) =>
      events(s, d)
        .groupBy(date_trunc("hour", col("ts")).cast(TimestampNTZType).as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum4(col("value")).as("sum_value"))
        .orderBy("hour_start", "event_type")),

    "stream_sliding_avg" -> ((s, d) =>
      // Batch semantics of window(ts, 1h, 15m): each event lands in the 4
      // sliding windows covering it; epoch-aligned starts match DuckDB's
      // time_bucket (both anchored to UTC midnight).
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum4(col("value")).as("sum_value"))
        .select(col("w.start").cast(TimestampNTZType).as("ws"), col("n"), col("sum_value"))
        .orderBy("ws")),

    "stream_session_windows" -> ((s, d) => {
      // Classic scalable sessionization: lag-gap flag + running sum = session
      // id. One shuffle on user_id; state per user is a single row.
      val byTs = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val run = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("us", unix_micros(col("ts").cast(TimestampType)))
        .withColumn("prev_us", lag(col("us"), 1).over(byTs))
        .withColumn("is_new",
          when(col("prev_us").isNotNull &&
               col("us") - col("prev_us") <= SessionGapUs, 0L).otherwise(1L))
        .withColumn("session_id", sum(col("is_new")).over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), dsum4(col("value")).as("sum_value"))
        .orderBy("user_id", "session_id")
    }),

    "stream_session_native" -> ((s, d) =>
      // Native session_window in BATCH mode, oracle-checked against the
      // independent lag/cumsum SQL formulation — proves the two session
      // semantics (merge while gap <= 30 min) agree.
      events(s, d)
        .groupBy(session_window(col("ts").cast(TimestampType), "30 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("w.start").cast(TimestampNTZType).as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")),

    "stream_trending_type" -> ((s, d) =>
      // Batch twin of [[trendingTypeStream]]: hourly counts per type, then
      // max_by(struct(n, event_type)) — the same tie rule (larger type
      // wins on equal counts) as the streaming chained aggregation and
      // the oracle's row_number ORDER BY n DESC, event_type DESC.
      events(s, d)
        .groupBy(date_trunc("hour", col("ts")).cast(TimestampNTZType)
          .as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy("hour_start")
        .agg(expr("max_by(event_type, struct(n, event_type))").as("trending_type"),
          max(col("n")).as("n_top"))
        .orderBy("hour_start")),

    "stream_interval_join" -> ((s, d) => {
      // Batch twin of [[signupPurchaseJoinStream]]: purchases within 1 hour
      // AFTER a signup by the same user. Equi-join on user_id with the time
      // range as a residual predicate — shuffles once on the key, no range
      // explosion; the streaming form bounds both join buffers via
      // watermarks + the same interval. Comparisons run on epoch µs
      // (unix_micros) rather than raw timestamps: Spark's loader truncated
      // the fixture's ns to µs while DuckDB reads full ns, so the oracle
      // mirrors the truncation explicitly (epoch_us of the µs-cast ts).
      val ev = events(s, d)
        .withColumn("us", unix_micros(col("ts").cast(TimestampType)))
      val sg = ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("us").as("s_us"), col("event_id").as("signup_id"))
      val pu = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("us").as("p_us"),
          col("event_id").as("purchase_id"))
      sg.join(pu, col("user_id") === col("p_uid") &&
          col("p_us") > col("s_us") && col("p_us") <= col("s_us") + lit(3600000000L))
        .select(col("user_id"), col("signup_id"), col("purchase_id"),
          (col("p_us") - col("s_us")).as("lag_us"))
        .orderBy("signup_id", "purchase_id")
    }),

    "stream_stateful_dedup" -> ((s, d) =>
      // Batch twin of keep-first dedup: deterministic min-event_id per key
      // (dropDuplicates keeps an arbitrary row — not hash-stable).
      events(s, d)
        .groupBy("user_id", "event_type")
        .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n_dups"))
        .orderBy("user_id", "event_type")),

    // Batch twin of [[staticEnrichStream]]: purchases enriched with the
    // static profile dim (first-signup value per user). Inner semantics —
    // a fact with no profile row carries no attribute and drops, exactly
    // what the stateless stream-static join does.
    "stream_static_enrich" -> ((s, d) =>
      events(s, d).where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"))
        .join(broadcast(profileDim(s, d)), Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("profile_value"))
        .orderBy("event_id"))
  )

  val oracles: Map[String, String] = Map(
    "stream_tumbling_counts" ->
      ("SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS n, " +
       s"${oDsum4("value")} AS sum_value " +
       "FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"),

    // row_number ORDER BY n DESC, event_type DESC = max_by struct(n, type)
    "stream_trending_type" ->
      ("WITH c AS (SELECT date_trunc('hour', ts) AS hour_start, event_type, " +
       "count(*) AS n FROM events GROUP BY 1, 2) " +
       "SELECT hour_start, event_type AS trending_type, n AS n_top FROM c " +
       "QUALIFY row_number() OVER (PARTITION BY hour_start " +
       "ORDER BY n DESC, event_type DESC) = 1 ORDER BY hour_start"),

    "stream_sliding_avg" ->
      ("SELECT ws, count(*) AS n, " +
       s"${oDsum4("value")} AS sum_value FROM " +
       "(SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) " +
       " - CAST(i AS INT) * INTERVAL '15 minutes' AS ws, value " +
       "FROM events, (SELECT unnest(generate_series(0, 3)) AS i)) " +
       "GROUP BY ws ORDER BY ws"),

    "stream_session_windows" ->
      ("SELECT user_id, session_id, count(*) AS n_events, " +
       s"${oDsum4("value")} AS sum_value FROM " +
       "(SELECT user_id, value, " +
       "CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM " +
       "(SELECT user_id, ts, event_id, value, " +
       "CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) " +
       "OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 1800000000 THEN 0 ELSE 1 END AS is_new " +
       "FROM events)) GROUP BY user_id, session_id ORDER BY user_id, session_id"),

    "stream_session_native" ->
      ("SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS session_start, count(*) AS n_events FROM " +
       "(SELECT user_id, ts, " +
       "CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM " +
       "(SELECT user_id, ts, event_id, " +
       "CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) " +
       "OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 1800000000 THEN 0 ELSE 1 END AS is_new " +
       "FROM events)) GROUP BY user_id, session_id ORDER BY user_id, session_start"),

    "stream_stateful_dedup" ->
      ("SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS n_dups " +
       "FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type"),

    "stream_interval_join" ->
      ("SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id, " +
       "epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(s.ts AS TIMESTAMP)) AS lag_us " +
       "FROM events s JOIN events p ON s.user_id = p.user_id " +
       "WHERE s.event_type = 'signup' AND p.event_type = 'purchase' " +
       "AND epoch_us(CAST(p.ts AS TIMESTAMP)) > epoch_us(CAST(s.ts AS TIMESTAMP)) " +
       "AND epoch_us(CAST(p.ts AS TIMESTAMP)) <= epoch_us(CAST(s.ts AS TIMESTAMP)) + 3600000000 " +
       "ORDER BY signup_id, purchase_id"),

    "stream_static_enrich" ->
      ("WITH dim AS (SELECT user_id, value AS profile_value FROM " +
       "(SELECT user_id, value, row_number() OVER " +
       "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn " +
       "FROM events WHERE event_type = 'signup' AND user_id IS NOT NULL) " +
       "WHERE rn = 1) " +
       "SELECT e.event_id, e.user_id, d.profile_value " +
       "FROM events e JOIN dim d ON e.user_id = d.user_id " +
       "WHERE e.event_type = 'purchase' ORDER BY e.event_id")
  )
}
