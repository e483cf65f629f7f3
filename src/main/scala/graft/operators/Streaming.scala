package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.streaming.StreamTransforms
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1.H — streaming operators, declared through their batch
  * equivalents (◐ oracles): Structured Streaming's unbounded-table model
  * guarantees the run-to-completion streaming result equals the batch
  * result on the same rows, which StreamingSpec proves by feeding the
  * same transforms through MemoryStream. The transforms themselves live
  * in `graft.streaming.StreamTransforms` and are shared verbatim between
  * both paths.
  */
object Streaming extends QueryModule {

  val streamTumblingAgg = Q(
    "stream_tumbling_agg",
    (spark, dir) => {
      import spark.implicits._
      StreamTransforms
        .tumblingAgg(Tables.events(spark, dir))
        .orderBy($"w_start", $"event_type")
    },
    Some("""
      SELECT date_trunc('hour', ts) AS w_start,
        date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
        event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2, 3
      ORDER BY w_start, event_type
    """.stripMargin.trim))

  val streamSlidingAgg = Q(
    "stream_sliding_agg",
    (spark, dir) => {
      import spark.implicits._
      StreamTransforms
        .slidingAgg(Tables.events(spark, dir))
        .orderBy($"w_start")
    },
    // every event belongs to the 4 sliding windows whose starts are the
    // last 4 ticks of the 15-minute grid at-or-before ts
    Some("""
      SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, COUNT(*) AS n_events
      FROM (
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                 - UNNEST([INTERVAL '0 minutes', INTERVAL '15 minutes',
                           INTERVAL '30 minutes', INTERVAL '45 minutes']) AS w_start
        FROM events)
      GROUP BY w_start
      ORDER BY w_start
    """.stripMargin.trim))

  val streamSessionWindow = Q(
    "stream_session_window",
    (spark, dir) => {
      import spark.implicits._
      StreamTransforms
        .sessionAgg(Tables.events(spark, dir))
        .orderBy($"user_id", $"s_start")
    },
    // gaps-and-islands: a new session starts when the gap from the
    // previous event reaches the 30-minute timeout (session windows are
    // half-open, so an exactly-30-minute gap closes the session)
    Some("""
      WITH flagged AS (
        SELECT user_id, ts,
          CASE WHEN ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
                 OR LAG(ts) OVER w IS NULL
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged)
      SELECT MIN(ts) AS s_start,
        MAX(ts) + INTERVAL 30 MINUTE AS s_end,
        user_id,
        COUNT(*) AS n_events
      FROM sessions
      GROUP BY user_id, session_id
      ORDER BY user_id, s_start
    """.stripMargin.trim))

  val streamDedupWatermark = Q(
    "stream_dedup_watermark",
    (spark, dir) => {
      import spark.implicits._
      StreamTransforms
        .dedupByEventId(Tables.events(spark, dir))
        .orderBy($"event_id")
    },
    // event_id is unique, so run-to-completion dedup returns every event
    Some("""
      SELECT event_id, user_id, event_type
      FROM events ORDER BY event_id
    """.stripMargin.trim))

  /** Batch-window formulation of the per-user "events since last signup"
    * counter; the flatMapGroupsWithState streaming implementation
    * (graft.streaming.StatefulOps) must produce identical rows, asserted
    * in StreamingSpec.
    */
  val streamStatefulCustom = Q(
    "stream_stateful_custom",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val grp = sum(when($"event_type" === "signup", 1).otherwise(0)).over(w)
      val wg = Window.partitionBy($"user_id", $"grp").orderBy($"ts", $"event_id")
      Tables
        .events(spark, dir)
        .withColumn("grp", grp)
        .withColumn("rn", row_number().over(wg))
        .select(
          $"event_id", $"user_id",
          when($"grp" === 0, $"rn").otherwise($"rn" - 1).as("events_since_signup"))
        .orderBy($"event_id")
    },
    Some("""
      WITH g AS (
        SELECT event_id, user_id, ts, event_type,
          SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS grp
        FROM events),
      r AS (
        SELECT event_id, user_id, grp,
          ROW_NUMBER() OVER (PARTITION BY user_id, grp ORDER BY ts, event_id) AS rn
        FROM g)
      SELECT event_id, user_id,
        CASE WHEN grp = 0 THEN rn ELSE rn - 1 END AS events_since_signup
      FROM r ORDER BY event_id
    """.stripMargin.trim))

  val streamStaticJoin = Q(
    "stream_static_join",
    (spark, dir) => {
      import spark.implicits._
      StreamTransforms
        .staticEnrich(Tables.events(spark, dir), Tables.customer(spark, dir))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id, event_type, c_name, c_mktsegment
      FROM events JOIN customer ON user_id = c_custkey
      ORDER BY event_id
    """.stripMargin.trim))

  /** Stream-stream interval join declared through its batch equivalent:
    * run-to-completion with no late data makes the watermarked interval
    * join produce exactly the batch interval join's rows (inner join,
    * inclusive 30-minute look-back). StreamingSpec drives the same
    * transform through two MemoryStreams and asserts row equality.
    */
  val streamStreamJoin = Q(
    "stream_stream_interval_join",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      StreamTransforms
        .clickPurchaseJoin(
          ev.filter($"event_type" === "click"),
          ev.filter($"event_type" === "purchase"))
        .orderBy($"purchase_id", $"click_id")
    },
    Some("""
      SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        p.ts AS purchase_ts, c.ts AS click_ts
      FROM events p JOIN events c
        ON p.user_id = c.user_id
        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
      WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      ORDER BY purchase_id, click_id
    """.stripMargin.trim))

  /** Last-write-wins keyed upsert state: each user's latest event —
    * streamed, a plain keyed agg in update mode whose per-microbatch
    * output is exactly an upsert feed (StreamingSpec proves the
    * accumulated state equals this batch result and that update mode
    * re-emits only touched users).
    */
  val streamUpsertLatest = Q(
    "stream_upsert_latest",
    (spark, dir) => {
      import spark.implicits._
      StreamTransforms
        .latestPerUser(Tables.events(spark, dir))
        .orderBy($"user_id")
    },
    Some("""
      WITH r AS (
        SELECT user_id, ts, event_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      )
      SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        event_type AS last_type, value AS last_value
      FROM r WHERE rn = 1 ORDER BY user_id
    """.stripMargin.trim))

  /** Stream-stream LEFT OUTER interval join — attribution that keeps
    * the unconverted clicks (SURVEY §2.1.I-quater). Declared through
    * the batch equivalent of the SAME StreamTransforms code; the
    * streaming run (watermark-gated NULL completion, bounded state) is
    * proven ≡ batch in StreamingSpec.
    */
  val streamOuterIntervalJoin = Q(
    "stream_outer_interval_join",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      StreamTransforms
        .clickPurchaseLeftOuter(
          ev.filter($"event_type" === "click"),
          ev.filter($"event_type" === "purchase"))
        .orderBy($"click_id", $"purchase_id")
    },
    Some("""
      SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        p.event_id AS purchase_id, p.ts AS purchase_ts,
        p.event_id IS NOT NULL AS converted
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      ORDER BY click_id, purchase_id
    """.stripMargin.trim))

  /** Windowed DISTINCT-USER counting (DAU/HAU) — the chained-stateful
    * shape (event-time dedup → windowed agg) real metrics pipelines
    * run; StreamingSpec drives the same transform through MemoryStream
    * in append mode with a watermark-advancing sentinel and proves the
    * emitted windows equal this batch declaration.
    *
    * Scale notes (100 TB): dedup state is (window, user)-keyed and
    * watermark-evicted — bounded by active users per open window, not
    * by history; the downstream count state is windows × 1 row. In
    * batch the same plan is one partial-aggregated distinct per hour.
    */
  val streamDistinctUsers = Q(
    "stream_distinct_users_windowed",
    (spark, dir) => {
      import spark.implicits._
      StreamTransforms
        .distinctUsersPerWindow(Tables.events(spark, dir))
        .orderBy($"w_start")
    },
    Some("""
      SELECT date_trunc('hour', ts) AS w_start,
        date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
        COUNT(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1, 2
      ORDER BY w_start
    """.stripMargin.trim))

  /** Per-user session summaries via transformWithState + EVENT-TIME
    * TIMERS (SURVEY §2.1.H) — the Spark-4 arbitrary-state-v2 row the
    * `stream_stateful_custom` family was missing: sessions closed by a
    * later event emit inline, sessions closed by INACTIVITY emit from
    * `handleExpiredTimer` when the watermark passes last-event+30 min
    * (graft.streaming.StatefulOps.SessionTimerProcessor). This batch
    * declaration is the run-to-completion equivalent — gaps-and-islands
    * with a 30-minute gap, per-user session ordinal, bounds, event /
    * purchase counts, floor-second duration; StreamingSpec drives the
    * processor through MemoryStream (RocksDB state store) with a
    * watermark-advancing sentinel and proves row equality.
    *
    * Scale notes (100 TB/day): state is one open-session record + one
    * ordinal per user, partitioned by user_id; each user keeps exactly
    * one live timer, so the timer store is O(users) too. The batch
    * formulation shuffles once on user_id; both windows ride that one
    * Exchange.
    */
  val streamSessionTimer = Q(
    "stream_session_timer",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val flagged = Tables.events(spark, dir)
        .withColumn("prev_ts", lag($"ts", 1).over(w))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            $"ts" >= $"prev_ts" + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      val wc = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      flagged
        .withColumn("session_seq", sum($"new_session").over(wc))
        .groupBy($"user_id", $"session_seq")
        .agg(
          min($"ts").as("s_start"),
          max($"ts").as("last_ts"),
          count(lit(1)).as("n_events"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_purchases"))
        .withColumn("duration_s",
          unix_seconds($"last_ts".cast("timestamp")) -
            unix_seconds($"s_start".cast("timestamp")))
        .select($"user_id", $"session_seq", $"s_start", $"last_ts",
          $"n_events", $"n_purchases", $"duration_s")
        .orderBy($"user_id", $"session_seq")
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
          CASE WHEN LAG(ts) OVER w IS NULL
                 OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sessions AS (
        SELECT user_id, ts, event_type,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
      )
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        MIN(ts) AS s_start, MAX(ts) AS last_ts,
        COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_purchases,
        CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
          - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS duration_s
      FROM sessions
      GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq
    """.stripMargin.trim))

  /** Per-event trailing-3 behavior trail via transformWithState
    * LIST state (SURVEY §2 I-oct) — the "last N actions" feature a
    * ranking/abuse model consumes per event, here as the third
    * arbitrary-state-v2 shape next to the ValueState counter and the
    * event-time-timer sessionizer: the processor keeps a ≤2-element
    * ListState buffer per user and every event emits the 3-window trail
    * ending at itself (graft.streaming.StatefulOps.Last3TrailProcessor;
    * StreamingSpec proves stream ≡ this batch declaration). The batch
    * equivalent is a plain 3-row frame window.
    *
    * Scale notes (100 TB/day): state is ≤2 small strings per user —
    * O(users), partitioned by user_id; the batch form is one user-keyed
    * window shuffle.
    */
  val streamTwsLast3Trail = Q(
    "stream_tws_last3_trail",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-2, Window.currentRow)
      Tables.events(spark, dir)
        .select($"event_id", $"user_id",
          array_join(collect_list($"event_type").over(w), ">").as("trail"))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id,
        string_agg(event_type, '>') OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS trail
      FROM events
      ORDER BY event_id
    """.stripMargin.trim))

  /** Idempotent foreachBatch FILE SINK (SURVEY §2 I-non) — the
    * streaming family's missing durability row: every other stream row
    * proves transform semantics into a memory sink; this one proves the
    * SINK discipline a production pipeline actually needs — a parquet
    * sink driven from `foreachBatch` that stays exactly-once when a
    * batch is REPLAYED (sink retry after a failure between write and
    * epoch commit, the at-least-once delivery contract foreachBatch
    * gives). The shared [[StreamTransforms.idempotentWindowWrite]]
    * writes with dynamic partition overwrite keyed at the DELIVERY
    * granularity: this declared run delivers whole days
    * (run-to-completion write + a full-day replay), so the key is the
    * day — exact idempotence at 31 directories; the update-mode drive
    * in StreamingSpec delivers touched (window, type) cells, so there
    * the key is (w_hour, event_type). Any delivery rewrites exactly
    * the partitions it carries, last-write-wins. The declared run
    * REPLAYS one day's slice and returns the read-back daily rollup —
    * any duplication from the replay would double that day's
    * row/event counts against the oracle. StreamingSpec drives the
    * same writer from a real foreachBatch over MemoryStream in update
    * mode with a forced double delivery.
    *
    * Scale notes (100 TB): dynamic overwrite touches only the
    * partitions present in the incoming batch (a microbatch spans the
    * few partitions it advanced), never the table; the read-back
    * rollup is a bounded agg. State lives in the FILES, not the
    * driver — retries are safe across job restarts.
    */
  val streamForeachbatchSink = Q(
    "stream_foreachbatch_sink",
    (spark, dir) => {
      import spark.implicits._
      val pid = ProcessHandle.current().pid()
      val runId = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val path = s"/tmp/graft_scratch/p$pid/fsink_$runId"
      val agg = StreamTransforms.tumblingAgg(Tables.events(spark, dir))
      // deliveries here are whole days (run-to-completion write, then a
      // full-day replay), so day partitioning is the exact idempotence
      // key — and 31 directories instead of day×hour×type thousands
      StreamTransforms.idempotentWindowWrite(agg, path, Seq("w_date"))
      // the replayed delivery: one day re-arrives in full — the
      // idempotent sink must absorb it without duplicating
      StreamTransforms.idempotentWindowWrite(
        agg.where($"w_start".cast("date") === lit("2024-01-15").cast("date")), path,
        Seq("w_date"))
      spark.read.parquet(path)
        .groupBy($"w_start".cast("date").as("w_date"))
        .agg(
          count(lit(1)).as("n_window_rows"),
          sum($"n_events").as("n_events"),
          sum($"sum_value").cast(org.apache.spark.sql.types.DecimalType(18, 6))
            .as("sum_value"))
        .orderBy($"w_date")
    },
    Some("""
      WITH hourly AS (
        SELECT date_trunc('hour', ts) AS w_start, event_type,
          COUNT(*) AS n_events,
          SUM(CAST(value AS DECIMAL(18,6))) AS sum_value
        FROM events GROUP BY 1, 2
      )
      SELECT CAST(w_start AS DATE) AS w_date,
        COUNT(*) AS n_window_rows,
        CAST(SUM(n_events) AS BIGINT) AS n_events,
        CAST(CAST(SUM(sum_value) AS DECIMAL(18,6)) AS DOUBLE) AS sum_value
      FROM hourly GROUP BY 1 ORDER BY w_date
    """.stripMargin.trim))

  /** STREAMING INCREMENTAL DEDUP (VERDICT r8 #4) — the composition the
    * registry rows exist for, as one declared pipeline: the NEW-DOC
    * STREAM (ingest batch 7 arriving in micro-batches) is gated against
    * the PERSISTED shingle registry of batches 0..6
    * ([[graft.streaming.StreamTransforms.incrementalDedupGate]]), and
    * its novel shingles are upserted into the next registry generation
    * inside an idempotent foreachBatch
    * ([[ShingleRegistry.upsertBatch]]: anti-join the live bucketed
    * table, append survivors — replays are no-ops by construction).
    * Declared here through the batch equivalent (◐ like every stream
    * row): gating against a FROZEN generation makes the result
    * independent of micro-batch boundaries, so run-to-completion
    * stream ≡ batch; StreamingSpec drives the same transform + upsert
    * from a real MemoryStream with a forced double delivery and a
    * restart, and asserts gate rows ≡ batch AND final registry state ≡
    * the one-shot [[ShingleRegistry.ensureUpserted]] generation.
    *
    * Scale notes (100 TB): the registry is the huge side — bucketed by
    * shingle, it feeds the merge join co-partitioned with ZERO Exchange
    * (PlanSpec-asserted); only the arriving micro-batch shuffles (one
    * shingle-keyed Exchange). The upsert appends per-bucket files and
    * never rewrites history. Gate state is one counter struct per
    * in-flight doc.
    */
  val streamIncrementalDedup = Q(
    "stream_incremental_dedup",
    (spark, dir) => {
      import spark.implicits._
      val reg = ShingleRegistry.ensure(spark, dir)
      StreamTransforms.incrementalDedupGate(
        Tables.documents(spark, dir)
          .filter(ShingleRegistry.batchOf($"doc_id") === 7), reg)
        .orderBy($"doc_id")
    },
    Some("""
      WITH tok AS (
        SELECT doc_id,
          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS pos,
          tok
        FROM (
          SELECT doc_id,
            UNNEST(string_split(lower(text), ' ')) AS tok,
            UNNEST(range(len(string_split(lower(text), ' ')))) AS pos
          FROM documents) WHERE tok <> ''
      ), sh AS (
        SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
        FROM tok a
        JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      ), b AS (
        SELECT doc_id,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 8 AS batch
        FROM documents
      ), reg AS (
        SELECT DISTINCT s.shingle
        FROM sh s JOIN b USING (doc_id) WHERE b.batch < 7
      ), cur AS (
        SELECT s.doc_id, s.shingle
        FROM sh s JOIN b USING (doc_id) WHERE b.batch = 7
      )
      SELECT c.doc_id,
        COUNT(*) AS n_shingles,
        CAST(SUM(CASE WHEN r.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_seen,
        COUNT(*) - CAST(SUM(CASE WHEN r.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_novel,
        SUM(CASE WHEN r.shingle IS NOT NULL THEN 1 ELSE 0 END) * 2 >= COUNT(*)
          AS is_flagged
      FROM cur c LEFT JOIN reg r USING (shingle)
      GROUP BY c.doc_id
      ORDER BY c.doc_id
    """.stripMargin.trim))

  /** STREAMING ANN SERVE GATE (round-9 second wave) — online vector
    * retrieval as a stream row: arriving query embeddings are answered
    * from the PERSISTED IVF index ([[IvfIndex.ensure]]) with per-query
    * gate aggregates — candidates scanned in the 2 probed cells,
    * matches over the τ=0.6 relevance floor, and the best match by
    * rounded cosine (vec_id tiebreak; (−1, −1.0) sentinels when the
    * floor filters everything) — the decision shape a RAG router
    * consumes, aggregation-only because rank windows don't stream.
    * Declared through the batch equivalent (◐): scoring against a
    * frozen index generation makes the result independent of
    * micro-batch boundaries, so run-to-completion stream ≡ batch;
    * StreamingSpec drives the SAME transform over MemoryStream query
    * batches in update mode and asserts equality.
    *
    * Scale notes (100 TB): the codebook broadcasts and cell probing is
    * row-local (compiled top-k scorer); the candidate join is
    * stream-static against the CELL-BUCKETED index, so the index side
    * never shuffles and each query touches ~nprobe/nlist of it; state
    * is one counter struct per in-flight query.
    */
  val streamAnnServeGate = Q(
    "stream_ann_serve_gate",
    (spark, dir) => {
      import spark.implicits._
      val (idx, ivfCb) = IvfIndex.ensure(spark, dir)
      val q = VectorOps.withNorm(spark, dir)
        .filter($"vec_id" < 50).select($"vec_id", $"emb")
      StreamTransforms.annServeGate(q, idx, ivfCb).orderBy($"q_id")
    },
    Some(s"""
      WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
          SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), ${VectorOps.ivfCodebookSql}, sims AS (
        SELECT e.vec_id, e.emb, e.nrm, c.cell,
          ROUND(list_inner_product(e.emb, c.cvec) / (e.nrm * c.cnrm), 6) AS csim
        FROM e CROSS JOIN centn c
      ), assigned AS (
        SELECT vec_id, emb, nrm, cell FROM (
          SELECT vec_id, emb, nrm, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS cr
          FROM sims)
        WHERE cr = 1
      ), probes AS (
        SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm, cell FROM (
          SELECT vec_id, emb, nrm, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS cr
          FROM sims WHERE vec_id < 50)
        WHERE cr <= 2
      ), cand AS (
        SELECT p.q_id, a.vec_id AS c_id,
          ROUND(list_inner_product(a.emb, p.q_emb) / (a.nrm * p.q_nrm), 6) AS cos
        FROM assigned a JOIN probes p USING (cell)
        WHERE a.vec_id <> p.q_id
      ), best AS (
        SELECT q_id, c_id, cos FROM (
          SELECT q_id, c_id, cos,
            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
          FROM cand WHERE cos >= 0.6)
        WHERE rn = 1
      ), gated AS (
        SELECT q_id,
          COUNT(*) AS n_candidates,
          CAST(SUM(CASE WHEN cos >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
        FROM cand GROUP BY q_id
      )
      SELECT g.q_id, g.n_candidates, g.n_matches,
        COALESCE(b.c_id, -1) AS best_vec_id,
        COALESCE(b.cos, -1.0) AS best_cos
      FROM gated g LEFT JOIN best b USING (q_id)
      ORDER BY g.q_id
    """.stripMargin.trim))

  /** STREAMING VECTOR INGEST (SURVEY §2 I-tredec, VERDICT r11 #3) —
    * the vector analogue of `stream_incremental_dedup`, closing the
    * text/vector symmetry: arriving embedding micro-batches (the
    * deterministic ≡ 3 mod 10 batch, [[graft.operators.IvfIndex.isAppendBatch]])
    * GATE against the persisted BASE index
    * ([[graft.streaming.StreamTransforms.vecIngestGate]]: row-local
    * assignment to the frozen base codebook — exactly the cell the
    * append will land in — then per-vector ingest aggregates over that
    * cell's existing members), and APPEND via an idempotent foreachBatch
    * ([[graft.operators.IvfIndex.appendVecBatch]]: anti-join the live
    * table on (cell, vec_id), co-partitioned with the bucketing, so
    * replays drop out by construction and ONLY the batch shuffles).
    * Declared through the batch gate equivalent (◐ like every stream
    * row): gating against a FROZEN base generation makes the result
    * independent of micro-batch boundaries, so run-to-completion stream
    * ≡ batch; StreamingSpec drives the same transform + append from a
    * real MemoryStream with a forced double delivery and a restart, and
    * asserts gate rows ≡ batch AND final stream-maintained index state
    * ≡ the one-shot [[graft.operators.IvfIndex.ensureAppended]]
    * generation with base files byte-untouched. Fully oracled: the gate
    * output is a deterministic function of the corpus, re-derived from
    * scratch in DuckDB.
    *
    * Scale notes (100 TB): the index is the huge side — cell-bucketed,
    * it feeds the stream-static merge join co-partitioned with ZERO
    * Exchange (PlanSpec-asserted); only the arriving micro-batch
    * shuffles (one cell-keyed Exchange). The append writes per-bucket
    * files and never rewrites history; gate state is one counter
    * struct per in-flight vector.
    */
  val streamVecAppend = Q(
    "stream_vec_append",
    (spark, dir) => {
      import spark.implicits._
      val (baseIdx, baseCb) = IvfIndex.ensureBase(spark, dir)
      val batch = graft.operators.VectorOps.withNorm(spark, dir)
        .filter(IvfIndex.isAppendBatch($"vec_id"))
        .select($"vec_id", $"emb")
      StreamTransforms.vecIngestGate(batch, baseIdx, baseCb)
        .orderBy($"vec_id")
    },
    Some(s"""
      WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
          SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), ${graft.operators.VectorOps.baseAppendLifecycleSql}, cand AS (
        SELECT b.vec_id, b.cell, m.vec_id AS c_id,
          ROUND(list_inner_product(m.emb, b.emb) / (m.nrm * b.nrm), 6) AS cos
        FROM (SELECT * FROM ball WHERE vec_id % 10 = 3) b
        JOIN (SELECT * FROM ball WHERE vec_id % 10 <> 3) m USING (cell)
      ), best AS (
        SELECT vec_id, c_id, cos FROM (
          SELECT vec_id, c_id, cos,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
          FROM cand)
        WHERE rn = 1
      ), gated AS (
        SELECT vec_id, cell, COUNT(*) AS n_candidates,
          CAST(SUM(CASE WHEN cos >= 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS n_similar
        FROM cand GROUP BY vec_id, cell
      )
      SELECT g.vec_id, g.cell, g.n_candidates, g.n_similar,
        b.c_id AS best_vec_id, b.cos AS best_cos
      FROM gated g JOIN best b USING (vec_id)
      ORDER BY g.vec_id
    """.stripMargin.trim))

  def qs: Seq[Q] = Seq(
    streamTumblingAgg, streamSlidingAgg, streamSessionWindow,
    streamDedupWatermark, streamStatefulCustom, streamStaticJoin,
    streamStreamJoin, streamUpsertLatest, streamOuterIntervalJoin,
    streamDistinctUsers, streamSessionTimer, streamTwsLast3Trail,
    streamForeachbatchSink, streamIncrementalDedup, streamAnnServeGate,
    streamVecAppend)
}
