package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q

/** User-behavior operators over the `events` stream — the sequence/cohort
  * shapes a training-data pipeline runs when the corpus is event logs
  * rather than documents (round-6 widening):
  *
  *   - per-user ordered history construction (the "build the interaction
  *     sequence per entity" step before sequence-model training);
  *   - weekly cohort retention (first-seen week × offset grid);
  *   - event-type transition matrix (first-order Markov counts).
  *
  * Determinism: every ordering is total — (ts at µs, event_id) — so
  * collect-then-sort, window lag, and string_agg agree bit-for-bit with
  * the oracle; probabilities are single double divisions of exact counts.
  *
  * Scale shape: each query is ONE shuffle keyed on user_id (history,
  * transitions) or the small (cohort_week, offset) grid; per-user state is
  * bounded by that user's activity, never the corpus. No global sorts
  * besides the presentation ORDER BY.
  */
object Behavior {

  val queries: Seq[Q] = Seq(
    Q(
      "q_user_history",
      // Ordered per-user event sequence: collect_list is order-free, so
      // the sequence is made deterministic by sorting the collected
      // structs on (ts, event_id) — struct comparison is field-order
      // lexicographic, exactly the oracle's ORDER BY inside string_agg.
      // The path ships as md5 so the gate checks bytes without megabyte
      // rows. One hash-agg keyed on user_id; per-user list size is that
      // user's event count — the standard sequence-construction plan.
      (s, d) => {
        val seq0 = array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type"))))
        Events
          .events(s, d)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts")).cast("timestamp_ntz").as("first_ts"),
            max(col("ts")).cast("timestamp_ntz").as("last_ts"),
            md5(array_join(transform(seq0, x => x("event_type")), ">").cast("binary")).as("path_md5"))
          .orderBy("user_id")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events) " +
          "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, " +
          "min(ts) AS first_ts, max(ts) AS last_ts, " +
          "md5(string_agg(event_type, '>' ORDER BY ts, event_id)) AS path_md5 " +
          "FROM e GROUP BY user_id ORDER BY user_id"),
      headline = true
    ),
    Q(
      "q_cohort",
      // Weekly cohort retention: cohort = Monday of the user's first-seen
      // week (window min per user — the corpus is scanned once, no
      // self-join), offset = whole weeks since (both sides Monday-truncated
      // so the day diff is an exact multiple of 7). Output is the
      // (cohort_week × offset) grid with distinct-user and event counts —
      // bounded by weeks², tiny at any corpus size.
      (s, d) => {
        val e = Events.events(s, d)
        val firstTs = min(col("ts")).over(Window.partitionBy(col("user_id")))
        e.withColumn("cohort_week", date_trunc("week", firstTs))
          .withColumn(
            "week_offset",
            (datediff(date_trunc("week", col("ts")), col("cohort_week")) / 7).cast("long"))
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
          .select(
            col("cohort_week").cast("timestamp_ntz").as("cohort_week"),
            col("week_offset"), col("n_users"), col("n_events"))
          .orderBy("cohort_week", "week_offset")
      },
      Some(
        "WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
          "f AS (SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts FROM e), " +
          "c AS (SELECT user_id, date_trunc('week', first_ts) AS cohort_week, " +
          "CAST(date_diff('day', date_trunc('week', first_ts), date_trunc('week', ts)) // 7 AS BIGINT) AS week_offset FROM f) " +
          "SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset, " +
          "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, CAST(COUNT(*) AS BIGINT) AS n_events " +
          "FROM c GROUP BY 1, 2 ORDER BY 1, 2")
    ),
    Q(
      "q_transition",
      // First-order Markov transition matrix over event types: lag(1)
      // within (user, total time order), count per (prev, next), and the
      // row-conditional probability via a window sum over prev — one
      // double division of exact counts. Plan: one shuffle on user_id for
      // the lag, one hash-agg on the tiny (prev, next) grid.
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Events
          .events(s, d)
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn(
            "p",
            col("n").cast("double") /
              sum(col("n")).over(Window.partitionBy(col("prev_type"))).cast("double"))
          .select(col("prev_type"), col("next_type"), col("n"), col("p"))
          .orderBy("prev_type", "next_type")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
          "l AS (SELECT event_type AS next_type, " +
          "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM e), " +
          "t AS (SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n FROM l " +
          "WHERE prev_type IS NOT NULL GROUP BY 1, 2) " +
          "SELECT prev_type, next_type, n, " +
          "CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p " +
          "FROM t ORDER BY prev_type, next_type")
    ),
    Q(
      "q_event_runs",
      // Gaps-and-islands: consecutive same-event-type RUNS per user (the
      // rn − rn_per_type grouping idiom), rolled up to a run-length
      // distribution per event type. (ts, event_id) is the total order in
      // both engines. Plan: one shuffle on user_id serves both window
      // ranks, then a tiny (type, len) hash-agg.
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wt = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Events
          .events(s, d)
          .select(
            col("user_id"), col("event_type"),
            (row_number().over(w) - row_number().over(wt)).as("grp"))
          .groupBy(col("user_id"), col("event_type"), col("grp"))
          .agg(count(lit(1)).as("run_len"))
          .groupBy(col("event_type"), col("run_len"))
          .agg(count(lit(1)).as("n_runs"))
          .orderBy("event_type", "run_len")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
          "r AS (SELECT user_id, event_type, " +
          "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - " +
          "ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS grp FROM e), " +
          "runs AS (SELECT user_id, event_type, grp, CAST(COUNT(*) AS BIGINT) AS run_len " +
          "FROM r GROUP BY 1, 2, 3) " +
          "SELECT event_type, run_len, CAST(COUNT(*) AS BIGINT) AS n_runs " +
          "FROM runs GROUP BY 1, 2 ORDER BY 1, 2")
    ),
    Q(
      "q_decay_sum",
      // Finite-horizon exponentially-decayed rolling sum per user — the
      // recency-weighted activity score feature stores maintain (trending
      // signals, decayed engagement counts). The textbook recurrence
      // S = v + α·S_prev never terminates and α^k is IEEE-unsafe
      // cross-engine (pow drifts in the last bit; see the Agg scaladoc);
      // this is the DETERMINISTIC formulation: half-life-per-event decay
      // truncated at 8 taps, so the score is Σ_{k=0..7} lag(v,k)·2^(7−k) —
      // every weight is a power of two (multiplication only shifts the
      // exponent, exact in IEEE), and both engines evaluate the identical
      // left-associated 8-term sum, so the doubles match bit-for-bit.
      // Truncation error is bounded by 2^-8 of the oldest mass — the same
      // approximation a bounded-state streaming implementation makes.
      // Plan: ONE user-keyed shuffle; the 8 lags share a single sorted
      // window frame; per-row state is 8 values regardless of history
      // length — this survives any corpus size.
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val decayed = (0 to 7)
          .map(k => coalesce(lag(col("value"), k).over(w), lit(0.0)) * lit(1L << (7 - k)))
          .reduce(_ + _)
        Events
          .events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("decayed", decayed)
          .select(
            col("user_id"), col("event_id"),
            col("ts").cast("timestamp_ntz").as("ts"), col("decayed"))
          .orderBy("user_id", "ts", "event_id")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events) " +
          "SELECT user_id, event_id, ts, " +
          "COALESCE(lag(value, 0) OVER w, 0) * 128 + COALESCE(lag(value, 1) OVER w, 0) * 64 + " +
          "COALESCE(lag(value, 2) OVER w, 0) * 32 + COALESCE(lag(value, 3) OVER w, 0) * 16 + " +
          "COALESCE(lag(value, 4) OVER w, 0) * 8 + COALESCE(lag(value, 5) OVER w, 0) * 4 + " +
          "COALESCE(lag(value, 6) OVER w, 0) * 2 + COALESCE(lag(value, 7) OVER w, 0) * 1 AS decayed " +
          "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
          "ORDER BY user_id, ts, event_id")
    )
  )
}
