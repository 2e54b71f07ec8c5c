package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.core.{Agg, Tables}

/** Corpus-monitoring operators — the drift/outlier checks a production
  * data pipeline runs per ingest batch (round-6 widening):
  *
  *   - per-source token-distribution drift vs the corpus (chi-square over
  *     the top-K vocabulary) — catches a source whose content shifted;
  *   - per-language document-length outliers (z-score from exact-integer
  *     moments) — catches truncation/concatenation bugs upstream.
  *
  * Determinism: probabilities and chi-square terms are double divisions of
  * exact integer counts; the only cross-row double sum goes through the
  * fixed-point dsum recipe (scaled 1e6 so the quantum sits far below the
  * signal); sqrt is IEEE-correctly-rounded in both engines.
  *
  * Scale shape: one explode feeds a (source, token) hash-agg; the
  * chi-square grid is sources x topK — both bounded dims, so the final
  * agg is tiny regardless of corpus size. No global windows, no driver
  * data.
  */
object MonitorQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "q_source_drift",
      (s, d) => {
        val st = Tables(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .groupBy(col("source"), col("token"))
          .agg(count(lit(1)).as("c_st"))
        val ct = st.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
        val top = ct.orderBy(col("c_t").desc, col("token")).limit(50)
        val totS = st.groupBy(col("source")).agg(sum(col("c_st")).as("tot_s"))
        val total = ct.agg(sum(col("c_t")).as("t_all"))
        // fixed vocab grid: a source MISSING a top token still contributes
        // (0 - p)^2 / p — an inner join would silently drop exactly the
        // rows that signal the largest drift
        val grid = totS.crossJoin(broadcast(top)).crossJoin(broadcast(total))
        val joined = grid.join(st, Seq("source", "token"), "left")
        val pS = coalesce(col("c_st"), lit(0L)).cast("double") / col("tot_s").cast("double")
        val p = col("c_t").cast("double") / col("t_all").cast("double")
        val term = (pS - p) * (pS - p) / p
        joined
          .groupBy(col("source"))
          .agg((Agg.dsum(term * 1e6) / 1e6).as("chi2_top50"))
          .orderBy("source")
      },
      Some(
        "WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents), " +
          "st AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c_st FROM tok WHERE token <> '' GROUP BY 1, 2), " +
          "ct AS (SELECT token, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1), " +
          "top AS (SELECT token, c_t FROM ct ORDER BY c_t DESC, token LIMIT 50), " +
          "tots AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS tot_s FROM st GROUP BY 1), " +
          "total AS (SELECT CAST(SUM(c_t) AS BIGINT) AS t_all FROM ct), " +
          "grid AS (SELECT source, token, c_t, tot_s, t_all FROM tots CROSS JOIN top CROSS JOIN total), " +
          "terms AS (SELECT g.source, " +
          "power(CAST(COALESCE(st.c_st, 0) AS DOUBLE) / CAST(g.tot_s AS DOUBLE) - " +
          "CAST(g.c_t AS DOUBLE) / CAST(g.t_all AS DOUBLE), 2) / " +
          "(CAST(g.c_t AS DOUBLE) / CAST(g.t_all AS DOUBLE)) AS term " +
          "FROM grid g LEFT JOIN st ON g.source = st.source AND g.token = st.token) " +
          "SELECT source, " + Agg.dsumSql("term * 1e6") + " / 1e6 AS chi2_top50 " +
          "FROM terms GROUP BY source ORDER BY source")
    ),
    Q(
      "q_outlier_docs",
      // Length outliers per language: exact-integer first/second moments
      // (token counts need no quantization), closed-form mean/stddev,
      // z = (len - mean) / std — flag |z| > 1.75 (the synthetic lengths are near-uniform, so a
      // production 3-sigma bar flags nothing at small SF). Exactly the
      // q_stats_moments recipe applied to quality monitoring.
      (s, d) => {
        val len = size(split(col("text"), " ")).cast("long")
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("lang"), len.as("n_tok"))
        val x = col("n_tok").cast(DecimalType(38, 0))
        val m = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(x * x).as("sxx"))
        val nD = col("n").cast("double")
        val sx = col("sx").cast("double"); val sxx = col("sxx").cast("double")
        val stats = m.select(
          col("lang"),
          (sx / nD).as("mean_len"),
          sqrt((sxx - sx * sx / nD) / (nD - 1.0)).as("std_len"))
        docs
          .join(broadcast(stats), Seq("lang"))
          .withColumn("z", (col("n_tok").cast("double") - col("mean_len")) / col("std_len"))
          .filter(abs(col("z")) > 1.75)
          .select(col("doc_id"), col("lang"), col("n_tok"), col("z"))
          .orderBy("doc_id")
      },
      Some(
        "WITH docs AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents), " +
          "m AS (SELECT lang, COUNT(*) AS n, SUM(CAST(n_tok AS HUGEINT)) AS sx, " +
          "SUM(CAST(n_tok AS HUGEINT) * CAST(n_tok AS HUGEINT)) AS sxx FROM docs GROUP BY lang), " +
          "stats AS (SELECT lang, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_len, " +
          "sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / " +
          "(CAST(n AS DOUBLE) - 1.0)) AS std_len FROM m) " +
          "SELECT doc_id, docs.lang, n_tok, " +
          "(CAST(n_tok AS DOUBLE) - mean_len) / std_len AS z " +
          "FROM docs JOIN stats ON docs.lang = stats.lang " +
          "WHERE abs((CAST(n_tok AS DOUBLE) - mean_len) / std_len) > 1.75 ORDER BY doc_id")
    ),
    Q(
      "q_embed_drift",
      // Embedding-space drift between two corpus halves (old = even ids,
      // new = odd — the batch-over-batch comparison a serving pipeline
      // runs when the upstream encoder or data mix changes): per-label
      // centroids of each half via the fixed-point davg per dimension,
      // then the cosine between old and new centroids — a sequential
      // fold over pos-ordered dims, so both engines see identical doubles
      // end to end. Drift ~1.0 = stable; the synthetic halves are iid so
      // values sit near 1. Plan: one explode → (label, half, pos)
      // hash-agg → per-(label, half) array build → 10-row join.
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val e = emb.select(
          col("label"),
          (col("vec_id") % 2 === 0).as("is_old"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        val cent = e.groupBy(col("label"), col("is_old"), col("pos"))
          .agg(Agg.davg(col("x")).as("m"))
        val arrs = cent.groupBy(col("label"), col("is_old"))
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            x => x("m")).as("c"))
        val old = arrs.filter(col("is_old")).select(col("label"), col("c").as("c_old"))
        val neu = arrs.filter(!col("is_old")).select(col("label"), col("c").as("c_new"))
        val counts = emb.groupBy(col("label")).agg(
          sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_old"),
          sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_new"))
        old.join(neu, "label").join(counts, "label")
          .select(
            col("label"), col("n_old"), col("n_new"),
            Similarity.cosine(col("c_old"), col("c_new")).as("centroid_cos"))
          .orderBy("label")
      },
      Some(
        "WITH e AS (SELECT label, vec_id % 2 = 0 AS is_old, gs - 1 AS pos, CAST(v AS DOUBLE) AS x " +
          "FROM (SELECT label, vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS gs FROM embeddings)), " +
          "cent AS (SELECT label, is_old, pos, " + Agg.davgSql("x") + " AS m FROM e GROUP BY 1, 2, 3), " +
          "arrs AS (SELECT label, is_old, list(m ORDER BY pos) AS c FROM cent GROUP BY 1, 2), " +
          "o AS (SELECT label, c AS c_old FROM arrs WHERE is_old), " +
          "n AS (SELECT label, c AS c_new FROM arrs WHERE NOT is_old), " +
          "cnt AS (SELECT label, CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old, " +
          "CAST(SUM(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new FROM embeddings GROUP BY label) " +
          "SELECT label, n_old, n_new, " +
          "list_dot_product(c_old, c_new) / (sqrt(list_dot_product(c_old, c_old)) * sqrt(list_dot_product(c_new, c_new))) AS centroid_cos " +
          "FROM o JOIN n USING (label) JOIN cnt USING (label) ORDER BY label")
    ),
    Q(
      "q_ts_anomaly",
      // Time-series volume anomaly per event type: hourly counts, then a
      // z-score against that type's own hourly distribution (exact
      // integer first/second moments over the hour grid — the
      // q_stats_moments recipe on a time series). Every hour is emitted
      // with its score and an |z| > 2 flag, so the monitor's output is
      // audit-ready rather than empty-when-healthy. Two hash-aggs, both
      // on bounded keys (hour grid × types); no windows over raw events.
      (s, d) => {
        val hourly = graft.queries.Events.events(s, d)
          .groupBy(
            date_trunc("hour", col("ts")).as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val x = col("n").cast(DecimalType(38, 0))
        val stats = hourly.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"), sum(x).as("sx"), sum(x * x).as("sxx"))
          .select(
            col("event_type"),
            (col("sx").cast("double") / col("n_hours").cast("double")).as("mean_n"),
            // guard the degenerate series identically to the oracle: a
            // single-hour type has no sample variance (n_hours−1 = 0 would
            // be a 0-division → NaN), and a constant series has std 0 —
            // both must yield NULL z, not NaN/Inf (NaN would also diverge
            // between engines in the compare)
            when(col("n_hours") > 1,
              sqrt((col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") /
                col("n_hours").cast("double")) / (col("n_hours").cast("double") - 1.0)))
              .otherwise(lit(null).cast("double")).as("std_n"))
        hourly
          .join(broadcast(stats), Seq("event_type"))
          .withColumn("z",
            (col("n").cast("double") - col("mean_n")) /
              when(col("std_n") === 0.0, lit(null).cast("double")).otherwise(col("std_n")))
          .select(
            col("hour").cast("timestamp_ntz").as("hour"),
            col("event_type"), col("n"), col("z"),
            (abs(col("z")) > 2.0).as("flagged"))
          .orderBy("hour", "event_type")
      },
      Some(
        "WITH hourly AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type, " +
          "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), " +
          "m AS (SELECT event_type, COUNT(*) AS n_hours, SUM(CAST(n AS HUGEINT)) AS sx, " +
          "SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS sxx FROM hourly GROUP BY event_type), " +
          "stats AS (SELECT event_type, CAST(sx AS DOUBLE) / CAST(n_hours AS DOUBLE) AS mean_n, " +
          "CASE WHEN n_hours > 1 THEN " +
          "sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n_hours AS DOUBLE)) / " +
          "(CAST(n_hours AS DOUBLE) - 1.0)) ELSE NULL END AS std_n FROM m) " +
          "SELECT CAST(hour AS TIMESTAMP) AS hour, hourly.event_type, n, " +
          "(CAST(n AS DOUBLE) - mean_n) / nullif(std_n, 0) AS z, " +
          "abs((CAST(n AS DOUBLE) - mean_n) / nullif(std_n, 0)) > 2.0 AS flagged " +
          "FROM hourly JOIN stats ON hourly.event_type = stats.event_type ORDER BY 1, 2")
    ),
    Q(
      "q_source_overlap",
      // Pairwise source-overlap matrix — the diagnostic you run BEFORE
      // mixture sampling (q_mix_sample / q_temperature_mix): two sources
      // with high content overlap double-count their weight in the blend
      // and leak near-dups across fold splits. Overlap = Jaccard over
      // each source's DISTINCT word-trigram set (unigrams are degenerate
      // on the fixture's ~31-word vocabulary; trigrams require shared
      // SEQUENCES). Plan: one explode → per-(source, gram) distinct →
      // gram-keyed self-join counts shared grams per source pair —
      // candidates are per-gram, never per-doc-pair, and the output is
      // sources², a constant. Pairs sharing zero grams are absent (inner
      // join) — both engines agree on the omission.
      (s, d) => {
        val tri = expr(
          "transform(sequence(1, greatest(1, size(split(text, ' ')) - 2)), " +
            "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))")
        val g = Tables(s, d, "documents")
          .select(col("source"), explode(tri).as("gram"))
          .distinct()
        val sizes = g.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val shared = g.select(col("source").as("sa"), col("gram"))
          .join(g.select(col("source").as("sb"), col("gram")), "gram")
          .filter(col("sa") < col("sb"))
          .groupBy(col("sa"), col("sb"))
          .agg(count(lit(1)).as("inter"))
        shared
          .join(sizes.select(col("source").as("sa"), col("n").as("n_a")), "sa")
          .join(sizes.select(col("source").as("sb"), col("n").as("n_b")), "sb")
          .select(
            col("sa"), col("sb"), col("n_a"), col("n_b"), col("inter"),
            (col("inter").cast("double") /
              (col("n_a") + col("n_b") - col("inter")).cast("double")).as("jac"))
          .orderBy("sa", "sb")
      },
      Some(
        "WITH t AS (SELECT source, string_split(text, ' ') AS w FROM documents), " +
          "g AS (SELECT DISTINCT source, unnest(list_transform(" +
          "generate_series(1, greatest(1, len(w) - 2)), i -> array_to_string(w[i:i+2], ' '))) AS gram FROM t), " +
          "s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY source), " +
          "p AS (SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS inter " +
          "FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source GROUP BY 1, 2) " +
          "SELECT sa, sb, na.n AS n_a, nb.n AS n_b, inter, " +
          "CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jac " +
          "FROM p JOIN s na ON sa = na.source JOIN s nb ON sb = nb.source ORDER BY sa, sb")
    )
  )
}
