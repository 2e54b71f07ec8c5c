package graft.ext

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables

/** Registered dedup queries — exact dedup (oracle: DISTINCT/GROUP BY),
  * blocked near-dup candidates with exact n-gram Jaccard (oracle: DuckDB
  * list algebra), and MinHash-LSH / SimHash variants (hash-seed-specific,
  * so rows-only checked here and property-tested in ScalaTest).
  */
object DedupQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "q_dedup_exact",
      (s, d) =>
        Tables(s, d, "documents")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("text")).as("n_unique"))
          .orderBy("lang"),
      Some(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
          "CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique " +
          "FROM documents GROUP BY lang ORDER BY lang"),
      headline = true
    ),
    Q(
      "q_dedup_rep",
      // Exact dedup keeping a deterministic representative (min doc_id) per
      // text group — the hash-partitioned groupBy pattern that replaces
      // dropDuplicates' arbitrary survivor at scale.
      (s, d) =>
        Tables(s, d, "documents")
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
          .select(col("doc_id"), col("n_copies"))
          .orderBy("doc_id"),
      Some(
        "SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies " +
          "FROM documents GROUP BY text ORDER BY doc_id")
    ),
    Q(
      "q_dedup_ngram_jaccard",
      // Near-dup detection: block on (lang, 50-char prefix) — bounded
      // buckets, no all-pairs — then exact 3-gram Jaccard on candidates.
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("text"), substring(col("text"), 1, 50).as("blk"))
        val a = docs.select(col("doc_id").as("a_id"), col("lang"), col("blk"), col("text").as("a_text"))
        val b = docs.select(col("doc_id").as("b_id"), col("lang"), col("blk"), col("text").as("b_text"))
        a.join(b, Seq("lang", "blk"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), Dedup.ngramJaccardExpr(3, "a_text", "b_text").as("jac"))
          .filter(col("jac") >= 0.3)
          .orderBy("a_id", "b_id")
      },
      Some(
        "WITH docs AS (SELECT doc_id, lang, text, substring(text, 1, 50) AS blk, " +
          "list_distinct(list_transform(generate_series(1, greatest(1, length(text) - 2)), " +
          "i -> substring(text, i, 3))) AS grams FROM documents), " +
          "cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
          "CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / " +
          "len(list_distinct(list_concat(a.grams, b.grams))) AS jac " +
          "FROM docs a JOIN docs b ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id) " +
          "SELECT a_id, b_id, jac FROM cand WHERE jac >= 0.3 ORDER BY a_id, b_id")
    ),
    Q(
      "q_dedup_components",
      // Cluster step after pair detection: connected components over the
      // ngram-jaccard edge set (min-label propagation, O(diameter)
      // rounds), emitting the canonical keep-one-per-cluster flag. Oracle
      // replicates the closure with a recursive CTE.
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("text"), substring(col("text"), 1, 50).as("blk"))
        val a = docs.select(col("doc_id").as("a_id"), col("lang"), col("blk"), col("text").as("a_text"))
        val b = docs.select(col("doc_id").as("b_id"), col("lang"), col("blk"), col("text").as("b_text"))
        val edges = a.join(b, Seq("lang", "blk"))
          .filter(col("a_id") < col("b_id"))
          .filter(Dedup.ngramJaccardExpr(3, "a_text", "b_text") >= 0.3)
          .select(col("a_id").as("a"), col("b_id").as("b"))
        val nodes = Tables(s, d, "documents").select(col("doc_id").as("id"))
        Dedup.connectedComponents(nodes, edges)
          .select(
            col("id").as("doc_id"),
            col("comp").as("component"),
            (col("comp") === col("id")).as("keep"))
          .orderBy("doc_id")
      },
      Some(
        "WITH RECURSIVE " +
          "docs AS (SELECT doc_id, lang, text, substring(text, 1, 50) AS blk, " +
          "list_distinct(list_transform(generate_series(1, greatest(1, length(text) - 2)), " +
          "i -> substring(text, i, 3))) AS grams FROM documents), " +
          "e AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM docs a JOIN docs b " +
          "ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id " +
          "WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / " +
          "len(list_distinct(list_concat(a.grams, b.grams))) >= 0.3), " +
          "sym AS (SELECT a_id AS src, b_id AS dst FROM e UNION ALL SELECT b_id, a_id FROM e), " +
          "walk(id, comp) AS (SELECT doc_id, doc_id FROM documents " +
          "UNION SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.id) " +
          "SELECT id AS doc_id, CAST(MIN(comp) AS BIGINT) AS component, (MIN(comp) = id) AS keep " +
          "FROM walk GROUP BY id ORDER BY doc_id")
    ),
    Q(
      "q_dedup_minhash",
      // MinHash-LSH near-dup pairs: 32 hashes, 8 bands × 4 — candidates
      // only from band collisions (no cross join). Hash-seed-specific →
      // rows-only check here; recall vs exact Jaccard is property-tested.
      (s, d) =>
        Dedup
          .minhashPairs(Tables(s, d, "documents"), "doc_id", "text")
          .orderBy("a_id", "b_id"),
      None,
      headline = true
    ),
    Q(
      "q_minhash_union",
      // Sketch merge: per-language minhash signature of the UNION of all
      // documents' shingle sets (elementwise-min UDAF over per-doc
      // signatures) + cross-language similarity estimate vs 'en'.
      (s, d) => {
        import org.apache.spark.sql.functions.udaf
        val sigs = Dedup
          .minhashSignatures(
            Tables(s, d, "documents").select(col("doc_id"), col("lang"), col("text")),
            "doc_id", "text", shingleK = 5, nHashes = 32)
          .join(
            Tables(s, d, "documents").select(col("doc_id").as("id"), col("lang")),
            Seq("id"))
        val unioned = sigs
          .groupBy(col("lang"))
          .agg(udaf(MinHashUnionAgg).apply(col("sig")).as("union_sig"))
        val en = unioned.filter(col("lang") === "en")
          .select(col("union_sig").as("en_sig"))
        unioned
          .crossJoin(broadcast(en))
          .select(
            col("lang"),
            Dedup.estJaccard(col("union_sig"), col("en_sig"), 32).as("est_jaccard_vs_en"))
          .orderBy("lang")
      },
      None
    ),
    Q(
      "q_dedup_simhash",
      // SimHash fingerprints via the custom codegen expression
      // (graft.functions.SimHash64): near-dup pairs = same 16-bit chunk
      // (banding) AND Hamming distance <= 12 of the 64-bit fingerprint.
      (s, d) => {
        val fp = Tables(s, d, "documents")
          .select(col("doc_id"), expr("simhash64(text)").as("fp"))
        val chunks = fp.select(
          col("doc_id"),
          col("fp"),
          posexplode(
            array((0 until 4).map(i => expr(s"(fp >> ${i * 16}) & 65535")): _*))
            .as(Seq("chunk_idx", "chunk")))
        val a = chunks.select(col("doc_id").as("a_id"), col("fp").as("a_fp"), col("chunk_idx"), col("chunk"))
        val b = chunks.select(col("doc_id").as("b_id"), col("fp").as("b_fp"), col("chunk_idx"), col("chunk"))
        a.join(b, Seq("chunk_idx", "chunk"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), expr("bit_count(a_fp ^ b_fp)").as("hamming"))
          .distinct()
          .filter(col("hamming") <= 12)
          .orderBy("a_id", "b_id")
      },
      None
    ),
    Q(
      "q_line_dedup",
      // C4-style sub-document (line-level) exact dedup: the corpus is cut
      // into non-overlapping 5-token segments (the "line" analogue for
      // the synthetic text), and only the FIRST occurrence of each
      // distinct segment survives — first = lowest (doc_id, seg_idx), the
      // same deterministic keep rule C4 applies per three-sentence span.
      // Plan: one explode, one window keyed on the segment text (high
      // cardinality — scale-safe), one per-doc rollup. At 100 TB the
      // segment window is a hash shuffle on the segment, never a global
      // sort.
      (s, d) => {
        val segs = expr(
          "transform(sequence(0, greatest(CAST(ceil(size(split(text, ' ')) / 5.0) AS INT), 1) - 1), " +
            "i -> array_join(slice(split(text, ' '), i * 5 + 1, 5), ' '))")
        val exploded = Tables(s, d, "documents")
          .select(col("doc_id"), posexplode(segs).as(Seq("seg_idx", "seg")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("seg")).orderBy(col("doc_id"), col("seg_idx"))
        exploded
          .withColumn("kept", (row_number().over(w) === 1).cast("long"))
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_segs"),
            sum(col("kept")).as("n_kept"))
          .withColumn(
            "kept_frac",
            col("n_kept").cast("double") / col("n_segs").cast("double"))
          .orderBy("doc_id")
      },
      Some(
        "WITH segs AS (SELECT doc_id, i AS seg_idx, " +
          "array_to_string(string_split(text, ' ')[(5*i+1):(5*i+5)], ' ') AS seg " +
          "FROM documents, unnest(generate_series(0, " +
          "greatest(CAST(ceil(len(string_split(text, ' ')) / 5.0) AS INT), 1) - 1)) AS t(i)), " +
          "k AS (SELECT doc_id, CASE WHEN ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1 " +
          "THEN 1 ELSE 0 END AS kept FROM segs) " +
          "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs, CAST(SUM(kept) AS BIGINT) AS n_kept, " +
          "CAST(SUM(kept) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS kept_frac " +
          "FROM k GROUP BY doc_id ORDER BY doc_id"),
      headline = true
    ),
    Q(
      "q_exact_substr",
      // ExactSubstr-style cross-document substring overlap (the Lee et
      // al. 2022 dedup signal, shingled): every OVERLAPPING 10-token
      // window is fingerprinted (md5 — the rolling-hash analogue with a
      // portable hash), a window is "repeated" when its fingerprint
      // occurs in more than one document, and each doc reports its
      // repeated-span fraction. Plan: one explode, one fingerprint-keyed
      // hash-agg (distinct docs per fp), one fp-keyed join back, one
      // per-doc rollup — fingerprint cardinality ~ corpus tokens, so
      // every shuffle key is near-uniform. The suffix-array formulation
      // is single-machine; this shingle form is the one that shards.
      (s, d) => {
        val toks = split(col("text"), " ")
        val wins = expr(
          "transform(sequence(1, size(split(text, ' ')) - 9), " +
            "i -> md5(CAST(array_join(slice(split(text, ' '), i, 10), ' ') AS BINARY)))")
        val w = Tables(s, d, "documents")
          .filter(size(toks) >= 10)
          .select(col("doc_id"), explode(wins).as("fp"))
        val fpDocs = w.groupBy(col("fp"))
          .agg(countDistinct(col("doc_id")).as("nd"))
        w.join(fpDocs, Seq("fp"))
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_windows"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_repeated"))
          .withColumn(
            "repeated_frac",
            col("n_repeated").cast("double") / col("n_windows").cast("double"))
          .orderBy("doc_id")
      },
      Some(
        "WITH w AS (SELECT doc_id, md5(array_to_string(string_split(text, ' ')[i:i+9], ' ')) AS fp " +
          "FROM documents, unnest(generate_series(1, len(string_split(text, ' ')) - 9)) AS t(i) " +
          "WHERE len(string_split(text, ' ')) >= 10), " +
          "fd AS (SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM w GROUP BY fp) " +
          "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows, " +
          "CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated, " +
          "CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS repeated_frac " +
          "FROM w JOIN fd USING (fp) GROUP BY doc_id ORDER BY doc_id")
    )
  )
}
