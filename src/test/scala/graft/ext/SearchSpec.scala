package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** The postings/retrieval family: phrase-search positional semantics on a
  * planted adversarial corpus, inverted-index digest cross-check against a
  * driver-side recompute, champion-list recall against the exact all-pairs
  * top-3, and BM25 determinism.
  */
class SearchSpec extends SparkSpec {

  test("phrase search: postings intersection counts overlapping occurrences the scan can only boolean") {
    import spark.implicits._
    // "value table value table value": occurrences at pos 0 and 2 OVERLAP
    // in the padded-substring sense (the trailing space of match 1 is the
    // leading space of match 2) — a regex/LIKE counter undercounts, the
    // positional join does not. Plus boundary traps: phrase at start, at
    // end, token-substring lookalikes, and the phrase split across a
    // third token.
    val docs = Seq(
      (0L, "value table value table value", "en", "t", 29L),
      (1L, "value table a b", "en", "t", 15L),
      (2L, "a b value table", "en", "t", 15L),
      (3L, "valuetable value stable", "en", "t", 23L),
      (4L, "value a table", "en", "t", 13L),
      (5L, "table value", "en", "t", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("searchspec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.byName("q_phrase_search").run(spark, dir).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(0L).getAs[Long]("n_occ") == 2L)
    assert(byId(1L).getAs[Long]("n_occ") == 1L)
    assert(byId(2L).getAs[Long]("n_occ") == 1L)
    assert(byId(3L).getAs[Long]("n_occ") == 0L)
    assert(byId(4L).getAs[Long]("n_occ") == 0L)
    assert(byId(5L).getAs[Long]("n_occ") == 0L)
    assert(out.forall(_.getAs[Boolean]("agree")))
  }

  test("3-term phrase search: k-way intersection handles overlap, repeats, and lookalikes") {
    import spark.implicits._
    // q_phrase_search3's phrase is "window fast query". Traps: two
    // occurrences sharing a boundary word-gap (doc 0), a repeated
    // mid-phrase bigram that must NOT count (doc 2's "fast query" echo),
    // token-glued lookalikes (doc 4's "windowfast"), and the phrase
    // split by one word (doc 3).
    val docs = Seq(
      (0L, "window fast query fast query window fast query", "en", "t", 46L),
      (1L, "window fast query", "en", "t", 17L),
      (2L, "a window fast query fast query", "en", "t", 30L),
      (3L, "window fast stable query", "en", "t", 24L),
      (4L, "windowfast query window fast query x", "en", "t", 36L),
      (5L, "fast query window", "en", "t", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("searchspec3").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.byName("q_phrase_search3").run(spark, dir).collect()
    val occ = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occ")).toMap
    assert(occ == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
    assert(out.forall(_.getAs[Boolean]("agree")))
  }

  test("incremental index merge equals the rebuild on every term at fixture scale") {
    val out = Registry.byName("q_index_incremental").run(spark, sf()).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("matches_rebuild")))
    // and the merged digests are literally the full-build digests
    val fullIdx = Registry.byName("q_inverted_index").run(spark, sf()).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[String]("postings_md5")).toMap
    assert(out.forall(r => fullIdx(r.getAs[String]("term")) == r.getAs[String]("postings_md5")))
  }

  test("inverted index: digest matches a driver-side recompute and tf totals conserve") {
    val dir = sf()
    val out = Registry.byName("q_inverted_index").run(spark, dir).collect()
    val totalTf = out.map(_.getAs[Long]("total_tf")).sum
    val nTok = graft.core.Tables(spark, dir, "documents")
      .select(sum(size(split(col("text"), " ")).cast("long")))
      .collect().head.getLong(0)
    assert(totalTf == nTok) // every token lands in exactly one posting
    // independent recompute: single-threaded Scala over the raw text
    val raw = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val postings = raw
      .flatMap { case (id, t) => t.split(" ", -1).zipWithIndex.map { case (w, p) => (w, id, p) } }
      .groupBy(_._1)
    for (row <- out) {
      val term = row.getAs[String]("term")
      val entries = postings(term)
        .groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (id, ps) => s"$id:${ps.map(_._3).sorted.mkString(",")}" }
      val canonical = entries.mkString("|")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(canonical.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(row.getAs[String]("postings_md5") == md, s"digest mismatch for term '$term'")
      assert(row.getAs[Long]("df") == entries.size)
    }
  }

  test("champion-list sparse cosine: recall vs exact all-pairs top-3 under the adversarial vocab") {
    // sf0.01 (500 docs) makes the champion cap BIND (per-term signature
    // df ~80 > C=64) while exact all-pairs is still cheap — the honest
    // worst case: a 31-word vocabulary gives the index no selectivity.
    // Measured two-point so the 100 TB C-choice is evidence, not
    // assertion (round-11 verdict #7): C=64 (the registered cap) floors
    // at 0.8; quartering the index to C=16 is also measured and floored
    // at its own observed level — the recall/candidate-volume trade the
    // PLANS.md table records.
    val dir = sf("sf0.01")
    val approxByC = Seq(16, 64).map { c =>
      c -> SearchQueries.championCosine(graft.core.Tables(spark, dir, "documents"), c)
        .select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }.toMap
    // the registered query IS championCosine at ChampionC=64
    val registered = Registry.byName("q_sparse_cosine").run(spark, dir)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(registered == approxByC(64))
    val approx = approxByC(64)
    val docs = graft.core.Tables(spark, dir, "documents")
    val n = docs.agg(count(lit(1)).as("n"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val sigW = Window.partitionBy(col("doc_id")).orderBy(col("w").desc, col("term"))
    val sig = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), expr("tf * ((n * 1000000) div df)").as("w"))
      .withColumn("rnk", row_number().over(sigW))
      .filter(col("rnk") <= 5)
      .select(col("doc_id"), col("term"), col("w"))
      .localCheckpoint(true)
    val norms = sig.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("n2"))
    val exactPairs = sig.select(col("doc_id").as("a_id"), col("term"), col("w").as("wa"))
      .join(sig.select(col("doc_id").as("b_id"), col("term"), col("w").as("wb")), Seq("term"))
      .filter(col("a_id") =!= col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("doc_id").as("a_id"), col("n2").as("na2")), Seq("a_id"))
      .join(norms.select(col("doc_id").as("b_id"), col("n2").as("nb2")), Seq("b_id"))
      .select(
        col("a_id"), col("b_id"),
        (col("dot").cast("double") / (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double")))).as("cos"))
    val topW = Window.partitionBy(col("a_id")).orderBy(col("cos").desc, col("b_id"))
    val exact = exactPairs.withColumn("rnk", row_number().over(topW)).filter(col("rnk") <= 3)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    info(f"champion-list recall vs exact top-3: $recall%.3f (${approx.size} vs ${exact.size} pairs)")
    assert(recall >= 0.8, f"recall $recall%.3f below floor under champion cap (0.951 measured)")
    val recall16 = approxByC(16).intersect(exact).size.toDouble / exact.size
    info(f"C=16 recall vs exact top-3: $recall16%.3f (${approxByC(16).size} pairs)")
    assert(recall16 >= 0.35, f"C=16 recall $recall16%.3f collapsed (0.449 measured)")
    assert(recall16 <= recall, "smaller champion index cannot improve recall on this fixture")
    // third point — the cap NOT binding (round-15 candidate thread,
    // closed): C=256 exceeds every per-term signature df on this
    // fixture (~80), so the candidate set is exactly all
    // signature-term-sharing pairs, which is a SUPERSET of the exact
    // top-3 (cosine > 0 requires a shared signature term) — recall is
    // provably 1.0, not approximately. The registered C=64 is thus
    // bracketed from both sides: 0.449 (C=16) / 0.951 (C=64) / 1.0
    // (C=256), the full recall-vs-candidate-volume trade.
    val approx256 = SearchQueries
      .championCosine(graft.core.Tables(spark, dir, "documents"), 256)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall256 = approx256.intersect(exact).size.toDouble / exact.size
    info(f"C=256 recall vs exact top-3: $recall256%.3f")
    assert(recall256 == 1.0,
      f"non-binding cap must recover the exact top-3 exactly, got $recall256%.3f")
  }

  test("bm25: deterministic, ranked, and every hit contains a query term") {
    val dir = sf("sf0.01")
    val run1 = Registry.byName("q_bm25").run(spark, dir).collect()
    val run2 = Registry.byName("q_bm25").run(spark, dir).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq)
    assert(run1.nonEmpty)
    // per query: ranks are 1..k and scores non-increasing
    run1.groupBy(_.getAs[Int]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getAs[Long]("score_fp"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    val terms = Map(1 -> Seq("value", "table"), 2 -> Seq("spark", "batch"), 3 -> Seq("customer", "query"))
    val texts = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- run1) {
      val qs = terms(r.getAs[Int]("query_id"))
      val toks = texts(r.getAs[Long]("doc_id")).split(" ").toSet
      assert(qs.exists(toks.contains))
    }
  }

  test("chunk-level retrieval: hits attribute to real chunks whose WINDOW contains a query term") {
    val dir = sf()
    val terms = Map(1 -> Seq("value", "table"), 2 -> Seq("spark", "batch"), 3 -> Seq("customer", "query"))
    val hits = graft.Registry.byName("q_rag_chunk_search").run(spark, dir).collect()
    assert(hits.nonEmpty)
    val texts = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    for (r <- hits) {
      val doc = r.getAs[Long]("doc_id"); val ci = r.getAs[Long]("chunk_idx")
      assert(texts.contains(doc), s"hit names unknown doc $doc")
      val toks = texts(doc)
      val st = (ci * 30).toInt
      assert(st < toks.length, s"chunk $ci out of range for doc $doc (${toks.length} toks)")
      // the match must live INSIDE the attributed window — the
      // localization property chunk-level retrieval exists to provide
      val window = toks.slice(st, st + 40).toSet
      assert(terms(r.getAs[Int]("query_id")).exists(window.contains),
        s"doc $doc chunk $ci window has no query term")
      assert(r.getAs[Int]("rnk") >= 1 && r.getAs[Int]("rnk") <= 5)
    }
  }

  test("pruned late interaction is EXACT on the fixture (weak pruning recorded honestly)") {
    val full = graft.Registry.byName("q_late_interaction_mv").run(spark, sf()).collect()
      .map(r => ((r.getAs[Long]("q_id"), r.getAs[Int]("rank")),
        (r.getAs[Long]("n_id"), r.getAs[Double]("li_score")))).toMap
    val pruned = graft.Registry.byName("q_late_interaction_pruned").run(spark, sf()).collect()
    val prMap = pruned
      .map(r => ((r.getAs[Long]("q_id"), r.getAs[Int]("rank")),
        (r.getAs[Long]("n_id"), r.getAs[Double]("li_score")))).toMap
    // the safety argument makes the pruned top-5 EXACTLY the full scan's
    assert(prMap == full, "safe pruning changed the top-5 — the bound is not a bound")
    val nDocs = graft.core.Tables(spark, sf(), "documents").count()
    pruned.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_scored"))).distinct
      .sortBy(_._1).foreach { case (q, ns) =>
        assert(ns >= 5 && ns <= nDocs)
        info(s"query $q: exact-scored $ns of ${nDocs - 1} docs")
      }
  }

  test("pruned late interaction PRUNES HARD on a planted clustered token corpus") {
    // The isotropy finding from the registered query, resolved the same
    // way as the residual-PQ story: plant the cluster structure real
    // token embeddings have. 8 clusters whose sign pattern on dims 2-6
    // (the cell key) is constant within a cluster — each cluster is one
    // cell with radius cos ≈ 0.99, so cross-cluster upper bounds drop
    // far below τ and the exact stage reads only the query's own
    // cluster.
    import spark.implicits._
    def center(g: Int): Array[Double] = Array.tabulate(16) { j =>
      if (j >= 1 && j <= 3) { if (((g >> (j - 1)) & 1) == 1) 800.0 else -800.0 }
      else if (j == 4 || j == 5) 800.0
      else ((g * 53 + j * 29) % 401).toDouble - 200.0
    }
    def member(g: Int, m: Int): Array[Double] = {
      val c = center(g)
      Array.tabulate(16)(j => c(j) + ((g * 31 + m * 17 + j * 7) % 101).toDouble - 50.0)
    }
    val nDocs = 400
    val rows = for {
      d <- 0 until nDocs
      k <- 0 until 8
      g = d % 8
      m = (d / 8 + k) % 8
    } yield (d.toLong, k, s"t${g}_$m", member(g, m).toSeq)
    val vecs = rows.toDF("doc_id", "pos", "term", "tv")
      .withColumn("tv", col("tv").cast("array<double>"))
      .withColumn("tn2", Similarity.dot(col("tv"), col("tv")))
    val pruned = SearchQueries.latePruned(vecs).collect()
    // exactness vs the full scan over the planted corpus
    val allPairs = (for { q <- 0L until 3L; n <- 0L until nDocs.toLong if n != q }
      yield (q, n)).toDF("q_id", "n_id")
    val full = SearchQueries.maxsimOver(vecs, allPairs).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) =>
        q -> rs.map(r => (r.getAs[Double]("li_score"), r.getAs[Long]("n_id")))
          .sortBy { case (s, n) => (-s, n) }.take(5).toSeq
      }
    pruned.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val got = rs.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Double]("li_score"), r.getAs[Long]("n_id"))).toSeq
      assert(got == full(q), s"planted-corpus pruned top-5 differs for query $q")
    }
    // the point: pruning must actually bite here
    pruned.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_scored"))).distinct
      .sortBy(_._1).foreach { case (q, ns) =>
        info(s"planted query $q: exact-scored $ns of ${nDocs - 1} docs")
        assert(ns <= nDocs / 4,
          s"clustered corpus should prune >75% of the exact stage, scored $ns of ${nDocs - 1}")
      }
    // seed width is a COST knob, never a correctness one: the safety
    // argument holds for any width ≥ 5 (τ only moves down, escapes only
    // grow), so a narrow seed must change n_scored while the top-5 stays
    // bit-identical
    val narrow = SearchQueries.latePruned(vecs, seedWidth = 8).collect()
    def top5(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => ((r.getAs[Long]("q_id"), r.getAs[Int]("rank")),
        (r.getAs[Long]("n_id"), r.getAs[Double]("li_score")))).toMap
    assert(top5(narrow) == top5(pruned),
      "seed width changed the top-5 — pruning safety must be width-independent")
    val nsWide = pruned.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_scored"))).toMap
    narrow.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_scored"))).distinct.foreach {
      case (q, ns) => info(s"planted query $q seed=8: exact-scored $ns (seed=32: ${nsWide(q)})")
    }
  }

  test("pruned late interaction on the MoG fixture: exact, with a REAL measured prune rate") {
    // Round-13 planted corpora prove pruning CAN bite; this measures it
    // on the realistic clustered regime (MoGFixture: hash-random cluster
    // directions, quasi-normal spread — nothing aligned to the cell
    // key). Constants recorded in PLANS.md.
    val vecs = MoGFixture.multiVector(
      spark, seed = 7L, nDocs = 400, clusters = 12, tokens = 8, dim = 16)
      .localCheckpoint(true)
    val pruned = SearchQueries.latePruned(vecs).collect()
    // exactness first — the safety argument must hold on ANY corpus
    import spark.implicits._
    val allPairs = (for { q <- 0L until 3L; n <- 0L until 400L if n != q }
      yield (q, n)).toDF("q_id", "n_id")
    val full = SearchQueries.maxsimOver(vecs, allPairs).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) =>
        q -> rs.map(r => (r.getAs[Double]("li_score"), r.getAs[Long]("n_id")))
          .sortBy { case (s, n) => (-s, n) }.take(5).toSeq
      }
    pruned.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val got = rs.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Double]("li_score"), r.getAs[Long]("n_id"))).toSeq
      assert(got == full(q), s"MoG-corpus pruned top-5 differs for query $q")
    }
    // the measurement: scored fraction per query on clustering-but-not-
    // planted data (floor 50% pruned; the planted corpus gate is 75%)
    pruned.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_scored"))).distinct
      .sortBy(_._1).foreach { case (q, ns) =>
        info(s"MoG query $q: exact-scored $ns of 399 (prune ${(399 - ns) * 100 / 399}%)")
        assert(ns <= 200, s"MoG corpus should prune >=50% of the exact stage, scored $ns of 399")
      }
  }

  test("rank-eval over the late-interaction family: served ≡ truth on the fixture → perfect metrics") {
    // served recovers the full scan here (the vocab property the served
    // spec documents), so the eval harness must read exactly perfect —
    // any drop in hits/mrr/ndcg means either ranking regressed
    val rows = graft.Registry.byName("q_rank_eval_li").run(spark, sf()).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") == 5L, s"query ${r.get(0)} lost a truth hit")
      assert(r.getAs[Long]("mrr_fp") == 1000000L)
      assert(math.abs(r.getAs[Double]("ndcg") - 1.0) < 1e-12)
    }
  }

  test("compressed (PQ) late interaction: code accounting and recall gate hold") {
    val rows = graft.Registry.byName("q_late_interaction_pq").run(spark, sf()).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_queries") == 3L)
    // 500 docs × 8 tokens × 4 sub-codes — the compression accounting
    assert(r.getAs[Long]("n_code_rows") == 16000L)
    assert(r.getAs[Boolean]("recall_ge_floor"),
      "compressed maxsim shortlist lost the 0.8 recall floor after exact re-rank")
  }

  test("served late interaction: df-bounded pool, and on this fixture it recovers the full scan") {
    val full = graft.Registry.byName("q_late_interaction_mv").run(spark, sf()).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val served = graft.Registry.byName("q_late_interaction_served").run(spark, sf()).collect()
    val servedSet = served.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    // deterministic end to end, so exact equality is assertable — with
    // the honest caveat that it is a property of this fixture's 31-word
    // vocab (the lexical pool covers ~2/3 of the corpus, so every
    // vector-scored winner shares a token). On a realistic vocab the
    // served list may MISS vector-only matches; that trade lives in the
    // query's scaladoc, not hidden behind this assert.
    assert(servedSet == full,
      s"served top-5 diverged from the full scan on the fixture: ${servedSet.diff(full)}")
    val nDocs = graft.core.Tables(spark, sf(), "documents").count()
    served.foreach { r =>
      val nc = r.getAs[Long]("n_cand")
      assert(nc > 0 && nc < nDocs,
        s"candidate pool for query ${r.getAs[Long]("q_id")} is not df-bounded: $nc of $nDocs")
    }
  }
}
