package graft.queries

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** Pinned-geometry checks for the graph family. The registered queries are
  * oracle-checked against DuckDB on the fixture; these specs pin the math
  * on graphs small enough to count by hand, via the same degree-oriented
  * wedge-join shape q_triangle_count runs (re-derived here so a regression
  * in either formulation surfaces as a disagreement).
  */
class GraphSpec extends SparkSpec {

  /** Degree-oriented triangle count over an explicit undirected edge list. */
  private def triangles(edges: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
    val deg = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val o = e
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(
          col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("t")))
          .otherwise(struct(col("b").as("s"), col("a").as("t")))
          .as("e"))
      .select(col("e.s").as("src"), col("e.t").as("dst"))
    // both formulations must agree — the edge-centric default and the
    // wedge-join fallback cross-check each other on every hand graph
    val byEdge = Graph.closedTriangles(o, edgeCentric = true)
      .head().getAs[Long]("n_triangles")
    val byWedge = Graph.closedTriangles(o, edgeCentric = false)
      .head().getAs[Long]("n_triangles")
    assert(byEdge == byWedge, s"edge-centric $byEdge != wedge-join $byWedge")
    byEdge
  }

  test("triangle count: K4 has 4, a path has 0, two shared-edge triangles count twice") {
    // K4: every 3-subset of 4 nodes closes = C(4,3) = 4 triangles
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(triangles(k4) == 4L)
    // path 0-1-2-3: wedges exist, none close
    assert(triangles(Seq((0L, 1L), (1L, 2L), (2L, 3L))) == 0L)
    // bowtie sharing edge (1,2): {0,1,2} and {1,2,3}
    assert(triangles(Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))) == 2L)
    // duplicate + reversed input edges must not inflate the count
    assert(triangles(Seq((0L, 1L), (1L, 0L), (0L, 2L), (1L, 2L), (2L, 1L))) == 1L)
  }

  test("q_triangle_count invariants on the fixture: closure bound and handshake parity") {
    val row = Registry.byName("q_triangle_count").run(spark, sf()).head()
    val nodes = row.getAs[Long]("n_nodes")
    val edges = row.getAs[Long]("n_edges")
    val wedges = row.getAs[Long]("n_wedges")
    val tris = row.getAs[Long]("n_triangles")
    val cc = row.getAs[Double]("global_cc")
    assert(nodes > 0 && edges > 0)
    // each triangle closes 3 wedges; closure ratio is a probability
    assert(3 * tris <= wedges)
    assert(cc >= 0.0 && cc <= 1.0)
    assert(cc == (if (wedges == 0) 0.0 else 3.0 * tris / wedges))
  }
}
