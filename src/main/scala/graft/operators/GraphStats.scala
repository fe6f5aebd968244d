package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X190 — undirected-graph shape statistics: triangle count and the
  * global clustering (transitivity) coefficient 3·T / #wedges. The
  * community-density readout for the dedup/co-occurrence graphs the
  * other graph ops walk (X101 PageRank ranks nodes, X143 label-prop
  * colors them — this measures how CLIQUEY the structure is, the
  * signal that separates template-burst near-dup clusters from
  * chains).
  *
  * Algorithm: canonicalize edges to a < b, then count triangles with
  * the standard two-hop distributed join e(a,b) ⋈ e(b,c) ⋈ e(a,c) —
  * each triangle a<b<c matched exactly once, no orientation
  * double-count. Wedge mass Σ d(d−1)/2 comes from the degree table.
  * Scale shape: the joins shuffle on node keys; on power-law graphs
  * the classic refinement is degree-ordered orientation (point each
  * edge low→high degree), which this canonical a<b form
  * approximates for id-random graphs — noted for the 100 TB path.
  */
object GraphStats {

  private val dec = "decimal(38,0)"

  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    // the canonical edge table feeds five subtrees (nodes, edges,
    // degrees, and all three legs of the triangle join) — pay the
    // upstream build once
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()
    val nodes = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .agg(count_distinct(col("v")).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("__d"))
    val wedges = deg.agg(coalesce(
      sum((col("__d").cast(dec) * (col("__d") - 1L)).cast(dec)),
      lit(0).cast(dec)).as("__w2"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    nodes.crossJoin(nEdges).crossJoin(tri).crossJoin(wedges)
      .select(col("n_nodes").cast("long").as("n_nodes"),
        col("n_edges").cast("long").as("n_edges"),
        col("n_triangles").cast("long").as("n_triangles"),
        expr("cast((__w2 div 2) as bigint)").as("n_wedges"),
        when(col("__w2") > 0,
          round(lit(6.0) * col("n_triangles").cast("double") /
            col("__w2").cast("double"), 6)).as("clustering_coeff"))
  }

  /** X206 — k-core extraction by bounded peeling: `iters` rounds of
    * "drop every node with degree < k, keep edges whose endpoints
    * both survive". The fixed-point is the k-core (the dense
    * community skeleton that survives when pendant/chain structure
    * is stripped — where X190's triangles live); a bounded iteration
    * count keeps the plan replayable (the X101 unrolled-CTE
    * convention) and the `converged` flag reports whether one more
    * round would still peel. Returns one summary row:
    * (n_nodes, n_edges, converged).
    *
    * Scale shape: each round is a degree agg + two semi joins on
    * node keys; `localCheckpoint` cuts lineage per round (the X1f
    * cluster-resolution lesson — 10 chained rounds otherwise
    * replan exponentially).
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, iters: Int = 8): DataFrame = {
    require(k >= 1, s"bad k $k")
    require(iters >= 1 && iters <= 32, s"bad iters $iters")
    var e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val deg = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("v"))
      e = e
        .join(deg.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(deg.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
    }
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("__d"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(when(col("__d") < k, 1L).otherwise(0L)), lit(0L))
        .as("__peelable"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(ne)
      .select(col("n_nodes").cast("long").as("n_nodes"),
        col("n_edges").cast("long").as("n_edges"),
        (col("__peelable") === 0L).as("converged"))
  }
}
