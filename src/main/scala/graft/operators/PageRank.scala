package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list in PURE INTEGER arithmetic — the
  * web-graph curation signal (Common Crawl ranks its frontier with
  * exactly this family; a training-data pipeline uses the rank as a
  * crawl-quality prior next to the text-level filters).
  *
  * Design for determinism first: ranks live on an integer grid of
  * `scale` units (default 1e9) and the damping factor is the exact
  * rational `dampNum/dampDen` (default 17/20 = 0.85), so one
  * iteration is
  *
  *   share(u)  = rank(u) div outdeg(u)                (integer div)
  *   rank'(v)  = base + (dampNum * Σ_{u→v} share(u)) div dampDen
  *   base      = ((dampDen-dampNum) * scale) div (dampDen * n)
  *
  * — no floating point anywhere, so any two engines (and any two
  * cluster topologies — integer addition commutes exactly, unlike
  * double sums) produce bit-identical ranks. The floor divisions leak
  * O(1) units of mass per node per iteration; that bias is identical
  * everywhere and irrelevant for ranking.
  *
  * Scale shape: the classic Pregel layout expressed relationally.
  * Each iteration is one |E|-row equi-join (ranks ⋈ edges on src) and
  * one groupBy(dst) partial-agg shuffle of skinny (dst, share) rows;
  * the edge table is joined pre-degreed so iterations reuse its
  * cached partitioning. Lineage is truncated with an eager
  * localCheckpoint per iteration (the [[Dedup.resolveClusters]]
  * pattern) — 10 iterations over 100 TB of edges never builds a
  * 10-deep plan. Driver state is two longs (n, base).
  *
  * Dangling nodes (out-degree 0) would silently lose their mass, so
  * by default the operator fails loudly if any exist; symmetrized
  * graphs (every edge mirrored, the undirected form used for
  * curation) cannot have any.
  */
object PageRank {

  /** Ranks after `iters` iterations: (node, rank) with rank on the
    * `scale` integer grid. `edges` is a directed edge list; pass the
    * symmetrized union for undirected ranking.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000000L, dampNum: Long = 17L,
      dampDen: Long = 20L, requireNoDangling: Boolean = true): DataFrame = {
    require(iters >= 0 && iters <= 100, s"iters=$iters out of [0,100]")
    require(dampNum > 0 && dampNum < dampDen, "need 0 < damping < 1")
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val nodes = e.select($"__src".as("node"))
      .union(e.select($"__dst".as("node"))).distinct().persist()
    val deg = e.groupBy($"__src").agg(count(lit(1)).as("__deg"))
    // pre-degreed edges, cached once: every iteration probes this
    val edgesDeg = e.join(deg, "__src").persist()

    // one-time metadata-sized check: a node that appears only as a
    // dst never redistributes its rank — refuse instead of leaking
    if (requireNoDangling) {
      val danglingCount =
        nodes.join(deg.select($"__src".as("node")), Seq("node"), "left_anti")
          .count()
      require(danglingCount == 0L,
        s"$danglingCount dangling node(s) (out-degree 0) — symmetrize the " +
          "graph or handle their mass explicitly")
    }

    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)

    var ranks = nodes.select($"node", lit(scale / n).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val sums = ranks
        .join(edgesDeg, ranks("node") === edgesDeg("__src"))
        .select($"__dst".as("node"), expr("rank div __deg").as("__share"))
        .groupBy($"node").agg(sum($"__share").as("__s"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select($"node",
          (lit(base) + expr(s"($dampNum * coalesce(__s, 0L)) div $dampDen"))
            .as("rank"))
        .localCheckpoint(true)
    }
    nodes.unpersist()
    edgesDeg.unpersist()
    ranks
  }
}
