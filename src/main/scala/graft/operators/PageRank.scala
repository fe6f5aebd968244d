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
  * Each iteration joins the |V|-row share table into the cached
  * NARROW (src, dst) edge list (broadcast under `broadcastNodeLimit`
  * nodes, shuffle join above it) and runs one groupBy(dst)
  * partial-agg shuffle of skinny (dst, share) rows — the |E| rows
  * themselves never move. Lineage is truncated with an eager
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
    * symmetrized union for undirected ranking and set `symmetric` —
    * then the node set and the "no inbound mass" left join both
    * collapse into the degree table (src set = dst set = node set),
    * which cut setup from 3.7 s to 1.5 s at sf0.1.
    *
    * Iteration shape (measured fastest of four layouts at sf0.1):
    * the |V|-row share table (ranks ⋈ degrees, both skinny) is
    * explicitly BROADCAST into the persisted NARROW (src, dst) edge
    * table — AQE cannot pick the broadcast itself because a
    * checkpointed side has no stats — then one map-side-combined
    * groupBy(dst) shuffle of skinny pairs. The |E| rows never move.
    * Past `broadcastNodeLimit` nodes the share join degrades to a
    * plain shuffle join against the cached edge partitioning (a
    * billion-node share table must not be collected). An eager
    * localCheckpoint per iteration truncates lineage (the
    * [[Dedup.resolveClusters]] pattern); spacing checkpoints out
    * measured SLOWER — the deep tail re-executes broadcast subplans.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000000L, dampNum: Long = 17L,
      dampDen: Long = 20L, requireNoDangling: Boolean = true,
      symmetric: Boolean = false,
      broadcastNodeLimit: Long = 10000000L): DataFrame = {
    require(iters >= 0 && iters <= 100, s"iters=$iters out of [0,100]")
    require(dampNum > 0 && dampNum < dampDen, "need 0 < damping < 1")
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .persist()
    val deg = e.groupBy($"__src").agg(count(lit(1)).as("__deg")).persist()

    // symmetric + no dangling ⇒ src set = node set; otherwise build
    // the full node set and check for silent mass sinks
    val nodes =
      if (symmetric) deg.select($"__src".as("node"))
      else {
        val ns = e.select($"__src".as("node"))
          .union(e.select($"__dst".as("node"))).distinct().persist()
        if (requireNoDangling) {
          val danglingCount = ns
            .join(deg.select($"__src".as("node")), Seq("node"), "left_anti")
            .count()
          require(danglingCount == 0L,
            s"$danglingCount dangling node(s) (out-degree 0) — symmetrize " +
              "the graph or handle their mass explicitly")
        }
        ns
      }

    val n = if (symmetric) deg.count() else nodes.count()
    require(n > 0, "empty graph")
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    val bcastShares = n <= broadcastNodeLimit

    // r15: attach the out-degree to the cached edge list ONCE, so
    // each iteration needs a single broadcast (the |V|-row rank
    // table) instead of two (degrees into ranks, then shares into
    // edges) — the per-iteration broadcast-build jobs were half the
    // iteration cost at sf0.1. share(u) = rank div deg now evaluates
    // per EDGE instead of per node: the identical integer division
    // on the identical operands, so every partial sum is unchanged.
    val degSide0 = if (bcastShares) broadcast(deg) else deg
    val e2 = e.join(degSide0, Seq("__src")).persist()
    var ranks = nodes.select($"node", lit(scale / n).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val rSide = if (bcastShares) broadcast(ranks) else ranks
      val sums = e2.join(rSide, $"node" === $"__src")
        .groupBy($"__dst".as("node"))
        .agg(sum(expr("rank div __deg")).as("__s"))
      val next =
        if (symmetric)
          // every node has in-edges: sums covers the full node set
          sums.select($"node",
            (lit(base) + expr(s"($dampNum * __s) div $dampDen")).as("rank"))
        else
          nodes.join(sums, Seq("node"), "left")
            .select($"node",
              (lit(base) +
                expr(s"($dampNum * coalesce(__s, 0L)) div $dampDen"))
                .as("rank"))
      ranks = next.localCheckpoint(true)
    }
    if (!symmetric) nodes.unpersist()
    e.unpersist()
    e2.unpersist()
    deg.unpersist()
    ranks
  }

  /** X143 — semi-supervised label propagation (Zhu & Ghahramani 2002,
    * synchronous majority vote): seeds carry fixed labels; each
    * iteration every node adopts the most frequent label among its
    * in-neighbors' current labels (ties to the SMALLEST label id —
    * total order, so the whole fixpoint is deterministic and
    * oracle-replayable), with seed labels clamped. Unlabeled
    * neighbors don't vote; nodes no vote reaches stay unlabeled. The
    * weak-supervision expansion step next to [[run]]'s quality prior:
    * a handful of hand-labeled domains/docs propagates over a
    * similarity or citation graph.
    *
    * Labels must be non-negative ints. Votes aggregate by
    * groupBy(node, label) count with an argmax via max(struct(count,
    * -label)) — per-node aggregation, never a global window.
    *
    * Scale shape: [[run]]'s Pregel layout — per iteration one
    * broadcast-or-shuffle join of the |V|-row label table into the
    * persisted narrow edge list plus one (node, label) partial agg;
    * localCheckpoint truncates lineage. Driver state is nothing.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedNodeCol: String, seedLabelCol: String,
      iters: Int, broadcastNodeLimit: Long = 10000000L): DataFrame = {
    require(iters >= 0 && iters <= 100, s"iters=$iters out of [0,100]")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .persist()
    val nodes = e.select($"__src".as("node"))
      .union(e.select($"__dst".as("node"))).distinct().persist()
    val sd = seeds.select(col(seedNodeCol).as("node"),
      col(seedLabelCol).cast("long").as("__seed")).persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val bcast = n <= broadcastNodeLimit
    // r15: the (node ⋈ seed) left join is loop-invariant — it was
    // rebuilt (join + broadcast build) inside every iteration; hoist
    // it into one checkpointed |V|-row frame that doubles as the
    // round-0 labels (guide §2.4). Clamp/vote semantics unchanged.
    val nodeSeed = nodes
      .join(if (bcast) broadcast(sd) else sd, Seq("node"), "left")
      .select($"node", $"__seed").localCheckpoint(true)
    var labels = nodeSeed.select($"node", $"__seed".as("lab"))
    for (_ <- 1 to iters) {
      val labeled = labels.filter($"lab".isNotNull)
        .select($"node".as("__vn"), $"lab".as("__vl"))
      val voteSide = if (bcast) broadcast(labeled) else labeled
      val votes = e.join(voteSide, $"__src" === $"__vn")
        .groupBy($"__dst".as("node"), $"__vl")
        .agg(count(lit(1)).as("__c"))
        .groupBy($"node")
        .agg(max(struct($"__c", (-$"__vl").as("__nl"))).as("__best"))
        .select($"node", (-$"__best.__nl").as("__vote"))
      val next = nodeSeed
        .join(votes, Seq("node"), "left")
        .select($"node", coalesce($"__seed", $"__vote").as("lab"))
      labels = next.localCheckpoint(true)
    }
    nodeSeed.unpersist(blocking = false)
    e.unpersist(); nodes.unpersist(); sd.unpersist()
    labels.select($"node", $"lab".as("label"))
  }

  /** X363 — HITS hubs & authorities (Kleinberg 1999) on a DIRECTED
    * edge list: authority = Σ hub over in-edges, hub = Σ authority
    * over out-edges, L1-renormalized to `scale` each half-step — on
    * the customer→supplier purchase graph, hub = "buys from the
    * well-bought", authority = "bought by the big buyers", the
    * two-sided importance [[run]]'s single PageRank score conflates.
    *
    * Determinism contract (the [[run]] fixed-point convention): all
    * scores are longs; each half-step is one equi-join + sum, then an
    * in-plan renormalization `(score·scale) div total` (decimal
    * product — indeg·scale² exceeds a long) against a one-row
    * broadcast total; localCheckpoint per iteration truncates
    * lineage. Nodes with no in-edges hold authority 0, no out-edges
    * hub 0; the oracle replays the identical integer chain unrolled.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters=$iters out of [1,100]")
    val spark = edges.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val e = edges.select(col(srcCol).as("__src"),
      col(dstCol).as("__dst")).distinct().persist()
    require(e.limit(1).count() > 0, "empty graph")
    val nodes = e.select($"__src".as("node"))
      .union(e.select($"__dst".as("node"))).distinct().persist()

    def renorm(raw: DataFrame, c: String): DataFrame = {
      val tot = raw.agg(sum(col(c)).cast(dec).as("__tot"))
      raw.crossJoin(broadcast(tot))
        .select($"node", expr(
          s"cast((cast($c as $dec) * $scale) div __tot as bigint)")
          .as(c))
    }

    var hubs = nodes.select($"node", lit(scale).as("hub"))
      .localCheckpoint(true)
    var auths: DataFrame = null
    // r15 (guide §2.4): checkpoint the RAW half-step scores and keep
    // the renormalization LAZY over the checkpointed frame. The r14
    // layout checkpointed renorm(raw), whose plan contains raw twice
    // (once under the broadcast total, once as the probe side), so
    // every half-step executed its |E|-join + aggregate TWICE; now the
    // heavy join/agg runs once per half-step and downstream passes pay
    // only a narrow projection + a one-row total over in-memory
    // checkpoint blocks. Integer chain unchanged — same sums, same
    // totals, same div — so ranks stay bit-identical to the oracle.
    for (_ <- 1 to iters) {
      val aRaw = nodes.join(
        e.join(hubs, $"__src" === $"node")
          .groupBy($"__dst").agg(sum($"hub").as("__a"))
          .select($"__dst".as("node"), $"__a"),
        Seq("node"), "left")
        .select($"node", coalesce($"__a", lit(0L)).as("auth"))
        .localCheckpoint(true)
      auths = renorm(aRaw, "auth")
      val hRaw = nodes.join(
        e.join(auths, $"__dst" === $"node")
          .groupBy($"__src").agg(sum($"auth").as("__h"))
          .select($"__src".as("node"), $"__h"),
        Seq("node"), "left")
        .select($"node", coalesce($"__h", lit(0L)).as("hub"))
        .localCheckpoint(true)
      hubs = renorm(hRaw, "hub")
    }
    val out = hubs.join(auths, Seq("node"))
      .select($"node", $"hub", $"auth".as("authority"))
    e.unpersist(); nodes.unpersist()
    out
  }
}
