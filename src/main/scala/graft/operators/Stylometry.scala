package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X247 — Burrows' Delta (Burrows 2002, the stylometry standard):
  * distance between text groups in FUNCTION-WORD space — take the
  * corpus's top-m most frequent words (function words dominate any
  * top-m), z-score each group's relative frequency of each word
  * across groups, and Delta(a,b) = mean_w \|z_aw − z_bw\|. Two
  * sources with the same topic vocabulary but different AUTHORSHIP
  * pipeline (template boilerplate, machine translation, scraped
  * mirrors) separate here when content-based similarity (X8/X94)
  * says "same" — the provenance-forensics lens the dedup suite
  * lacks.
  *
  * Determinism: relative frequencies quantize to NANO ints before
  * every cross-group fold (mean, population σ, and the z-diffs), so
  * per-word z-scores are fixed-shape doubles from exact integers and
  * the pairwise fold Σ\|Δz_nano\| is an exact integer sum — divided
  * once by m·1e9, round(6). Degenerate words (σ = 0 — same relative
  * frequency everywhere) contribute 0 by convention (their z is 0
  * for every group), not NULL poison.
  *
  * Scale shape: top-m is a TakeOrdered over the token vocabulary
  * (never a global sort); the z table is groups×m; the pairwise
  * fold joins two groups×m tables on the word — everything after
  * the one token-count agg is vocabulary- and group-bounded.
  */
object Stylometry {

  def burrowsDelta(df: DataFrame, groupCol: String, textCol: String,
      topM: Int = 30): DataFrame = {
    require(topM >= 5 && topM <= 500, s"bad topM $topM")
    val toks = df.select(col(groupCol).as("__g"),
      explode(Dedup.tokens(col(textCol))).as("__w"))
    val topWords = toks.groupBy(col("__w"))
      .agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w"))
      .limit(topM)
      .select(col("__w"))
    val kept = toks.join(broadcast(topWords), Seq("__w"))
    val gTotals = toks.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("__tot"))
    // relative frequency per (group, word), zero cells materialized
    // from the group x word frame so absent words count as f = 0
    val cells = kept.groupBy(col("__g"), col("__w"))
      .agg(count(lit(1)).cast("long").as("__n"))
    val frame = gTotals.crossJoin(broadcast(topWords))
      .join(cells, Seq("__g", "__w"), "left")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
      .withColumn("__fn",
        round(col("__n").cast("double") / col("__tot") * 1e9, 0)
          .cast("long"))
    val dec = "decimal(38,0)"
    val stats = frame.groupBy(col("__w"))
      .agg(count(lit(1)).cast("long").as("__k"),
        sum(col("__fn").cast(dec)).cast(dec).as("__sf"),
        sum((col("__fn").cast(dec) * col("__fn")).cast(dec)).cast(dec)
          .as("__sff"))
    val kd = col("__k").cast("double")
    val mu = col("__sf").cast("double") / kd
    val varN = col("__sff").cast("double") / kd - mu * mu
    val z = frame.join(broadcast(stats), Seq("__w"))
      .withColumn("__zn",
        when(varN > 0.0,
          round((col("__fn").cast("double") - mu) /
            sqrt(varN) * 1e9, 0).cast("long"))
          .otherwise(lit(0L)))
      .select(col("__g"), col("__w"), col("__zn"))
    val a = z.select(col("__g").as("group_a"), col("__w"),
      col("__zn").as("__za"))
    val b = z.select(col("__g").as("group_b"), col("__w"),
      col("__zn").as("__zb"))
    a.join(b, Seq("__w"))
      .filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(abs(col("__za") - col("__zb"))).cast("long").as("__s"))
      .select(col("group_a"), col("group_b"), col("n_words"),
        round(col("__s").cast("double") /
          (col("n_words").cast("double") * 1e9), 6).as("delta"))
  }

  /** X308 — "Fightin' Words" keyness (Monroe, Colaresi & Quinn
    * 2008): per word, the informative-Dirichlet-prior log-odds
    * difference between two sub-corpora,
    *
    *   δ_w = ln((y₁w+α_w)/(n₁+α₀−y₁w−α_w))
    *       − ln((y₂w+α_w)/(n₂+α₀−y₂w−α_w)),
    *   z_w = δ_w/√(1/(y₁w+α_w) + 1/(y₂w+α_w))
    *
    * with α_w = α₀·(y₁w+y₂w)/(n₁+n₂) — the source-fingerprinting
    * readout ("which words does THIS slice over-use beyond chance")
    * that plain tf-idf (X8) and Dunning G² (X292 — which flags
    * association, not direction) don't give. The prior shrinks
    * hapax z's to ~0, fixing PMI's rare-word explosion. The top-k
    * from each tail ship with a side label.
    *
    * Determinism: y's are exact integer counts; α_w, δ_w, z_w are a
    * fixed-shape per-word double expression (no cross-word fold);
    * the two tail cuts order by the ROUNDED z with the word as
    * tie-break. Vocabulary-bounded after one token-count aggregate.
    */
  def keyness(docs: DataFrame, textCol: String, isA: Column,
      alpha0: Double = 100.0, minCount: Long = 5L, topK: Int = 15)
      : DataFrame = {
    require(alpha0 > 0 && minCount >= 1 && topK >= 1, "bad params")
    val words = docs.select(isA.as("__a"),
        explode(split(col(textCol), " ")).as("__w"))
      .filter(col("__w") =!= "")
    val counts = words.groupBy(col("__w"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__y1"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("__y2"))
    val tot = counts.agg(sum(col("__y1")).cast("long").as("__n1"),
      sum(col("__y2")).cast("long").as("__n2"))
    val j = counts.crossJoin(broadcast(tot))
      .filter(col("__y1") + col("__y2") >= minCount)
    def d(c: Column) = c.cast("double")
    val aw = lit(alpha0) * d(col("__y1") + col("__y2")) /
      d(col("__n1") + col("__n2"))
    val delta =
      log((d(col("__y1")) + aw) /
        (d(col("__n1")) + alpha0 - d(col("__y1")) - aw)) -
      log((d(col("__y2")) + aw) /
        (d(col("__n2")) + alpha0 - d(col("__y2")) - aw))
    val z = delta / sqrt(lit(1.0) / (d(col("__y1")) + aw) +
      lit(1.0) / (d(col("__y2")) + aw))
    val scored = j.select(col("__w").as("term"),
      col("__y1").cast("long").as("count_a"),
      col("__y2").cast("long").as("count_b"),
      round(z, 6).as("z_score"))
    val topA = scored.orderBy(col("z_score").desc, col("term"))
      .limit(topK).withColumn("side", lit("a"))
    val topB = scored.orderBy(col("z_score").asc, col("term"))
      .limit(topK).withColumn("side", lit("b"))
    topA.unionAll(topB)
  }
}
