package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline
  * needs around the dedup/quality core: deterministic content
  * sampling and token-budget sharding. Pure Column expressions /
  * single-window plans — no UDFs, no driver state.
  */
object CorpusOps {

  /** Deterministic hash sampling: keep a row iff the top 32 bits of
    * md5(salt ‖ key) fall under `fraction`. Properties production
    * pipelines rely on:
    *   - reproducible across runs/engines (md5 is everywhere — the
    *     DuckDB oracle computes the identical predicate),
    *   - content-stable: adding/removing other rows never changes a
    *     row's fate (unlike reservoir/Bernoulli on row position),
    *   - nested samples: fraction 0.1 ⊂ fraction 0.2 for equal salt.
    */
  def hashSampleCol(key: Column, fraction: Double,
      salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), key)), 1, 8), 16, 10)
      .cast("long") < math.round(fraction * 4294967296.0)

  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashSampleCol(col(keyCol), fraction, salt))

  /** Stratified deterministic sampling: per-stratum fractions (e.g.
    * downsample English, keep all of a low-resource language), same
    * md5 determinism as `hashSample` — the sample for a stratum at
    * fraction f equals `hashSample(f)` restricted to that stratum,
    * so cross-run/nested properties carry over. Strata absent from
    * `fractions` default to 0 (dropped) — explicit allowlisting, the
    * safe default for corpus mixing. The fractions ship as a map
    * literal: no join, the predicate stays codegen'd in the scan
    * stage.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double], salt: String = ""): DataFrame = {
    val thresholds = map(fractions.toSeq.flatMap { case (k, f) =>
      Seq(lit(k), lit(math.round(f * 4294967296.0)))
    }: _*)
    val hash = conv(substring(md5(concat(lit(salt), col(keyCol))), 1, 8),
      16, 10).cast("long")
    df.filter(hash <
      coalesce(element_at(thresholds, col(stratumCol)), lit(0L)))
  }

  /** Token-budget sharding: pack an ordered document stream into
    * training shards of ≈`budgetTokens` each — shard id = ⌊cumulative
    * tokens before the doc / budget⌋, per `partitionCol` (e.g.
    * source/language), docs in `orderCol` order. One window (= one
    * shuffle by partition + in-partition sort) produces the whole
    * assignment; a doc larger than the budget gets its own shard
    * rather than splitting (the common packing policy; splitting is
    * a tokenizer-level concern).
    *
    * The cumulative sort is per-PARTITION, not global — shards of
    * different sources build in parallel; skewed sources are the
    * partitionCol's responsibility (salt it upstream if one source
    * is half the corpus).
    */
  def tokenShards(df: DataFrame, partitionCol: String, orderCol: String,
      tokenCountCol: String, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tokens_before",
        coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      // integral div: long `/` would detour through doubles and lose
      // exactness past 2^53 cumulative tokens (reachable at 100 TB)
      .withColumn("shard_id", expr(s"tokens_before div $budgetTokens"))
  }

  /** Deterministic training-order shuffle + shard assignment: every
    * row gets a shard (`pmod` of the md5 top-32-bits over `numShards`
    * — uniform regardless of key distribution) and a position within
    * its shard (rank by the full md5 digest, key as tiebreaker for
    * the astronomically-unlikely digest tie). The "global shuffle"
    * every training run needs, without a global sort: one hash
    * shuffle into shards + an in-shard sort, each shard independent —
    * the only scalable way to materialize a randomized epoch order
    * over 100 TB. Same md5 determinism as [[hashSample]]: the order
    * is reproducible across runs, engines, and corpus growth (a new
    * doc lands in its hash slot; existing relative orders are
    * preserved within a shard).
    *
    * Output: input columns + (shard, pos). Downstream writes
    * `partitionBy("shard")` sorted by pos — readers stream shards
    * round-robin for a well-mixed epoch.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String,
      numShards: Int, salt: String = ""): DataFrame = {
    val digest = md5(concat(lit(salt), col(keyCol)))
    val shard = pmod(
      conv(substring(digest, 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong)).cast("int")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__digest"), col(keyCol))
    df.withColumn("__digest", digest)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .drop("__digest")
  }

  /** Gopher-style repetition quality signals, one row per doc:
    *   - `ttr`: type-token ratio (distinct / total tokens — low =
    *     repetitive vocabulary),
    *   - `top_frac`: most-frequent-token share (high = degenerate
    *     repetition),
    *   - `dup_bigram_frac`: 1 − distinct/total bigrams (high =
    *     repeated phrasing — the strongest boilerplate signal).
    * The standard filters alongside [[cleanCorpus]]'s gates for
    * catching machine-generated or template text that passes
    * length/language checks.
    *
    * Two exploded aggregates (tokens, bigrams) joined on the doc key
    * — both map-side combinable, shuffle carries (doc, term) counts.
    * Docs with < 2 tokens report dup_bigram_frac = 0.0. All ratios
    * are IEEE-exact divisions of exact integers, so results reproduce
    * bit-identically in an external SQL engine.
    */
  def repetitionStats(docs: DataFrame, docCol: String,
      textCol: String): DataFrame = {
    val uni = InvertedIndex.termCounts(docs, docCol, textCol, n = 1)
      .groupBy(col(docCol))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("tf")).as("__top"))
    val bi = InvertedIndex.termCounts(docs, docCol, textCol, n = 2)
      .groupBy(col(docCol))
      .agg(sum(col("tf")).as("__n_bi"), count(lit(1)).as("__n_bi_d"))
    uni.join(bi, Seq(docCol), "left")
      .select(col(docCol), col("n_tokens"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("ttr"),
        (col("__top").cast("double") / col("n_tokens")).as("top_frac"),
        coalesce(
          lit(1.0) - col("__n_bi_d").cast("double") / col("__n_bi"),
          lit(0.0)).as("dup_bigram_frac"))
  }

  /** The composed corpus-cleaning stage — what a C4-style pipeline
    * runs as its first pass over raw documents: exact-dup
    * canonicalization, length gate, composite quality gate, and
    * language allowlist, annotated per doc with the FIRST failing
    * rule (fixed priority: duplicate → too_short → low_quality →
    * language) so rejection stats aggregate cleanly. Everything is
    * Column expressions plus ONE window (the content-hash duplicate
    * group — an 8-byte shuffle key, never raw text); quality and
    * lang-ID formulas are exactly the contracted `q_quality_score` /
    * `q_lang_id` math, so the whole stage reproduces in an external
    * SQL engine.
    *
    * `stopwords` drives both the quality stopword ratio (head list)
    * and lang-ID (argmax of per-list hit counts, ties to the earlier
    * list). Output: doc rows + (n_tokens, quality, predicted,
    * is_canonical, reject_reason, kept).
    */
  def cleanCorpus(docs: DataFrame, docCol: String, textCol: String,
      stopwords: Seq[(String, Seq[String])], keepLangs: Seq[String],
      minTokens: Int, minQuality: Double): DataFrame = {
    require(stopwords.nonEmpty, "need at least one stopword list")
    val toksCol = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    def hitsOf(ws: Seq[String]) =
      size(filter(toksCol, t => t.isin(ws.map(lit): _*)))
    val langs = stopwords.map(_._1)
    val scored = docs.select(
      Seq(col(docCol), col(textCol)) ++
        stopwords.map { case (l, ws) => hitsOf(ws).as(s"__s_$l") } ++ Seq(
          size(toksCol).as("n_tokens"),
          length(regexp_replace(col(textCol), "[^A-Za-z0-9]", ""))
            .as("__n_alnum"),
          length(col(textCol)).as("__n_chars")): _*)
    // argmax with ties to the earlier list — same cascade as q_lang_id
    val predicted = langs.init.foldLeft(Option.empty[Column]) { (acc, l) =>
      val later = langs.drop(langs.indexOf(l) + 1)
      val cond = later.map(o => col(s"__s_$l") >= col(s"__s_$o"))
        .reduce(_ && _)
      Some(acc.fold(when(cond, l))(_.when(cond, l)))
    }.get.otherwise(langs.last)
    val quality =
      lit(0.4) * least(col("n_tokens") / 100.0, lit(1.0)) +
      lit(0.3) * (col("__n_alnum").cast("double") / col("__n_chars")) +
      lit(0.3) * least(
        lit(3) * col(s"__s_${langs.head}").cast("double") / col("n_tokens"),
        lit(1.0))
    val dupW = Window.partitionBy(xxhash64(lower(col(textCol))))
    val annotated = scored
      .withColumn("predicted", predicted)
      .withColumn("quality", quality)
      .withColumn("is_canonical", col(docCol) === min(col(docCol)).over(dupW))
    val reason =
      when(!col("is_canonical"), "duplicate")
        .when(col("n_tokens") < minTokens, "too_short")
        .when(col("quality") < minQuality, "low_quality")
        .when(!col("predicted").isin(keepLangs.map(lit): _*), "language")
    annotated
      .withColumn("reject_reason", reason)
      .withColumn("kept", col("reject_reason").isNull)
      .drop(annotated.columns.filter(_.startsWith("__s_")).toSeq ++
        Seq("__n_alnum", "__n_chars"): _*)
  }
}
