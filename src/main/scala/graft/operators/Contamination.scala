package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark decontamination and cross-document duplicate-span
  * analysis — the two n-gram-overlap operators every LLM training
  * corpus runs before a model ever sees the data:
  *
  *   - [[flagContaminated]]: which corpus documents leak evaluation
  *     data? (train/test overlap via shared token n-grams — the
  *     standard GPT-3-style 13-gram check, n configurable because
  *     real suites tune it per benchmark)
  *   - [[duplicateSpanCoverage]]: how much of each document is
  *     boilerplate repeated elsewhere in the corpus? (the positional
  *     n-gram approximation of exact substring dedup — spans whose
  *     n-gram occurs in >1 doc)
  *
  * Both are equi-joins on the n-gram term: cost Σ_gram df², never
  * |docs|² — the same inverted-index shape as
  * [[InvertedIndex.tfCosinePairs]], with the same guard advice (a
  * ubiquitous gram is the hot key; production corpora cap gram df or
  * raise n until grams are near-unique — at n ≥ 8 on natural text
  * df collapses to ~1 and the join is effectively linear).
  *
  * n-gram assembly is the lead-window + codegen `concat_ws` pass
  * shared with [[InvertedIndex.termCounts]] (interpreted HOFs are the
  * measured ~5× scan tax); grams join as strings so an external SQL
  * engine reproduces the operator verbatim — swap in
  * `shingle_hash64` for the 8-byte production key (all downstream
  * math is hash-invariant: counts and equi-joins only).
  */
object Contamination {

  /** Positional (non-distinct) token n-grams: one row per gram slot,
    * (docCol, pos, g). Multiplicity and position survive — coverage
    * denominators count SLOTS, not the distinct-gram vocabulary.
    */
  def positionalNgrams(docs: DataFrame, docCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = docs.select(col(docCol),
      posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "t0")))
    val w = Window.partitionBy(col(docCol)).orderBy(col("pos"))
    val withNext = (1 until n).foldLeft(toks) { (df, i) =>
      df.withColumn(s"t$i", lead(col("t0"), i).over(w))
    }
    withNext
      .filter(col(s"t${n - 1}").isNotNull) // drop incomplete tails
      .select(col(docCol), col("pos"),
        concat_ws(Dedup.Sep, (0 until n).map(i => col(s"t$i")): _*).as("g"))
  }

  /** Per-corpus-doc contamination against a benchmark table: the
    * fraction of the doc's DISTINCT n-grams that also occur anywhere
    * in `bench`, and a flag at `minOverlap`. Contaminated docs are
    * dropped (or quarantined) before training so eval numbers stay
    * honest.
    *
    * Output: (docCol, n_grams, n_hit, contamination, flagged),
    * contamination = n_hit / n_grams; docs shorter than n grams have
    * n_grams = 0 and contamination = 0.0 (nothing leakable).
    *
    * Scale shape: the benchmark side collapses to its distinct gram
    * set — thousands of eval documents → a few million grams, far
    * under the broadcast threshold, so the plan is a broadcast LEFT
    * SEMI-shaped probe of the corpus gram stream (AQE picks broadcast
    * from the aggregated size; no corpus shuffle beyond the per-doc
    * count). A benchmark too big to broadcast degrades to a shuffle
    * equi-join on the gram — still Σ df², never quadratic.
    */
  def flagContaminated(corpus: DataFrame, bench: DataFrame,
      docCol: String, textCol: String, n: Int,
      minOverlap: Double): DataFrame = {
    val corpusGrams = positionalNgrams(corpus, docCol, textCol, n)
      .select(col(docCol), col("g")).distinct()
    val benchGrams = positionalNgrams(bench, docCol, textCol, n)
      .select(col("g")).distinct()
      .withColumn("__hit", lit(1))
    val counted = corpusGrams
      .join(benchGrams, Seq("g"), "left")
      .groupBy(col(docCol))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hit"))
    // left join keeps gram-less docs out entirely — reattach them
    // with zero counts so the operator is total over the corpus
    corpus.select(col(docCol)).distinct()
      .join(counted, Seq(docCol), "left")
      .select(col(docCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contamination",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_grams")))
      .withColumn("flagged", col("contamination") >= minOverlap)
  }

  /** Per-doc duplicate-span coverage: the fraction of the doc's gram
    * SLOTS whose n-gram occurs in more than one document — the
    * positional approximation of "how much of this doc is an exact
    * substring of somewhere else" (suffix-array dedup's question,
    * answered with one aggregate and one equi-join instead of a
    * distributed suffix array).
    *
    * Output: (docCol, n_pos, n_dup, coverage) where coverage =
    * n_dup / n_pos; docs shorter than n grams report n_pos = 0,
    * coverage 0.0.
    *
    * The gram document-frequency table — (g, df) with df > 1 — is
    * corpus-wide but tiny relative to the corpus (distinct repeated
    * grams only); the join back to the positional stream is the
    * inverted-index equi-join, map-side combinable on both ends.
    */
  def duplicateSpanCoverage(docs: DataFrame, docCol: String,
      textCol: String, n: Int): DataFrame = {
    val pg = positionalNgrams(docs, docCol, textCol, n)
    val repeated = pg.select(col(docCol), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > 1)
      .select(col("g"), lit(1).as("__dup"))
    val counted = pg
      .join(repeated, Seq("g"), "left")
      .groupBy(col(docCol))
      .agg(count(lit(1)).as("n_pos"), count(col("__dup")).as("n_dup"))
    docs.select(col(docCol)).distinct()
      .join(counted, Seq(docCol), "left")
      .select(col(docCol),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("coverage",
        when(col("n_pos") === 0, lit(0.0))
          .otherwise(col("n_dup").cast("double") / col("n_pos")))
  }
}
