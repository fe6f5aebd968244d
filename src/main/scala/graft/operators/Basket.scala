package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X225 — market-basket association rules (pairwise Apriori): which
  * items co-occur in the same basket beyond chance. The data-mixing
  * analog for a training pipeline: baskets are orders/sessions/
  * documents, items are parts/events/tags, and the lift table is the
  * "users who bought A also bought B" / "docs tagged A also tag B"
  * readout that drives negative-sampling and co-occurrence features
  * (complements X139's windowed PMI, which reads POSITIONAL
  * co-occurrence inside a token stream; this reads SET co-occurrence
  * inside an unordered basket).
  *
  * Reference behavior: Agrawal & Srikant's Apriori restricted to
  * 2-itemsets — support(A,B) = baskets containing both / all
  * baskets, confidence(A→B) = support(A,B)/support(A), lift =
  * support(A,B)/(support(A)·support(B)).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - basket/item pairs dedupe first (SET semantics — a basket
  *    holding A twice counts once), one exact groupBy;
  *  - the APRIORI PRUNE runs before any pair is formed: an item
  *    below `minSupport` baskets cannot appear in a frequent pair,
  *    so the (basket, item) stream is semi-joined against the
  *    frequent-item table (item-vocabulary-bounded) first — on a
  *    Zipfian catalog this removes most of the long tail before the
  *    quadratic step;
  *  - pair generation is a self-equi-join ON THE BASKET KEY with
  *    itemA < itemB, so the blow-up is Σ_b s_b(s_b−1)/2 over
  *    per-basket FREQUENT-item counts s_b — bounded by basket size,
  *    never by catalog size; a pathological mega-basket is the one
  *    skew risk, capped by `maxBasketItems` (baskets above the cap
  *    are excluded from pair generation — but still count in every
  *    support denominator, spec-asserted; the default 1000 bounds
  *    per-basket work at ~half a million pairs).
  *
  * Determinism: every count is an exact integer; support/confidence/
  * lift are fixed-shape doubles, round(6).
  */
object Basket {

  /** Pairwise association rules over (basketCol, itemCol) rows.
    * Emits one row per unordered frequent pair (item_a < item_b):
    * exact basket counts, support, both confidences, and lift,
    * for pairs co-occurring in ≥ `minSupport` baskets.
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasketItems: Int = 1000): DataFrame = {
    require(minSupport >= 1, s"bad minSupport $minSupport")
    require(maxBasketItems >= 2, s"bad maxBasketItems $maxBasketItems")
    val items = df.select(col(basketCol).as("__b"),
      col(itemCol).as("__i")).distinct()
    val supp = items.groupBy(col("__i"))
      .agg(count(lit(1)).cast("long").as("__supp"))
    val freq = supp.filter(col("__supp") >= minSupport)
    // total baskets BEFORE any pruning — supports/lifts are relative
    // to the full universe, not the frequent-item subset
    val nBaskets = items.agg(
      countDistinct(col("__b")).cast("long").as("__n"))
    val kept = items.join(freq, Seq("__i"), "left_semi")
    val sized = kept.groupBy(col("__b"))
      .agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketItems)
    val bounded = kept.join(sized.select(col("__b")), Seq("__b"),
      "left_semi")
    val pairs = bounded.as("x").join(bounded.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .agg(count(lit(1)).cast("long").as("pair_count"))
      .filter(col("pair_count") >= minSupport)
    val sa = supp.select(col("__i").as("item_a"),
      col("__supp").as("supp_a"))
    val sb = supp.select(col("__i").as("item_b"),
      col("__supp").as("supp_b"))
    val nd = col("__n").cast("double")
    pairs.join(sa, Seq("item_a")).join(sb, Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("pair_count"),
        col("supp_a"), col("supp_b"),
        round(col("pair_count") / nd, 6).as("support"),
        round(col("pair_count").cast("double") / col("supp_a"), 6)
          .as("conf_a_b"),
        round(col("pair_count").cast("double") / col("supp_b"), 6)
          .as("conf_b_a"),
        round(col("pair_count") * nd /
          (col("supp_a").cast("double") * col("supp_b")), 6)
          .as("lift"))
  }
}
