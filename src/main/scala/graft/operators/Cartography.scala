package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X233 — dataset cartography (Swayamdipta et al. 2020, "Dataset
  * Cartography: Mapping and Diagnosing Datasets with Training
  * Dynamics"): per training example, the MEAN of its score across
  * runs/epochs (confidence) and the SPREAD (variability), which
  * together map the dataset into regions — easy-to-learn (high
  * confidence, low variability: safe but low-signal), hard-to-learn
  * (low confidence, low variability: likely mislabeled or genuinely
  * hard — the data-QA goldmine), and ambiguous (high variability:
  * the examples that most improve generalization when kept). The
  * selection signal a 100 TB curation pass runs AFTER a pilot
  * training job logs per-example scores.
  *
  * Determinism: scores quantize to micro-units (the welchTTest
  * convention — exact for ≤6-dp inputs); confidence and the
  * POPULATION variance come from exact integer (n, Σs, Σs²) per
  * example, so the region label is decided on engine-exact doubles
  * against caller-fixed thresholds (no data-dependent split — a
  * quantile split would make every label depend on every row).
  * Scale shape: one map-side-combined groupBy on the example key;
  * output is example-bounded. Single-run examples report variability
  * 0 and classify by confidence alone.
  */
object Cartography {

  /** Per-example training-dynamics map: n_runs, confidence (mean
    * score), variability (population std of the score), and the
    * region label at (`confSplit`, `varSplit`).
    */
  def dataMap(df: DataFrame, exampleCol: String, scoreCol: Column,
      confSplit: Double = 0.5, varSplit: Double = 0.15): DataFrame = {
    require(varSplit > 0, s"bad varSplit $varSplit")
    val d = round(scoreCol * 1e6, 0).cast("decimal(19,0)")
    val g = df.groupBy(col(exampleCol))
      .agg(count(lit(1)).cast("long").as("n_runs"),
        sum(d).as("__s"), sum(d * d).as("__ss"))
    val n = col("n_runs").cast("double")
    val mean = col("__s").cast("double") / n
    // population variance in micro^2: ss/n - mean^2 (exact inputs)
    val varM = col("__ss").cast("double") / n - mean * mean
    val conf = mean / 1e6
    // max(0, .) absorbs the tiny negative residue double subtraction
    // can leave on constant scores
    val vari = sqrt(greatest(varM, lit(0.0))) / 1e6
    g.select(col(exampleCol), col("n_runs"),
      round(conf, 6).as("confidence"),
      round(vari, 6).as("variability"),
      when(vari >= varSplit, "ambiguous")
        .when(conf >= confSplit, "easy_to_learn")
        .otherwise("hard_to_learn").as("region"))
  }
}
