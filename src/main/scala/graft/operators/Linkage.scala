package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X154 — Fellegi-Sunter probabilistic record-linkage scoring: given
  * candidate pairs (from any blocking family — the X133
  * sorted-neighborhood walk, X127 deletion keys, or a plain blocked
  * equi-join) with BOOLEAN per-field agreement columns, score each
  * pair with the classic log-likelihood match weight
  *
  *   w = Σ_f  agree_f ? log₂(m_f/u_f) : log₂((1−m_f)/(1−u_f))
  *
  * where m_f = P(field agrees | true match) and u_f = P(field agrees
  * | non-match), then band into match / possible / nonmatch by the
  * upper/lower thresholds (the review-queue triage of every entity-
  * resolution pipeline).
  *
  * Determinism: the weight is a FIXED-SHAPE expression — per-field
  * ln(x)/ln(2) terms added in declaration order, no data-ordered
  * summation — so both engines produce bit-identical doubles;
  * round(6). Scale shape: pure per-row arithmetic over the candidate
  * table; cost lives in the upstream blocking, which is the point of
  * the Fellegi-Sunter decomposition.
  */
object Linkage {

  /** `fields`: (agreementColumn, m, u) with 0 < u, m < 1. */
  def score(pairs: DataFrame, fields: Seq[(String, Double, Double)],
      upper: Double, lower: Double): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    require(upper >= lower, s"upper $upper < lower $lower")
    fields.foreach { case (f, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1,
        s"field $f: m/u must be in (0,1), got m=$m u=$u")
    }
    val ln2 = lit(math.log(2.0))
    val w = fields.map { case (f, m, u) =>
      when(col(f), lit(math.log(m / u)) / ln2)
        .otherwise(lit(math.log((1 - m) / (1 - u))) / ln2)
    }.reduce(_ + _)
    pairs.withColumn("score", round(w, 6))
      .withColumn("decision",
        when(col("score") >= upper, "match")
          .when(col("score") <= lower, "nonmatch")
          .otherwise("possible"))
  }
}
