package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity profiling with a generalization ladder — the privacy
  * gate a training corpus passes before release. A row is k-anonymous
  * under a quasi-identifier (QI) tuple when at least k rows share its
  * tuple; rows in smaller groups are re-identifiable and must be
  * generalized (coarser QI) or suppressed.
  *
  * [[anonymityLadder]] implements the Mondrian-style fixed ladder:
  * QI levels are given most-specific first, and each row settles at
  * the FIRST level whose anonymity set already reaches `k` (the last
  * level is a catch-all — rows that fail even there report it with
  * their sub-k set size, for the caller to suppress).
  *
  * Scale shape: one skinny count aggregation per ladder level (the
  * group tables are QI-cardinality-sized, orders of magnitude smaller
  * than the corpus), broadcast-joined back onto the rows — the wide
  * document rows are never shuffled, so the profile is a pure
  * scan+broadcast pass at any corpus size. This mirrors how the
  * redaction pass (X22) stays scan-local.
  */
object Privacy {

  /** Per-row (levelCols... , level, k): `level` = index into `levels`
    * where the row first reached `k` anonymity (or `levels.size - 1`
    * if it never did), `k` = the anonymity set size at that level.
    * `keyCols` are carried through for identification.
    */
  def anonymityLadder(df: DataFrame, keyCols: Seq[String],
      levels: Seq[Seq[Column]], k: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one QI level")
    require(k >= 1, s"k=$k must be >= 1")
    val spark = df.sparkSession

    // materialize each level's QI columns once so group keys and the
    // join-back keys are byte-identical expressions
    val qiNames = levels.zipWithIndex.map { case (cols, li) =>
      cols.indices.map(ci => s"__qi_${li}_$ci")
    }
    val withQi = df.select(
      keyCols.map(col) ++
        levels.zip(qiNames).flatMap { case (cols, names) =>
          cols.zip(names).map { case (c, n) => c.as(n) }
        }: _*)

    // one skinny agg per level, broadcast back (group tables are
    // QI-sized; the row table never moves)
    val counted = levels.indices.foldLeft(withQi) { case (acc, li) =>
      val names = qiNames(li)
      val groups = withQi.groupBy(names.map(col): _*)
        .agg(count(lit(1)).as(s"__k_$li"))
      acc.join(broadcast(groups), names, "left")
    }

    val levelExpr = levels.indices
      .foldRight(lit(levels.size - 1): Column) { case (li, rest) =>
        when(col(s"__k_$li") >= k, lit(li)).otherwise(rest)
      }
    val kExpr = levels.indices
      .foldRight(col(s"__k_${levels.size - 1}"): Column) { case (li, rest) =>
        when(col(s"__k_$li") >= k, col(s"__k_$li")).otherwise(rest)
      }
    counted.select(
      keyCols.map(col) :+ levelExpr.as("level") :+ kExpr.as("k"): _*)
  }

  /** X114 — l-diversity profile (Machanavajjhala et al. 2007), the
    * companion gate to [[anonymityLadder]]: k-anonymity bounds
    * re-identification but a k-sized class whose SENSITIVE attribute
    * is constant still leaks it (the homogeneity attack); a class is
    * distinct-l-diverse when its sensitive column takes ≥ l values.
    * Reports, per QI equivalence class: size, distinct-l, the
    * entropy-l (exp of the sensitive distribution's entropy — the
    * paper's stricter form, ≤ distinct-l, sensitive to skew), and
    * the distinct-l ≥ l verdict.
    *
    * Entropy uses the integer nano-log convention (quantizedLogFit):
    * H = lnq(n)/1e9 − (Σ c·lnq(c))/(n·1e9) from exact integer sums,
    * so per-class values replay bit-for-bit cross-engine.
    *
    * Scale shape: one (QI, value) count agg (map-side combined) and
    * one per-class agg over it — both QI-cardinality-sized; rows
    * never shuffle wide.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitive: Column,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty && l >= 1, s"need QI cols and l >= 1, got $l")
    def lnq(v: Column): Column =
      round(log(v.cast("double")) * 1e9, 0).cast("long")
    val perValue = df.groupBy(
        (qiCols.map(col) :+ sensitive.as("__s")): _*)
      .agg(count(lit(1)).as("__c"))
    perValue.groupBy(qiCols.map(col): _*)
      .agg(sum(col("__c")).as("n_rows"),
        count(lit(1)).as("distinct_l"),
        sum(col("__c") * lnq(col("__c"))).as("__slc"))
      .select(qiCols.map(col) ++ Seq(
        col("n_rows"), col("distinct_l"),
        round(exp(lnq(col("n_rows")) / 1e9 -
          col("__slc").cast("double") / (col("n_rows") * 1e9)), 6)
          .as("entropy_l"),
        (col("distinct_l") >= l).as("meets_l")): _*)
  }

  /** X228 — t-closeness (Li et al. 2007) per quasi-identifier class
    * over an ORDERED sensitive attribute: the Earth Mover's Distance
    * between the class's sensitive-value distribution and the global
    * one, EMD = Σᵢ|Σ_{j≤i}(p_j − q_j)|/(m−1) over the m global value
    * levels — the third rung of the privacy ladder after
    * [[anonymityLadder]] (class SIZE) and [[lDiversity]] (value
    * VARIETY): a class can be large and varied yet still leak if its
    * distribution skews far from background (all-high-salary bucket),
    * which only the distance test catches.
    *
    * Exactness: the cumulative difference is kept as the integer
    * cross-product cumC·N − cumG·n_class (decimal(38,0) — exact out
    * to ~10¹⁸·10¹⁸ row products is overkill headroom for any class),
    * divided once at the end; every class ranges over ALL m global
    * levels (class-level zero cells included via the class×level
    * frame), so the per-class window is m-bounded, never row-bounded.
    * Classes × levels rows shuffle; raw rows never do. m = 1 reports
    * EMD 0 (a single global level cannot skew).
    */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitive: Column,
      t: Double): DataFrame = {
    require(qiCols.nonEmpty && t > 0, s"need QI cols and t > 0, got $t")
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy((qiCols.map(col) :+ sensitive.as("__s")): _*)
      .agg(count(lit(1)).as("__c"))
    val global = cells.groupBy(col("__s"))
      .agg(sum(col("__c")).as("__g"))
    val nTot = global.agg(sum(col("__g")).as("__nn"))
    val classes = cells.groupBy(qiCols.map(col): _*)
      .agg(sum(col("__c")).as("n_rows"))
    val mLev = global.agg(count(lit(1)).as("__m"))
    // every class × every global level (zero cells materialized)
    val frame = classes.crossJoin(broadcast(global))
      .join(cells.withColumnRenamed("__c", "__cc"),
        qiCols :+ "__s", "left")
      .withColumn("__cc", coalesce(col("__cc"), lit(0L)))
    val w = Window.partitionBy(qiCols.map(col): _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = frame
      .withColumn("__cumC", sum(col("__cc")).over(w))
      .withColumn("__cumG", sum(col("__g")).over(w))
      .crossJoin(broadcast(nTot))
      .withColumn("__num",
        abs(col("__cumC").cast("decimal(38,0)") * col("__nn") -
          col("__cumG").cast("decimal(38,0)") * col("n_rows")))
      .groupBy((qiCols.map(col) :+ col("n_rows")): _*)
      .agg(sum(col("__num")).as("__sn"))
    scored.crossJoin(broadcast(mLev)).crossJoin(broadcast(nTot))
      .select(qiCols.map(col) ++ Seq(
        col("n_rows").cast("long").as("n_rows"),
        when(col("__m") > 1L,
          round(col("__sn").cast("double") /
            (col("n_rows").cast("double") * col("__nn").cast("double") *
              (col("__m") - 1L).cast("double")), 6))
          .otherwise(lit(0.0)).as("emd"),
        (when(col("__m") > 1L,
          col("__sn").cast("double") /
            (col("n_rows").cast("double") * col("__nn").cast("double") *
              (col("__m") - 1L).cast("double")))
          .otherwise(lit(0.0)) <= t).as("meets_t")): _*)
  }

  /** X173 — deterministic pseudonymization: replace identifier
    * columns with salted md5 tokens — REFERENTIALLY STABLE (the same
    * id maps to the same token in every table, every run, every
    * engine: joins keep working across the pseudonymized release)
    * and one-way for consumers without the salt. The release-prep
    * step beside [[anonymityLadder]] (which measures) and
    * [[graft.functions.Redact]] (which scrubs free text).
    *
    * Not encryption: a salt holder can re-identify by brute-forcing
    * the id space — rotate salts per release and keep them out of
    * the release, which is the standard pseudonymization contract.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String],
      salt: String): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(salt.nonEmpty, "empty salt defeats the purpose")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        md5(concat(lit(salt), lit(":"), col(c).cast("string"))))
    }
  }

  /** X174 — Laplace-calibrated noisy counts (scale Δ/ε, Δ=1 for
    * counting queries): per-category counts released with additive
    * noise drawn by inverse-CDF from an md5-derived uniform —
    * REPRODUCIBLE noise (same salt → same release, engine-
    * replayable), calibrated exactly as ε-DP Laplace would be.
    * Honest caveat, documented loudly: a DETERMINISTIC seed means
    * repeated releases with the same salt reveal nothing new but
    * also add no fresh randomness — rotate the salt per release to
    * get the fresh-draw semantics the ε budget accounting assumes.
    *
    * u = (md5Band + 0.5)/2³² ∈ (0,1); noise = −(1/ε)·sgn(u−½)·
    * ln(1−2|u−½|). Counts are exact ints; the noise is one fixed-
    * shape double expression; round(6).
    */
  def noisyCounts(df: DataFrame, categoryCol: String, epsilon: Double,
      salt: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val counts = df.groupBy(col(categoryCol).cast("string").as("category"))
      .agg(count(lit(1)).as("__n"))
    val u = (CorpusOps.md5Band(col("category"), salt).cast("double") +
      0.5) / 4294967296.0
    val centered = u - 0.5
    val noise = -(lit(1.0) / epsilon) *
      signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
    counts.select(col("category"),
      round(col("__n") + noise, 6).as("noisy_count"))
  }

  /** X211 — randomized response with frequency debiasing: each row
    * keeps its true category with probability p and otherwise
    * reports a uniform category (Warner's mechanism — per-row
    * plausible deniability, ε = ln(1 + k·p/(1−p))), then the
    * collector UNBIASES the observed counts with
    * t̂_c = (obs_c − n(1−p)/k) / p. Both the coin and the
    * replacement draw are md5-derived from (salt, id) — the same
    * deterministic-seed caveat as [[noisyCounts]]: replayable in any
    * engine, rotate salts when fresh draws matter.
    *
    * Output per category: (category, true_count, observed_count,
    * est_count) — est_count ≈ true_count is the demonstrable
    * round-trip. Category index space is the SORTED distinct
    * category list (value-bounded, broadcast).
    */
  def rrDebias(df: DataFrame, idCol: String, categoryCol: String,
      p: Double, salt: String): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    import org.apache.spark.sql.expressions.Window
    val pMicro = math.round(p * 1e6)
    val base = df.select(col(idCol).cast("string").as("__id"),
      col(categoryCol).cast("string").as("__cat"))
    val cats = base.select(col("__cat")).distinct()
      .withColumn("__idx",
        row_number().over(Window.orderBy(col("__cat"))).cast("long")
          - 1L)
    val k = cats.agg(count(lit(1)).cast("long").as("__k"))
    val coin = pmod(CorpusOps.md5Band(col("__id"), salt + "keep:")
      .cast("long"), lit(1000000L))
    val repl = CorpusOps.md5Band(col("__id"), salt + "repl:")
      .cast("long")
    val perturbed = base.crossJoin(broadcast(k))
      .withColumn("__keep", coin < pMicro)
      .withColumn("__ridx", pmod(repl, col("__k")))
      .join(broadcast(cats.select(col("__idx").as("__ridx"),
        col("__cat").as("__rcat"))), Seq("__ridx"))
      .select(col("__cat"),
        when(col("__keep"), col("__cat")).otherwise(col("__rcat"))
          .as("__obs"))
    val trueC = perturbed.groupBy(col("__cat").as("category"))
      .agg(count(lit(1)).as("true_count"))
    val obsC = perturbed.groupBy(col("__obs").as("category"))
      .agg(count(lit(1)).as("observed_count"))
    val n = base.agg(count(lit(1)).cast("long").as("__n"))
    trueC.join(obsC, Seq("category"), "full_outer")
      .crossJoin(broadcast(n)).crossJoin(broadcast(k))
      .select(col("category"),
        coalesce(col("true_count"), lit(0L)).cast("long")
          .as("true_count"),
        coalesce(col("observed_count"), lit(0L)).cast("long")
          .as("observed_count"),
        round((coalesce(col("observed_count"), lit(0L))
          .cast("double") -
          col("__n").cast("double") * (1.0 - p) /
            col("__k").cast("double")) / p, 6).as("est_count"))
  }

  /** X350 — Luhn-validated numeric PII scan: candidate card-number
    * runs (13–19 digits) checked against the Luhn mod-10 checksum —
    * the validation step that separates actual payment-card numbers
    * from order ids, timestamps and phone digits, cutting the X22
    * redactor's false-positive rate on digit-heavy corpora (every
    * real card number passes Luhn; a random digit run passes 10% of
    * the time).
    *
    * Scale shape: pure per-row expression — regexp candidate
    * extraction plus an in-row fold per candidate (double every
    * second digit from the RIGHT, subtract 9 above 9, sum mod 10) —
    * rides the scan, no UDF, no shuffle. Output: per doc, candidate
    * count and Luhn-valid count.
    */
  def luhnScan(docs: DataFrame, docCol: String, textCol: String)
      : DataFrame = {
    val cands = regexp_extract_all(col(textCol),
      lit("[0-9]{13,19}"), lit(0))
    // coalesce the ARRAY (not its size): under legacy sizeOfNull
    // size(NULL) is -1, so a NULL doc would report n_candidates=-1
    val d = docs.select(col(docCol),
      coalesce(cands, array()).as("__cands"))
    // r15: fold over the reversed char array with an index lambda —
    // the old form called substring(c, length(c)−i+1, 1) per digit
    // (three times on the doubled branch), a per-call UTF8String
    // walk; reverse+split extracts each digit once. Same digits,
    // same parity (1-based from the right), same integer sum.
    val validCount = expr(
      """size(filter(__cands, c ->
           aggregate(transform(split(reverse(c), ''), (ch, i0) ->
             if((i0 + 1) % 2 = 0,
               if((ascii(ch) - 48) * 2 > 9,
                  (ascii(ch) - 48) * 2 - 9,
                  (ascii(ch) - 48) * 2),
               ascii(ch) - 48)),
             0, (acc, x) -> acc + x)
           % 10 = 0))""")
    d.select(col(docCol),
      // size(coalesce(..)) not coalesce(size(..)): under
      // spark.sql.legacy.sizeOfNull=true size(null) is -1, which the
      // outer coalesce would pass through silently
      size(coalesce(col("__cands"), array())).cast("long")
        .as("n_candidates"),
      coalesce(validCount, lit(0)).cast("long").as("n_luhn_valid"))
  }

  /** X384 — multi-category PII scan: per-doc counts of email,
    * NANP-dashed phone, IPv4, and SSN-shaped substrings — the
    * breadth companion to [[luhnScan]]'s depth (Luhn validates ONE
    * category; release gates need the panel). Patterns stick to
    * char classes + bounded quantifiers, the regex subset Java and
    * RE2 engines agree on exactly, so the counts hash-match any
    * oracle. Pure per-row `regexp_extract_all` counts in the scan
    * stage — codegen, no shuffle; arrays coalesced before size()
    * (the legacy sizeOfNull convention).
    */
  def piiScan(docs: DataFrame, docCol: String, textCol: String)
      : DataFrame = {
    def cnt(pat: String) =
      size(coalesce(regexp_extract_all(col(textCol), lit(pat), lit(0)),
        array())).cast("long")
    val d = docs.select(col(docCol),
      cnt("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
        .as("n_emails"),
      cnt("[0-9]{3}-[0-9]{3}-[0-9]{4}").as("n_phones"),
      cnt("([0-9]{1,3}\\.){3}[0-9]{1,3}").as("n_ipv4"),
      cnt("[0-9]{3}-[0-9]{2}-[0-9]{4}").as("n_ssn"))
    d.select(col(docCol), col("n_emails"), col("n_phones"),
      col("n_ipv4"), col("n_ssn"),
      (col("n_emails") + col("n_phones") + col("n_ipv4") +
        col("n_ssn")).as("n_pii"),
      (col("n_emails") + col("n_phones") + col("n_ipv4") +
        col("n_ssn") > 0L).as("has_pii"))
  }
}
