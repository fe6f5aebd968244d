package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X118 — unigram-LM tokenizer training (Kudo 2018; the SentencePiece
  * `--model_type=unigram` algorithm), the second tokenizer family
  * next to [[Bpe]]: instead of greedy merges, fit a piece vocabulary
  * by EM over each word's segmentation lattice, then iteratively
  * prune the pieces whose removal costs the least likelihood until
  * the target vocabulary size. Encoding is Viterbi (most probable
  * segmentation), so rare words fall back to shorter pieces and —
  * ultimately — single characters, which are never pruned.
  *
  * Architecture (the [[Bpe.trainMerges]] argument verbatim): the
  * corpus collapses to its WORD-FREQUENCY table in one distributed
  * aggregate — vocabulary-sized, not corpus-sized — and the
  * inherently sequential EM/prune loop runs driver-side over that
  * compacted table (100 TB of text with a 10M-word vocabulary is a
  * 10M-row driver table; the corpus is touched once). `maxVocab`
  * guards the collect loudly, with the same distributed `minCount`
  * pre-filter escape hatch.
  *
  * Determinism: seed selection and pruning order break ties
  * lexicographically on the piece; EM is a fixed number of sweeps in
  * a fixed order — the fitted vocabulary reproduces bit-for-bit
  * across runs. Cross-ENGINE float replay is not claimed for the
  * soft-EM [[train]] (it is doubles); the contract queries run the
  * integer-state [[trainL]]/[[encodeDocsL]] below, whose fit is
  * exact integer arithmetic end to end and carries a full DuckDB
  * hash oracle (r14, the integer-Lloyd precedent applied to EM).
  */
object Unigram {

  /** One vocabulary piece with its fitted natural-log probability. */
  final case class Piece(piece: String, logProb: Double)

  /** Train a unigram-LM vocabulary of (at most) `vocabSize` pieces.
    *
    * @param seedSize  candidate pool size before pruning (multi-char
    *                  substrings ranked by count·len, all chars kept)
    * @param emIters   EM sweeps between prune steps
    * @param shrink    fraction of the vocabulary kept per prune step
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      seedSize: Int = 4096, maxPieceLen: Int = 6, emIters: Int = 2,
      shrink: Double = 0.75, maxVocab: Int = 1000000,
      minCount: Long = 1L): Seq[Piece] = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      s"need 1 <= vocabSize <= seedSize, got $vocabSize/$seedSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val wordCounts = docs
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .filter($"n" >= minCount)
    val rows = wordCounts.limit(maxVocab + 1).as[(String, Long)].collect()
    require(rows.length <= maxVocab,
      s"word vocabulary exceeds maxVocab=$maxVocab — raise the cap, " +
        "or set minCount (>= 2 prunes the Zipf tail distributed-side)")
    trainOnWordTable(rows, vocabSize, seedSize, maxPieceLen, emIters,
      shrink)
  }

  /** The sequential EM/prune loop over an in-memory word table —
    * factored out so specs can drive hand-built tables directly.
    */
  private[operators] def trainOnWordTable(words: Array[(String, Long)],
      vocabSize: Int, seedSize: Int, maxPieceLen: Int, emIters: Int,
      shrink: Double): Seq[Piece] = {
    // ---- seed: all chars (mandatory) + top multi-char substrings by
    // weighted count, ties lexicographic
    val subCounts = mutable.HashMap.empty[String, Long]
    val charSet = mutable.TreeSet.empty[String]
    words.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        charSet += w.substring(i, i + 1)
        var len = 2
        while (len <= maxPieceLen && i + len <= w.length) {
          val s = w.substring(i, i + len)
          subCounts.update(s, subCounts.getOrElse(s, 0L) + n)
          len += 1
        }
        i += 1
      }
    }
    val multi = subCounts.toSeq
      .sortBy { case (s, c) => (-c * s.length, s) }
      .take(math.max(0, seedSize - charSet.size))
      .map(_._1)
    var vocab = (charSet.toSeq ++ multi).distinct.sorted
    // uniform start
    var logP = mutable.HashMap(vocab.map(p =>
      p -> math.log(1.0 / vocab.size)): _*)

    def emSweep(): mutable.HashMap[String, Double] = {
      // forward-backward expected piece counts over each word lattice
      val expected = mutable.HashMap.empty[String, Double]
      words.foreach { case (w, n) =>
        val L = w.length
        if (L > 0) {
          // alpha(i): log-sum of all segmentations of w[0, i)
          val alpha = Array.fill(L + 1)(Double.NegativeInfinity)
          alpha(0) = 0.0
          for (i <- 1 to L; len <- 1 to math.min(maxPieceLen, i)) {
            val p = w.substring(i - len, i)
            logP.get(p).foreach { lp =>
              alpha(i) = logAdd(alpha(i), alpha(i - len) + lp)
            }
          }
          val beta = Array.fill(L + 1)(Double.NegativeInfinity)
          beta(L) = 0.0
          for (i <- (0 until L).reverse;
               len <- 1 to math.min(maxPieceLen, L - i)) {
            val p = w.substring(i, i + len)
            logP.get(p).foreach { lp =>
              beta(i) = logAdd(beta(i), lp + beta(i + len))
            }
          }
          val z = alpha(L)
          if (!z.isNegInfinity) {
            for (i <- 0 until L;
                 len <- 1 to math.min(maxPieceLen, L - i)) {
              val p = w.substring(i, i + len)
              logP.get(p).foreach { lp =>
                val post = math.exp(alpha(i) + lp + beta(i + len) - z)
                if (post > 0)
                  expected.update(p, expected.getOrElse(p, 0.0) + n * post)
              }
            }
          }
        }
      }
      val total = expected.values.sum
      val out = mutable.HashMap.empty[String, Double]
      vocab.foreach { p =>
        val e = expected.getOrElse(p, 0.0)
        // chars keep a floor so every word stays segmentable
        val smoothed = if (p.length == 1) math.max(e, 1e-6) else e
        if (smoothed > 0) out(p) = math.log(smoothed / total)
      }
      out
    }

    // EM + prune rounds until the vocabulary fits
    var done = false
    while (!done) {
      var it = 0
      while (it < emIters) { logP = emSweep(); it += 1 }
      vocab = vocab.filter(logP.contains)
      val multiNow = vocab.filter(_.length > 1)
      val keepMulti = math.max(vocabSize - (vocab.size - multiNow.size),
        0)
      if (multiNow.size <= keepMulti) done = true
      else {
        val target = math.max(keepMulti, (multiNow.size * shrink).toInt)
        // prune lowest-probability multi-char pieces first (the
        // cheap-loss proxy for Kudo's exact loss ranking), ties lex
        val keep = multiNow.sortBy(p => (-logP(p), p)).take(target).toSet
        vocab = vocab.filter(p => p.length == 1 || keep(p))
        if (target == keepMulti) {
          var it2 = 0
          while (it2 < emIters) { logP = emSweep(); it2 += 1 }
          vocab = vocab.filter(logP.contains)
          done = true
        }
      }
    }
    vocab.sorted.map(p => Piece(p, logP(p)))
  }

  private def logAdd(a: Double, b: Double): Double =
    if (a.isNegInfinity) b
    else if (b.isNegInfinity) a
    else { val m = math.max(a, b); m + math.log1p(math.exp(math.min(a, b) - m)) }

  /** Viterbi-segment one word under a fitted vocabulary: most
    * probable segmentation, ties broken toward FEWER pieces then
    * lexicographically earlier first piece (deterministic).
    */
  def encodeWord(word: String, pieces: Map[String, Double],
      maxPieceLen: Int = 6): Seq[String] = {
    val L = word.length
    if (L == 0) return Seq.empty
    val best = Array.fill(L + 1)(Double.NegativeInfinity)
    val bestLen = new Array[Int](L + 1)
    val bestCnt = Array.fill(L + 1)(Int.MaxValue)
    best(0) = 0.0; bestCnt(0) = 0
    for (i <- 1 to L) {
      for (len <- 1 to math.min(maxPieceLen, i)) {
        val p = word.substring(i - len, i)
        pieces.get(p).foreach { lp =>
          val cand = best(i - len) + lp
          val candCnt = bestCnt(i - len) + 1
          val better = cand > best(i) ||
            (cand == best(i) && candCnt < bestCnt(i))
          if (better && !cand.isNegInfinity) {
            best(i) = cand; bestLen(i) = len; bestCnt(i) = candCnt
          }
        }
      }
    }
    require(!best(L).isNegInfinity,
      s"word '$word' not segmentable — vocabulary lost a character?")
    val out = mutable.ArrayBuffer.empty[String]
    var i = L
    while (i > 0) { out += word.substring(i - bestLen(i), i); i -= bestLen(i) }
    out.reverse.toSeq
  }

  // ------------------------------------------------------------------
  // Integer-state variant (r14) — the contract-oracled form.
  //
  // The float-EM `train` above is the faithful Kudo soft-EM reference
  // implementation, but its doubles (logAdd/exp) have no cross-engine
  // replay, so its queries were rows-only. This variant re-expresses
  // the fit in EXACT integer state, following the integer-Lloyd
  // precedent ([[Similarity]] `fitCentersL`): hard-EM (Viterbi
  // training, the max-approximation of Kudo §3.2's E-step), piece
  // probabilities on the Q12 integer grid (p12 = probability·10¹²,
  // M-step by truncated integer division of exact Long counts), and
  // Viterbi scored by an exact FIXED-POINT INTEGER base-2 log
  // ([[ilog2fp]]: msb + 16 fractional bits by repeated squaring —
  // pure shifts/multiplies, no libm anywhere). Every step is
  // order-free integer arithmetic, so the DuckDB oracle replays the
  // ENTIRE fit — seeding, every sweep's Viterbi DP, every prune —
  // as recursive CTEs and hash-matches bit-exactly.
  // ------------------------------------------------------------------

  /** One fitted piece on the integer grid: pQ12 = probability·10¹². */
  final case class PieceL(piece: String, pQ12: Long)

  /** The probability grid: 1.0 == 10¹² (the repo's micro-quant
    * convention squared — sketch/ANN state uses 10⁶; probabilities
    * need the finer grid so a 10⁻⁶-mass piece keeps 6 digits).
    */
  val Q12: Long = 1000000000000L

  /** Exact fixed-point base-2 log of a positive Long: returns
    * `msb(x)·2¹⁶ + frac` where `frac` holds 16 fractional bits
    * computed by the classical repeated-squaring recurrence on a Q30
    * mantissa (normalize x to y ∈ [2³⁰, 2³¹); 16×: y ← y²≫30, emit a
    * 1-bit and halve iff y ≥ 2³¹). Pure integer shifts and
    * multiplies — no floating point, no libm — so ANY engine
    * reproduces it bit-exactly; the DuckDB oracle runs the identical
    * recurrence as a 16-step recursive CTE. Domain: 1 ≤ x < 2⁶². The
    * max error vs true log2 is 2⁻¹⁶ ≈ 1.5e-5 — far below what the
    * prune/Viterbi rankings resolve, and in any case BOTH engines
    * compute the same function, so the fit is exact by construction.
    */
  def ilog2fp(x: Long): Long = {
    require(x >= 1 && x < (1L << 62), s"ilog2fp domain is [1, 2^62): $x")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var y = if (m <= 30) x << (30 - m) else x >> (m - 30)
    var frac = 0L
    var k = 0
    while (k < 16) {
      y = (y * y) >> 30
      if (y >= (1L << 31)) { frac = (frac << 1) | 1L; y >>= 1 }
      else frac <<= 1
      k += 1
    }
    (m.toLong << 16) | frac
  }

  /** log2fp of probability 1.0 on the Q12 grid — the normalizer that
    * turns [[ilog2fp]] of a p12 into a (non-positive) log-prob score.
    */
  val ScoreOne: Long = ilog2fp(Q12)

  /** Piece → integer Viterbi score under a fitted p12 table. */
  def scoresL(pieces: Seq[PieceL]): Map[String, Long] =
    pieces.iterator.map(p => p.piece -> (ilog2fp(p.pQ12) - ScoreOne)).toMap

  /** Integer Viterbi segmentation: maximize the summed integer
    * log2-scores; ties → fewer pieces, then the shortest final piece
    * (scanning lengths ascending with strict improvement — the rule
    * the oracle's `(−score, count, len)` key sort reproduces).
    */
  def viterbiL(word: String, scores: Map[String, Long],
      maxPieceLen: Int = 4): Seq[String] = {
    val L = word.length
    if (L == 0) return Seq.empty
    val best = Array.fill(L + 1)(Long.MinValue)
    val bestLen = new Array[Int](L + 1)
    val bestCnt = Array.fill(L + 1)(Int.MaxValue)
    best(0) = 0L; bestCnt(0) = 0
    var i = 1
    while (i <= L) {
      var len = 1
      val lim = math.min(maxPieceLen, i)
      while (len <= lim) {
        if (best(i - len) != Long.MinValue) {
          scores.get(word.substring(i - len, i)).foreach { s =>
            val cand = best(i - len) + s
            val cnt = bestCnt(i - len) + 1
            if (cand > best(i) || (cand == best(i) && cnt < bestCnt(i))) {
              best(i) = cand; bestLen(i) = len; bestCnt(i) = cnt
            }
          }
        }
        len += 1
      }
      i += 1
    }
    require(best(L) != Long.MinValue,
      s"word '$word' not segmentable — vocabulary lost a character?")
    val out = mutable.ArrayBuffer.empty[String]
    var j = L
    while (j > 0) { out += word.substring(j - bestLen(j), j); j -= bestLen(j) }
    out.reverse.toSeq
  }

  /** Integer-state unigram fit (hard-EM / Viterbi training). Same
    * architecture as [[train]] — ONE distributed word-frequency
    * aggregate, the sequential fit driver-side over that compacted
    * table — but with a FIXED schedule so the oracle unrolls
    * statically: `rounds` rounds of (`emIters` Viterbi sweeps + a
    * geometric prune keeping max(keepMulti, ⌊3m/4⌋) multi-char
    * pieces by (p12 desc, piece asc)), then one final cut to exactly
    * keepMulti, then `emIters` final sweeps. Chars are never pruned
    * and keep a 1-ulp grid floor; a multi-char piece whose M-step
    * probability truncates to 0 drops out (both engines apply the
    * identical rule).
    */
  def trainL(docs: DataFrame, textCol: String, vocabSize: Int,
      seedSize: Int = 256, maxPieceLen: Int = 4, emIters: Int = 1,
      rounds: Int = 4, maxVocab: Int = 1000000,
      minCount: Long = 1L): Seq[PieceL] = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      s"need 1 <= vocabSize <= seedSize, got $vocabSize/$seedSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val wordCounts = docs
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .filter($"n" >= minCount)
    val rows = wordCounts.limit(maxVocab + 1).as[(String, Long)].collect()
    require(rows.length <= maxVocab,
      s"word vocabulary exceeds maxVocab=$maxVocab — raise the cap, " +
        "or set minCount (>= 2 prunes the Zipf tail distributed-side)")
    trainOnWordTableL(rows, vocabSize, seedSize, maxPieceLen, emIters,
      rounds)
  }

  /** The sequential integer fit over an in-memory word table. */
  private[operators] def trainOnWordTableL(words: Array[(String, Long)],
      vocabSize: Int, seedSize: Int, maxPieceLen: Int, emIters: Int,
      rounds: Int): Seq[PieceL] = {
    require(words.nonEmpty, "empty corpus — nothing to fit")
    // the oracle's packed Viterbi key allots 10 bits to the piece
    // count and 6 to the length — enforce the bound loudly on BOTH
    // sides instead of silently corrupting the SQL comparison
    require(maxPieceLen >= 1 && maxPieceLen <= 63,
      s"maxPieceLen=$maxPieceLen outside the oracle key's 6-bit range")
    words.find(_._1.length > 1023).foreach { case (w, _) =>
      throw new IllegalArgumentException(
        s"word of length ${w.length} exceeds the oracle Viterbi key's " +
          "10-bit piece-count range (1023) — pre-split or drop tokens " +
          s"this long: '${w.take(40)}…'")
    }
    // ---- seed: identical to the float trainer (exact integers)
    val subCounts = mutable.HashMap.empty[String, Long]
    val charSet = mutable.TreeSet.empty[String]
    words.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        charSet += w.substring(i, i + 1)
        var len = 2
        while (len <= maxPieceLen && i + len <= w.length) {
          val s = w.substring(i, i + len)
          subCounts.update(s, subCounts.getOrElse(s, 0L) + n)
          len += 1
        }
        i += 1
      }
    }
    val chars = charSet.toIndexedSeq
    var multi: Seq[String] = subCounts.toSeq
      .sortBy { case (s, c) => (-c * s.length, s) }
      .take(math.max(0, seedSize - chars.size))
      .map(_._1)
    val keepMulti = math.max(vocabSize - chars.size, 0)
    val v0 = chars.size + multi.size
    var p12: Map[String, Long] =
      (chars ++ multi).map(p => p -> Q12 / v0).toMap

    def sweep(): Unit = {
      val sc = p12.map { case (p, v) => p -> (ilog2fp(v) - ScoreOne) }
      val counts = mutable.HashMap.empty[String, Long]
      words.foreach { case (w, n) =>
        viterbiL(w, sc, maxPieceLen).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + n)
        }
      }
      val total = counts.valuesIterator.foldLeft(BigInt(0))(_ + _)
      val next = mutable.HashMap.empty[String, Long]
      chars.foreach { p =>
        val q = (BigInt(counts.getOrElse(p, 0L)) * Q12 / total).toLong
        next(p) = math.max(1L, q)
      }
      multi.foreach { p =>
        val q = (BigInt(counts.getOrElse(p, 0L)) * Q12 / total).toLong
        if (q > 0) next(p) = q
      }
      p12 = next.toMap
      multi = multi.filter(next.contains)
    }
    // prune must also drop the pieces from the PROBABILITY TABLE —
    // the next sweep's scores come from p12, and the oracle builds
    // each sweep's scores from the pruned CTE only; a stale p12
    // would let Viterbi keep segmenting with pruned pieces and
    // silently diverge from the SQL replay (caught by the r14
    // review's synthetic-corpus replay: 20/60 rows differed)
    def prune(target: Int): Unit = {
      multi = multi.sortBy(p => (-p12(p), p)).take(target)
      val keep = multi.toSet
      p12 = p12.filter { case (p, _) => p.length == 1 || keep(p) }
    }

    var r = 0
    while (r < rounds) {
      var it = 0
      while (it < emIters) { sweep(); it += 1 }
      prune(math.max(keepMulti, multi.size * 3 / 4))
      r += 1
    }
    prune(keepMulti)
    var it = 0
    while (it < emIters) { sweep(); it += 1 }
    (chars ++ multi).sorted.map(p => PieceL(p, p12(p)))
  }

  /** Corpus-scale integer Viterbi encode — [[encodeDocs]] with the
    * integer score table; identical plan shape (vocabulary in the
    * task closure, zero shuffles, bounded per-executor memo).
    */
  def encodeDocsL(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[PieceL], maxPieceLen: Int = 4): DataFrame = {
    val table = scoresL(pieces)
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    val enc = udf { toks: Seq[String] =>
      val words = if (toks == null) Seq.empty[String] else toks
      val parts = words.map { w =>
        var got = memo.get(w)
        if (got == null) {
          // same packing bound as trainOnWordTableL — the encode
          // oracle replays this Viterbi with the 10-bit-count key,
          // so an over-long token must fail loud on THIS side too
          require(w.length <= 1023,
            s"token of length ${w.length} exceeds the oracle Viterbi " +
              s"key's 10-bit piece-count range (1023): '${w.take(40)}…'")
          got = viterbiL(w, table, maxPieceLen).toArray
          if (memo.size < (1 << 20)) memo.put(w, got)
        }
        got
      }
      (parts.iterator.map(_.length.toLong).sum,
        parts.iterator.map(_.mkString(" ")).mkString(" "))
    }
    docs
      .select(col(idCol), enc(Dedup.tokens(col(textCol))).as("__e"))
      .select(col(idCol), col("__e._1").as("n_pieces"),
        col("__e._2").as("enc_text"))
  }

  /** Corpus-scale Viterbi encode — the [[Bpe.encodeDocs]] shape: the
    * fitted vocabulary rides the task closure, every row encodes
    * independently (no shuffle), a bounded per-executor memo caches
    * distinct-word segmentations. Output: (idCol, n_pieces,
    * enc_text) with pieces space-joined in word order.
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[Piece], maxPieceLen: Int = 6): DataFrame = {
    val table = pieces.map(p => p.piece -> p.logProb).toMap
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    val enc = udf { toks: Seq[String] =>
      val words = if (toks == null) Seq.empty[String] else toks
      val parts = words.map { w =>
        var got = memo.get(w)
        if (got == null) {
          got = encodeWord(w, table, maxPieceLen).toArray
          if (memo.size < (1 << 20)) memo.put(w, got)
        }
        got
      }
      (parts.iterator.map(_.length.toLong).sum,
        parts.iterator.map(_.mkString(" ")).mkString(" "))
    }
    docs
      .select(col(idCol), enc(Dedup.tokens(col(textCol))).as("__e"))
      .select(col(idCol), col("__e._1").as("n_pieces"),
        col("__e._2").as("enc_text"))
  }
}
