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
  * across runs. (Cross-ENGINE float replay is not claimed — EM is
  * doubles — so the contract queries are rows-only with the
  * guarantees spec-asserted, like the ANN family.)
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
