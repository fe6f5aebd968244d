package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016) over a
  * distributed corpus — the step after [[CorpusOps.charPairCounts]]'
  * diagnostic: actually LEARN the merge table a tokenizer would use.
  *
  * Architecture (the standard production shape, as in the HuggingFace
  * trainers): the corpus collapses to its WORD-FREQUENCY table with
  * one distributed aggregate — vocabulary-sized, not corpus-sized —
  * and the inherently sequential merge loop (each merge changes the
  * tokenization the next merge counts) runs driver-side over that
  * compacted table. 100 TB of text with a 10M-word vocabulary is a
  * 10M-row driver table; the corpus itself is touched exactly once.
  * `maxVocab` guards the collect loudly.
  *
  * Merge selection is deterministic: highest weighted pair count,
  * ties by the (left, right) symbol pair lexicographically — so the
  * learned table reproduces bit-for-bit across runs and engines.
  *
  * Words are whitespace tokens tokenized to characters; merges never
  * cross word boundaries (the BPE convention, matching
  * [[CorpusOps.charPairCounts]]).
  */
object Bpe {

  /** One learned merge: rank (0-based), the two symbols joined, and
    * the weighted occurrence count that won the rank.
    */
  final case class Merge(rank: Int, left: String, right: String,
      count: Long)

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge
    * table in rank order (possibly shorter than `numMerges` when the
    * corpus runs out of repeated pairs).
    *
    * `minCount` is the 100 TB escape hatch for `maxVocab`: a
    * multilingual web corpus's word vocabulary (typos, URLs, numbers)
    * can exceed any driver-side cap, but its COUNT distribution is
    * Zipfian — `minCount = 2` alone typically drops the majority of
    * types (hapax legomena) while leaving pair statistics essentially
    * unchanged, and the filter runs distributed BEFORE the collect.
    * This is the standard trainer knob (HuggingFace `min_frequency`);
    * singleton words contribute nothing to any pair that could win a
    * rank in a large corpus, so learned merges are unaffected in
    * practice (exactly unaffected whenever every winning pair's count
    * from sub-threshold words is 0 — the Zipf-tail regime).
    */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1000000, minCount: Long = 1L): Seq[Merge] = {
    require(minCount >= 1, s"need minCount >= 1, got $minCount")
    val spark = docs.sparkSession
    import spark.implicits._
    val wordCounts = docs
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .filter($"n" >= minCount)
    // guard and collect in ONE corpus pass: pulling maxVocab+1 rows
    // bounds driver memory exactly like a separate count would, and
    // an over-cap vocabulary still fails loudly before training
    val rows = wordCounts.limit(maxVocab + 1).as[(String, Long)].collect()
    require(rows.length <= maxVocab,
      s"word vocabulary exceeds maxVocab=$maxVocab — raise the cap, " +
        "or set minCount (>= 2 prunes the Zipf tail distributed-side " +
        "before the collect)")
    val words: Array[(Array[String], Long)] =
      rows.map { case (w, n) => (w.map(_.toString).toArray, n) }
    trainOnWordTable(words, numMerges)
  }

  /** The sequential merge loop over an in-memory word table —
    * factored out so specs can drive hand-built tables directly.
    */
  private[operators] def trainOnWordTable(
      table: Array[(Array[String], Long)], numMerges: Int): Seq[Merge] = {
    var words = table
    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    while (rank < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.toSeq
      val ((l, r), c) = pairCounts.minBy { case ((a, b), n) =>
        (-n, a, b) // count desc, then pair lexicographic — deterministic
      }
      if (c < 2) return merges.toSeq // nothing repeats; stop learning
      merges += Merge(rank, l, r, c)
      val joined = l + r
      words = words.map { case (syms, n) =>
        if (syms.length < 2) (syms, n)
        else {
          val out = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, n)
        }
      }
      rank += 1
    }
    merges.toSeq
  }

  /** Corpus-scale encode — the tokenize-the-corpus step after
    * [[trainMerges]]: apply the learned merge table to every document.
    *
    * Pure scan shape: the merge table rides the task closure
    * (merge-count-sized), every row encodes independently — no
    * shuffle, no join, embarrassingly parallel at any corpus size. A
    * bounded per-executor memo caches distinct-word encodings, so in
    * the common Zipfian corpus each vocabulary word pays the merge
    * scan once per executor, not once per occurrence.
    *
    * Output: (idCol, n_tokens, enc_text) — n_tokens counts BPE
    * symbols after merging, enc_text is every symbol space-joined in
    * word order (null/empty text → 0, "").
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], marker: Option[String] = None): DataFrame = {
    val tableBc = merges.toIndexedSeq
    val mark = marker // stable local so the closure doesn't drag `this`
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    val enc = udf { toks: Seq[String] =>
      val words = if (toks == null) Seq.empty[String] else toks
      val parts = words.map { w =>
        var got = memo.get(w)
        if (got == null) {
          got = encodeWord(w, tableBc).toArray
          // cap the memo at ~1M entries: adversarial unique-word
          // streams must not grow executor memory unboundedly
          if (memo.size < (1 << 20)) memo.put(w, got)
        }
        mark match {
          case Some(m) => got :+ m
          case None => got
        }
      }
      (parts.iterator.map(_.length.toLong).sum,
        parts.iterator.map(_.mkString(" ")).mkString(" "))
    }
    docs
      .select(col(idCol), enc(Dedup.tokens(col(textCol))).as("__e"))
      .select(col(idCol), col("__e._1").as("n_tokens"),
        col("__e._2").as("enc_text"))
  }

  /** X110 — decode a `marker`-terminated BPE stream back to its
    * whitespace-normalized text: merges never produce spaces and the
    * end-of-word marker is always its own symbol (it never enters
    * [[trainMerges]]' alphabet), so decoding is PURE COLUMN MATH —
    * drop the symbol-separator spaces, turn each marker into a word
    * boundary, trim the trailing one. No UDF, no per-row loop; stays
    * inside whole-stage codegen at any corpus size. With
    * [[encodeDocs]](marker = Some(m)) this is the exact inverse of
    * encode on whitespace-normalized text (the Sennrich 2016 `</w>`
    * convention).
    */
  def decodeBpe(encText: org.apache.spark.sql.Column, marker: String)
      : org.apache.spark.sql.Column =
    trim(regexp_replace(
      regexp_replace(encText, " ", ""),
      java.util.regex.Pattern.quote(marker), " "))

  /** X134 — tokenizer vocab-size sweep: corpus tokens-per-word under
    * the FIRST k merges for several k — the diagnostic that picks a
    * merge budget (compression plateaus; the knee is the budget).
    * Trains once at the largest k; each smaller vocabulary is a
    * PREFIX of the merge table (the defining property of BPE — a
    * smaller vocab is literally the same table truncated), so the
    * sweep re-encodes the word table k times driver-side — word-
    * table-sized work, corpus touched once (the X73 architecture).
    */
  def vocabSweep(docs: DataFrame, textCol: String, sizes: Seq[Int],
      maxVocab: Int = 1000000, minCount: Long = 1L): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1), s"bad sizes $sizes")
    val spark = docs.sparkSession
    import spark.implicits._
    val wordCounts = docs
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .filter($"n" >= minCount)
    val rows = wordCounts.limit(maxVocab + 1).as[(String, Long)].collect()
    require(rows.length <= maxVocab,
      s"word vocabulary exceeds maxVocab=$maxVocab")
    val merges = trainOnWordTable(
      rows.map { case (w, n) => (w.map(_.toString).toArray, n) },
      sizes.max)
    val out = sizes.sorted.map { k =>
      val table = merges.take(k)
      var totalTokens = 0L; var totalWords = 0L
      rows.foreach { case (w, n) =>
        totalTokens += n * encodeWord(w, table).length
        totalWords += n
      }
      (k, totalWords, totalTokens,
        math.rint(totalTokens.toDouble / totalWords * 1e6) / 1e6)
    }
    spark.createDataFrame(out)
      .toDF("n_merges", "total_words", "total_tokens", "tokens_per_word")
  }

  /** X121 — WordPiece greedy encode (Wu et al. 2016; the BERT
    * tokenizer's matching rule) over the vocabulary the X73 merges
    * induce: the vocab is every symbol appearing in any corpus
    * word's final BPE split, and each word segments by repeatedly
    * taking the LONGEST vocab piece prefixing the remainder —
    * continuation pieces carry the `##` marker, and a word the greedy
    * walk cannot finish becomes `unk` whole (the BERT [UNK] rule;
    * greedy-longest can dead-end where BPE's merge replay cannot,
    * e.g. vocab {ab, bc} on "abc").
    *
    * Same scan shape as [[encodeDocs]]: vocabulary rides the closure,
    * rows encode independently, memoized per executor. The oracle
    * replays vocab derivation AND the greedy walk (longest-prefix
    * table + recursive position walk) in SQL, so the contract is
    * hash-exact — unusual for a tokenizer family.
    */
  def wordpieceEncodeDocs(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], maxVocab: Int = 1000000,
      unk: String = "[UNK]"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Vocab derivation runs DISTRIBUTED: the merge replay over the
    // distinct-word table happens inside mapPartitions on executors,
    // and the driver collects only per-partition distinct PIECE sets
    // (bounded by the trained vocabulary, not by the word count —
    // the r10 shape collected up to maxVocab raw words and replayed
    // every merge on the driver). The word-count guard rides the
    // same single job.
    val mergesBc = spark.sparkContext.broadcast(merges.toIndexedSeq)
    val partSets = docs
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .distinct().limit(maxVocab + 1).as[String]
      .mapPartitions { it =>
        val pieces = mutable.Set.empty[String]
        var n = 0L
        it.foreach { w => n += 1; pieces ++= encodeWord(w, mergesBc.value) }
        Iterator((n, pieces.toArray))
      }.collect()
    val nWords = partSets.iterator.map(_._1).sum
    require(nWords <= maxVocab,
      s"word vocabulary exceeds maxVocab=$maxVocab")
    val vocab: Set[String] =
      partSets.iterator.flatMap(_._2).toSet
    val maxLen = if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max
    val vb = vocab; val ml = maxLen; val u = unk
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    def greedy(w: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        var len = math.min(ml, w.length - pos)
        var hit: String = null
        while (len >= 1 && hit == null) {
          val cand = w.substring(pos, pos + len)
          if (vb(cand)) hit = cand else len -= 1
        }
        if (hit == null) return Array(u) // dead end -> whole-word UNK
        out += (if (pos == 0) hit else "##" + hit)
        pos += hit.length
      }
      out.toArray
    }
    val enc = udf { toks: Seq[String] =>
      val ws = if (toks == null) Seq.empty[String] else toks
      val parts = ws.map { w =>
        var got = memo.get(w)
        if (got == null) {
          got = greedy(w)
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

  /** Tokenize a word with a learned merge table: start from
    * characters, apply merges in rank order (each exhaustively,
    * left-to-right — the same scan as training, so training's own
    * words round-trip to their trained segmentation).
    */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    merges.foreach { m =>
      if (syms.length >= 2) {
        val out = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == m.left &&
              syms(i + 1) == m.right) {
            out += m.left + m.right; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    syms.toSeq
  }
}
