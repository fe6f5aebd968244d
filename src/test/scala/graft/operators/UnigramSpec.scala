package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** X118 unigram-LM tokenizer: EM fitting, pruning, Viterbi encode. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = docs(
    (1L, "abab abab ababab cd cd"),
    (2L, "abab cdcd abab xy"),
    (3L, "ababab abab cd"))

  test("train: frequent substrings survive pruning with high probability") {
    val vocab = Unigram.train(corpus, "text", vocabSize = 12,
      seedSize = 64, maxPieceLen = 4)
    val m = vocab.map(p => p.piece -> p.logProb).toMap
    // every character is present (never pruned)
    Seq("a", "b", "c", "d", "x", "y").foreach(c =>
      assert(m.contains(c), s"char $c pruned"))
    // the dominant repeated unit is in the vocabulary and beats its
    // characters: P(ab) > P(a), P(b) after EM mass concentrates
    assert(m.contains("ab"), s"vocab: ${vocab.map(_.piece)}")
    assert(m("ab") > m("a") && m("ab") > m("b"))
    // vocabulary respects the size budget (chars are mandatory)
    assert(vocab.size <= 12)
    // log-probs normalize to <= 1 total mass (smoothing floors aside)
    assert(vocab.map(p => math.exp(p.logProb)).sum <= 1.0 + 1e-6)
  }

  test("train: deterministic across runs and repartitionings") {
    val a = Unigram.train(corpus, "text", vocabSize = 10, seedSize = 64,
      maxPieceLen = 4)
    val b = Unigram.train(
      docs((1L, "abab abab ababab cd cd"), (2L, "abab cdcd abab xy"),
        (3L, "ababab abab cd")).repartition(5),
      "text", vocabSize = 10, seedSize = 64, maxPieceLen = 4)
    assert(a == b)
  }

  test("encodeWord: Viterbi segments concatenate back to the word " +
    "and prefer frequent long pieces") {
    val vocab = Unigram.train(corpus, "text", vocabSize = 12,
      seedSize = 64, maxPieceLen = 4)
    val table = vocab.map(p => p.piece -> p.logProb).toMap
    Seq("abab", "ababab", "cd", "xy", "cdcd").foreach { w =>
      val segs = Unigram.encodeWord(w, table, maxPieceLen = 4)
      assert(segs.mkString("") == w, s"round trip of $w: $segs")
      assert(segs.forall(table.contains))
    }
    // compression: "ababab" segments into < 6 pieces given "ab"
    assert(Unigram.encodeWord("ababab", table, 4).length < 6)
  }

  test("encodeWord: unseen word falls back to characters") {
    val vocab = Unigram.train(corpus, "text", vocabSize = 12,
      seedSize = 64, maxPieceLen = 4)
    val table = vocab.map(p => p.piece -> p.logProb).toMap
    // "xyxy" never appears as a substring pair; chars x,y exist
    val segs = Unigram.encodeWord("yx", table, 4)
    assert(segs == Seq("y", "x"))
  }

  test("encodeDocs: per-doc counts and text; empty doc -> (0, '')") {
    val s = spark
    import s.implicits._
    val vocab = Unigram.train(corpus, "text", vocabSize = 12,
      seedSize = 64, maxPieceLen = 4)
    val d = docs((1L, "abab cd"), (2L, ""))
    val out = Unigram.encodeDocs(d, "doc_id", "text", vocab, 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val enc = out(1L).getAs[String]("enc_text")
    assert(enc.split(" ").mkString("") == "ababcd")
    assert(out(1L).getAs[Long]("n_pieces") == enc.split(" ").length.toLong)
    assert(out(2L).getAs[Long]("n_pieces") == 0L)
    assert(out(2L).getAs[String]("enc_text") == "")
  }

  // ---- integer-state variant (r14, the contract-oracled form) ----

  test("ilog2fp: exact at powers of two, monotone, within 2^-16 of log2") {
    // 2^m -> mantissa 1.0 -> all fractional bits 0
    (0 to 39).foreach(m =>
      assert(Unigram.ilog2fp(1L << m) == (m.toLong << 16)))
    val xs = Seq(1L, 2L, 3L, 7L, 100L, 976562500L, 21578676344L,
      999999999999L, Unigram.Q12)
    // non-decreasing (the 16-bit grid merges values closer than 2^-16:
    // 999999999999 and 10^12 share a fixed-point log)
    xs.sliding(2).foreach { case Seq(a, b) =>
      assert(Unigram.ilog2fp(a) <= Unigram.ilog2fp(b))
    }
    xs.foreach { x =>
      val got = Unigram.ilog2fp(x).toDouble / 65536.0
      val want = math.log(x.toDouble) / math.log(2.0)
      // truncating fixed point: always <= true log2, within one ulp
      // of the 16-bit grid (plus mantissa truncation)
      assert(got <= want + 1e-9 && want - got < 3e-4, s"x=$x $got vs $want")
    }
  }

  test("trainL: integer grid, char completeness, budget, concentration") {
    val vocab = Unigram.trainL(corpus, "text", vocabSize = 12,
      seedSize = 64, maxPieceLen = 4, emIters = 1, rounds = 4)
    val m = vocab.map(p => p.piece -> p.pQ12).toMap
    Seq("a", "b", "c", "d", "x", "y").foreach(c =>
      assert(m.contains(c), s"char $c pruned"))
    assert(vocab.size <= 12)
    // probabilities live on the Q12 grid and total at most 1 + floors
    assert(vocab.forall(p => p.pQ12 >= 1 && p.pQ12 <= Unigram.Q12))
    assert(vocab.map(p => BigInt(p.pQ12)).sum <=
      BigInt(Unigram.Q12) + vocab.size)
    // hard-EM concentrates mass on the dominant repeated unit
    assert(m.contains("ab"), s"vocab: ${vocab.map(_.piece)}")
    assert(m("ab") > m("c") && m("ab") > m("d"))
  }

  test("trainL: pruned pieces never leak into later sweeps (the r14 " +
    "stale-p12 regression) — golden fit on a prune-heavy table") {
    // Deterministic word table (base-6 digits of i·2654435761 mod 6^L,
    // L = 3 + i%6, count i%9+1, deduped by word keeping the first) —
    // 150 distinct words over a 6-char alphabet force REAL geometric
    // prunes (survivors >> keepMulti = 14). The expected vocabulary
    // below was computed by the ORACLE-SEMANTICS mirror that was
    // validated bit-equal to the DuckDB CTE replay on this class of
    // corpus; under the pre-fix stale-p12 semantics (prune shrinking
    // `multi` but not the probability table the next sweep scores
    // from) ALL 20 rows differ, so this golden fails on a revert.
    val words = {
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      (0 until 150).foreach { i =>
        val len = 3 + i % 6
        var x = (i.toLong * 2654435761L) % math.pow(6, len).toLong
        val sb = new StringBuilder
        (0 until len).foreach { _ =>
          sb += ('a' + (x % 6).toInt).toChar; x /= 6
        }
        val w = sb.toString
        if (!seen.contains(w)) seen(w) = (i % 9 + 1).toLong
      }
      seen.toArray
    }
    assert(words.length == 150)
    val vocab = Unigram.trainOnWordTableL(words, vocabSize = 20,
      seedSize = 128, maxPieceLen = 4, emIters = 1, rounds = 4)
    val expected = Seq(
      ("a", 122259136212L), ("ab", 20598006644L), ("b", 53156146179L),
      ("ba", 41860465116L), ("bc", 18936877076L), ("bd", 22259136212L),
      ("be", 30564784053L), ("bf", 37541528239L), ("c", 145182724252L),
      ("cd", 47840531561L), ("ce", 21594684385L), ("d", 102325581395L),
      ("df", 17607973421L), ("e", 48837209302L), ("ea", 25913621262L),
      ("eb", 21262458471L), ("ee", 29235880398L), ("ef", 29568106312L),
      ("f", 136544850498L), ("fd", 26910299003L))
      .map { case (p, q) => Unigram.PieceL(p, q) }
    assert(vocab == expected)
    // determinism under the same table
    assert(Unigram.trainOnWordTableL(words, 20, 128, 4, 1, 4) == vocab)
  }

  test("trainL: deterministic across runs and repartitionings") {
    val a = Unigram.trainL(corpus, "text", vocabSize = 10, seedSize = 64,
      maxPieceLen = 4)
    val b = Unigram.trainL(
      docs((1L, "abab abab ababab cd cd"), (2L, "abab cdcd abab xy"),
        (3L, "ababab abab cd")).repartition(5),
      "text", vocabSize = 10, seedSize = 64, maxPieceLen = 4)
    assert(a == b)
  }

  test("viterbiL: round trip, char fallback, fewer-pieces tie rule") {
    val vocab = Unigram.trainL(corpus, "text", vocabSize = 12,
      seedSize = 64, maxPieceLen = 4)
    val table = Unigram.scoresL(vocab)
    Seq("abab", "ababab", "cd", "xy", "cdcd", "yx").foreach { w =>
      val segs = Unigram.viterbiL(w, table, 4)
      assert(segs.mkString("") == w, s"round trip of $w: $segs")
      assert(segs.forall(table.contains))
    }
    assert(Unigram.viterbiL("yx", table, 4) == Seq("y", "x"))
    assert(Unigram.viterbiL("ababab", table, 4).length < 6)
    // equal-score candidates resolve to the FEWER-pieces path: with
    // uniform scores over {aa, a}, "aaaa" must be 2 pieces, not 4
    val uni = Map("a" -> -100L, "aa" -> -200L)
    assert(Unigram.viterbiL("aaaa", uni, 4) == Seq("aa", "aa"))
  }

  test("encodeDocsL: per-doc counts and text; empty doc -> (0, '')") {
    val s = spark
    import s.implicits._
    val vocab = Unigram.trainL(corpus, "text", vocabSize = 12,
      seedSize = 64, maxPieceLen = 4)
    val d = docs((1L, "abab cd"), (2L, ""))
    val out = Unigram.encodeDocsL(d, "doc_id", "text", vocab, 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val enc = out(1L).getAs[String]("enc_text")
    assert(enc.split(" ").mkString("") == "ababcd")
    assert(out(1L).getAs[Long]("n_pieces") == enc.split(" ").length.toLong)
    assert(out(2L).getAs[Long]("n_pieces") == 0L)
    assert(out(2L).getAs[String]("enc_text") == "")
  }
}
