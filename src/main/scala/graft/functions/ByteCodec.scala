package graft.functions

/** GPT-2 byte-level pre-tokenizer codec (the published
  * `bytes_to_unicode` mapping from openai/gpt-2 `encoder.py`, also
  * used by RoBERTa/GPT-NeoX/Llama BPE vocabularies): every one of the
  * 256 byte values maps to a single printable unicode char —
  * printable latin bytes keep themselves, the 68 others (controls,
  * space, DEL, a latin-1 gap) shift to 256+n in first-seen order —
  * so ANY byte string round-trips through a char-level tokenizer with
  * no `[UNK]` and no lossy normalization. This is the byte-fallback
  * layer under the X73/X121 tokenizers: with it, vocabulary coverage
  * is 100% by construction and X63's OOV rate measures MERGE quality
  * only.
  */
object ByteCodec {

  /** byte value (0..255) → mapped code point, per bytes_to_unicode. */
  private val byteToChar: Array[Char] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++
      ('®' to 'ÿ')).map(_.toInt).toSet
    val out = new Array[Char](256)
    var shift = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
      b += 1
    }
    out
  }

  private val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** Total byte values that do NOT keep their own code point (68). */
  val ShiftedCount: Int = byteToChar.zipWithIndex
    .count { case (c, b) => c.toInt != b }

  /** UTF-8 bytes → one mapped char per byte. */
  def encode(s: String): String = {
    val bytes = s.getBytes("UTF-8")
    val out = new StringBuilder(bytes.length)
    bytes.foreach(b => out += byteToChar(b & 0xFF))
    out.result()
  }

  /** Exact inverse of [[encode]]; throws on chars outside the map. */
  def decode(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      bytes(i) = charToByte.getOrElse(s.charAt(i),
        throw new IllegalArgumentException(
          s"char U+${s.charAt(i).toInt.toHexString} not in byte map"))
      i += 1
    }
    new String(bytes, "UTF-8")
  }

  /** How many of the string's UTF-8 bytes shift (don't keep their own
    * code point) — the byte-fallback pressure a char-level vocab sees.
    */
  def shiftedBytes(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    var n = 0L
    bytes.foreach { b =>
      val v = b & 0xFF
      if (byteToChar(v).toInt != v) n += 1
    }
    n
  }
}
