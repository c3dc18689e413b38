package graft.api

/** Pluggable tokenizer seam for the text pipeline (the "words ≠ tokens"
  * gap): every counting/packing/chunking operator defaults to whitespace
  * words — correct for the space-delimited test corpus — but a
  * production training pipeline measures in BPE-token space, so the ops
  * accept a [[Tokenizer]] instead of hardwiring `split(text, ' ')`.
  *
  * The seam is the per-partition factory (the x7 decode pattern):
  * [[Tokenizer.forPartition]] runs once per task, which is where a real
  * implementation amortizes heavyweight setup — building a merge trie
  * from a broadcast vocabulary, loading a JNI/native tokenizer handle —
  * and the returned closure is the per-record hot path. Implementations
  * must be deterministic and driver-serializable.
  */
trait Tokenizer extends Serializable {
  /** Called once per partition; build per-task state here and return the
    * per-record tokenize function. */
  def forPartition(): String => Array[String]
}

/** The default: whitespace words, matching `split(text, ' ')` exactly
  * (so operators keep their pure-column plans when this is in use). */
object WhitespaceTokenizer extends Tokenizer {
  def forPartition(): String => Array[String] =
    text => if (text.isEmpty) Array.empty else text.split(" ", -1)
}

/** Shared byte-pair-encoding primitives: the fuse step used identically
  * by training ([[TextPipeline.trainBpe]] — one corpus-wide fusion per
  * learned merge) and inference ([[BpeTokenizer]] — rank-ordered greedy
  * application per word). One spelling so the two sides cannot drift. */
object Bpe {
  /** One string per Unicode CODE POINT (surrogate-pair safe: an
    * astral-plane character — emoji, rare CJK — is ONE base token, never
    * two invalid UTF-16 halves). Code points are also what SQL engines'
    * length() counts, so cross-engine token-count oracles stay exact on
    * any corpus (the r5 ADVICE hazard). */
  def codePointTokens(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Fuse every left-to-right occurrence of the adjacent pair (a, b). */
  def fuse(toks: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word under a learned merge ranking: repeatedly fuse the
    * LOWEST-rank pair present until none applies (Sennrich et al. 2016
    * inference order). Base tokens are code points. */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var toks: Array[String] = codePointTokens(word)
    var done = toks.length <= 1
    while (!done) {
      val best = toks.zip(toks.tail)
        .flatMap(p => rank.get(p).map(r => (r, p))).minByOption(_._1)
      best match {
        case Some((_, (a, b))) =>
          toks = fuse(toks, a, b)
          done = toks.length <= 1
        case None => done = true
      }
    }
    toks
  }
}

/** Tokenizer applying LEARNED BPE merges (see [[TextPipeline.trainBpe]])
  * in rank order per word — the inference side of real byte-pair
  * encoding, as opposed to [[VocabTokenizer]]'s pinned-vocab shortcut.
  * The per-partition factory builds the rank map once and memoizes
  * word → tokens across records (crawl text repeats words constantly —
  * exactly the amortization the seam exists for). */
final class BpeTokenizer(
    merges: org.apache.spark.broadcast.Broadcast[Seq[(String, String)]])
  extends Tokenizer {
  def forPartition(): String => Array[String] = {
    val rank = merges.value.zipWithIndex.toMap
    // CAPPED memo: crawl partitions have unbounded word cardinality
    // (URLs, hashes, typos) — the hot head amortizes, the long tail
    // must not grow executor memory for the life of the task. Past the
    // cap, cold words are encoded without being remembered.
    val memo = new java.util.HashMap[String, Array[String]]()
    text =>
      if (text.isEmpty) Array.empty
      else text.split(" ", -1).iterator.flatMap { w =>
        var t = memo.get(w)
        if (t == null) {
          t = Bpe.encodeWord(w, rank)
          if (memo.size < BpeTokenizer.MemoCap) memo.put(w, t)
        }
        t
      }.toArray
  }
}

object BpeTokenizer {
  /** Per-task memo bound: 64k entries ≈ a few MB of encoded words —
    * covers any natural-language hot set while keeping executor memory
    * flat on adversarial (high-cardinality) partitions. */
  val MemoCap = 1 << 16
}

/** BPE-ish vocabulary tokenizer with a PINNED vocab: a word in the
  * vocabulary is one token; any other word falls back to its ≤4-CODE-
  * POINT pieces (the "byte-pair" floor; code points, not UTF-16 units,
  * so surrogate pairs never split and the piece count is exactly
  * ceil(codepoints/4) — the same quantity SQL length()/4.0 computes).
  * Deterministic given the vocab, and — because the vocab is data —
  * SQL-oracle-able: DuckDB reproduces the token count as 1 per vocab
  * word plus ceil(length(word)/4.0) per non-vocab word on ANY corpus,
  * including astral-plane text. The vocab ships as a broadcast; the set
  * is dereferenced once per partition in [[forPartition]], not per
  * record. */
final class VocabTokenizer(
    vocab: org.apache.spark.broadcast.Broadcast[Set[String]])
  extends Tokenizer {
  def forPartition(): String => Array[String] = {
    val v = vocab.value
    text =>
      if (text.isEmpty) Array.empty
      else text.split(" ", -1).iterator.flatMap { w =>
        if (v(w)) Iterator.single(w)
        else Bpe.codePointTokens(w).grouped(4).map(_.mkString)
      }.toArray
  }
}
