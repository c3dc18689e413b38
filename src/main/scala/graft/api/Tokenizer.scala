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

/** BPE-ish vocabulary tokenizer with a PINNED vocab: a word in the
  * vocabulary is one token; any other word falls back to its ≤4-char
  * pieces (the "byte-pair" floor). Deterministic given the vocab, and —
  * because the vocab is data — SQL-oracle-able: DuckDB reproduces the
  * token count as 1 per vocab word plus ceil(len/4) per non-vocab word.
  * The vocab ships as a broadcast; the set is dereferenced once per
  * partition in [[forPartition]], not per record. */
final class VocabTokenizer(
    vocab: org.apache.spark.broadcast.Broadcast[Set[String]])
  extends Tokenizer {
  def forPartition(): String => Array[String] = {
    val v = vocab.value
    text =>
      if (text.isEmpty) Array.empty
      else text.split(" ", -1).iterator.flatMap { w =>
        if (v(w)) Iterator.single(w) else w.grouped(4)
      }.toArray
  }
}
