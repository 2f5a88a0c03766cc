package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the chunking / dedup / text-analysis
  * operators. Pure `functions._` compositions — everything here stays inside
  * whole-stage codegen (no UDFs), so these run at scan speed and parallelize
  * with the partitioning of the input.
  *
  * Chunking semantics mirror the reference's `splitChunks`
  * (reference: src/indexer.ts:201-215): fixed `size`-char windows advanced by
  * `stride = max(1, size - overlap)`; the final chunk may be shorter; a chunk
  * starts at every offset `i*stride < length(text)`.
  */
object Text {

  /** Number of chunks for a text of length `len`: ceil(len / stride), 0 for
    * empty text. Expressed as floor((len-1)/stride)+1 to stay in integer math.
    */
  def chunkCount(text: Column, size: Int, overlap: Int): Column = {
    val stride = math.max(1, size - overlap)
    when(length(text) <= 0, lit(0))
      .otherwise(floor((length(text) - 1) / stride) + 1)
      .cast("int")
  }

  /** Array of chunk substrings (1-based substring, clamped at end-of-string,
    * same as the reference's `text.slice(i, i+size)`).
    */
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    val stride = math.max(1, size - overlap)
    // sequence(0, -1) would count backwards, so guard empty text explicitly
    when(length(text) <= 0, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0), chunkCount(text, size, overlap) - 1),
        i => substring(text, (i * stride + 1).cast("int"), lit(size))))
  }

  /** Whitespace tokenization; drops empty tokens (leading/trailing spaces). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Deterministic multiplicative-hash bucket of an id column — ONE
    * definition for every doc_id-keyed sampler/split (F4 stratified, F6
    * mixture, F8 Gumbel, D8 train split, D9 candidate sample):
    * `(id · 2654435761) mod m`, computed in EXACT modular arithmetic as
    * `((id mod m) · (2654435761 mod m)) mod m` so the product can never
    * overflow a Long. Spark 4's ANSI mode THROWS on 64-bit overflow
    * rather than wrapping — the r13 whole-suite 10× receipt caught every
    * multiplicative sampler failing at rep-shifted ids ≈ 4×10¹⁰, i.e.
    * exactly the id range a real 100 TB corpus uses. The congruence keeps
    * every value identical to the plain-product form wherever that form
    * did not overflow, so all sf0.01 oracle hashes are unchanged; pmod
    * keeps the bucket non-negative for any id sign.
    */
  def mixBucket(id: Column, m: Long): Column =
    pmod(pmod(id, lit(m)) * lit(2654435761L % m), lit(m))

  /** CHAR offsets of each code-point boundary in `word` (length n+1 for n
    * code points, last entry = word.length) — the surrogate-pair-aware
    * splitter both learned tokenizers share: a piece/symbol is
    * `word.substring(offs(i), offs(j))`, so per-code-point iteration never
    * mangles astral-plane text and never allocates intermediate arrays.
    */
  def codePointOffsets(word: String): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < word.length) {
      out += i
      i += Character.charCount(word.codePointAt(i))
    }
    out += word.length
    out.toArray
  }

  /** CJK codepoint ranges — ONE definition shared by language ID (which
    * scores the scripts separately) and token counting (which uses the
    * union), so the two can never disagree about what counts as CJK.
    * RE2-portable (the DuckDB oracles carry the \x{....} spelling of the
    * same ranges).
    */
  val HanRange = "\\u4e00-\\u9fff"
  val KanaRange = "\\u3040-\\u30ff"
  val HangulRange = "\\uac00-\\ud7af"
  val CjkClass = s"[$HanRange$KanaRange$HangulRange]"

  /** Count of codepoints matching a character class, via one codegen'd
    * regexp_replace (length minus length-with-class-removed).
    */
  def codepointCount(text: Column, cls: String): Column =
    (length(text) - length(regexp_replace(text, cls, ""))).cast("long")

  /** Overlapping codepoint BIGRAMS within each CJK run — the subtoken unit
    * for scripts written without spaces (a character unigram is too coarse
    * for repetition/quality signals; a bigram is the standard CJK indexing
    * unit). "今天天气" → [今天, 天天, 天气]. Pure Column algebra (regexp run
    * extraction + per-run substr windows), so it stays codegen'd; the
    * DuckDB oracles reproduce it with list_transform(range(...), substr).
    */
  def cjkBigrams(text: Column): Column = {
    val runs = regexp_extract_all(text, lit(s"$CjkClass+"), lit(0))
    flatten(transform(runs, r =>
      when(length(r) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(r) - 1),
          i => r.substr(i.cast("int"), lit(2))))))
  }

  /** BPE-ish subtoken extraction: alpha runs and digit runs (portable regex —
    * identical semantics under Java regex and DuckDB's RE2), plus CJK
    * codepoint bigrams so spaceless scripts yield real subtoken streams
    * instead of zero matches.
    */
  def subtokens(text: Column): Column =
    concat(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+"), lit(0)),
      cjkBigrams(text))

  /** Word k-grams ("shingles") over the whitespace tokens, joined by a space.
    * Returns an array of n-k+1 strings (empty array when fewer than k tokens).
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
  }

  /** Deterministic polynomial token hash in [0, 1e9+7): folds
    * `h = (h*31 + len(t)*131 + ascii(t)) mod p` over the token stream.
    * Stays within Long range (p*31 + small << 2^63), and is expressible
    * verbatim in DuckDB SQL — the oracle-parity hash for fingerprints and
    * minhash shingle codes.
    */
  val FpMod = 1000000007L
  def fingerprint(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (h, t) => (h * 31L + length(t).cast("long") * 131L + ascii(t)) % FpMod)

  /** Per-shingle polynomial code (same recurrence over the characters of one
    * string — used as the numeric shingle id for minhash).
    */
  def stringCode(s: Column): Column =
    aggregate(
      split(s, ""),
      lit(0L),
      (h, ch) => (h * 31L + ascii(ch)) % FpMod)
}
