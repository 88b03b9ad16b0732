package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE tokenizer surface (round-2 verdict ask #3 / SURVEY §7.6 #3): every
  * operator family that segments document text — dedup, text analytics,
  * curation — builds its tokens through these Column builders, so the
  * segmentation rule cannot drift between families as tokenizations
  * multiply. The base rule is single-space whitespace splitting, exactly
  * mirroring the DuckDB oracle twins' `string_split(text, ' ')`.
  *
  * All builders are pure Column expressions (codegen'd, shuffle-free,
  * per-row) — tokenization cost stays inside whole-stage codegen at any
  * scale.
  */
object Tokenize {

  /** Whitespace tokens, in document order — the base segmentation. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count (length estimator used by quality gates). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct tokens, sorted ascending — the set form the sorted-merge
    * set-similarity expressions rely on.
    */
  def tokenSet(text: Column): Column = sort_array(array_distinct(tokens(text)))

  /** Distinct members of an already-tokenized array as sorted xxhash64
    * longs: set-similarity counts compare longs, not strings — ~10×
    * cheaper per element, with per-pair collision probability ~1e-15
    * (immaterial to counts).
    */
  def hashedSetOf(toks: Column): Column =
    sort_array(transform(array_distinct(toks), t => xxhash64(t)))

  /** Distinct tokens as sorted xxhash64 longs (see hashedSetOf). */
  def hashedTokenSet(text: Column): Column = hashedSetOf(tokens(text))

  /** Adjacent-token bigram shingles of a toks array, in order
    * (order-sensitive — catches near-dups that bag-of-words misses).
    * Single-token docs get an empty list: sequence(0, -1) would yield the
    * DESCENDING [0, -1] (out-of-range → [null]), so the size guard matches
    * the DuckDB twins' range(len - 1).
    */
  def bigramShingles(toks: Column): Column =
    transform(
      when(size(toks) >= 2, sequence(lit(0), size(toks) - 2))
        .otherwise(array().cast("array<int>")),
      i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2)))

  /** Distinct bigram shingles as sorted xxhash64 longs — the near-dup
    * comparison unit for the shingle-LSH family.
    */
  def hashedShingleSet(toks: Column): Column = hashedSetOf(bigramShingles(toks))

  /** Adjacent-token n-gram shingles (space-joined, in document order) for
    * any fixed n ≥ 1 — the generalization of bigramShingles used by the
    * decontamination / boilerplate operators (they key on longer grams,
    * where chance collisions are rare). Same guard: docs shorter than n
    * tokens yield an empty list, matching the DuckDB twins'
    * `range(greatest(len - (n-1), 0))`.
    */
  def ngramShingles(toks: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    transform(
      when(size(toks) >= n, sequence(lit(0), size(toks) - n))
        .otherwise(array().cast("array<int>")),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** xxhash64 of every adjacent n-token window, in document order — the
    * native one-pass twin of `transform(ngramShingles(toks, n), g ->
    * xxhash64(g))` (bit-identical per element, NativeFoldsSpec; the HOF
    * chain is interpreted and builds every window string before hashing).
    * The gram-count detectors (repetition / boilerplate / decontam) and
    * the 20-token window grain aggregate on these hashes; a 64-bit
    * collision folding two distinct grams is ~pairs/2⁶⁵ (the
    * q_text_substring_dedup counts-per-hash precedent).
    */
  def windowHashes(toks: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    call_function(GraftFunctions.WindowHashesName, toks, lit(n))
  }
}
