package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashing/sketching primitives for near-duplicate detection: word
  * shingles, MinHash signatures, LSH band keys, SimHash. All Catalyst
  * built-ins + higher-order functions — no UDFs, so everything stays in
  * whole-stage codegen and distributes trivially.
  */
object HashFunctions {

  /** n-word shingles of a token array: `["a","b","c"], n=2` ->
    * `["a b","b c"]`. Fewer than n tokens -> single shingle of the whole
    * text (so short docs still participate). Native codegen'd expression
    * — the `transform(sequence, slice+concat_ws)` formulation pays an
    * interpreted slice copy + concat per shingle.
    */
  def wordShingles(tokens: Column, n: Int): Column =
    graft.expressions.NativeExpressions.wordShingles(tokens, n)

  /** Character n-grams of a string (for CJK-ish text where word shingles
    * degenerate): positions 1..len-n+1.
    */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array(text))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** MinHash signature of length `numHashes`: the h-th component is
    * min over shingles of a per-component 64-bit hash (one string hash,
    * then numHashes seeded long hashes — the standard MinHash-from-one-
    * hash construction). Duplicate shingles are harmless: min() is
    * duplicate-insensitive.
    *
    * Implemented as a native codegen'd expression
    * ([[graft.expressions.NativeExpressions.MinHashSignature]]): the
    * higher-order-function formulation evaluates every element op
    * interpreted, which dominated the sf0.1 bench (57s for a 5k-doc
    * corpus); the compiled kernel runs the same sketch in milliseconds.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.expressions.NativeExpressions.minhashSignature(shingles, numHashes)

  /** LSH band keys for a MinHash signature: `numBands` keys, each a
    * band-index-seeded xxh64 fold of the band's `rowsPerBand` consecutive
    * signature components (so band 0 and band 1 never collide with each
    * other). Two docs share a band key iff their signatures agree on that
    * whole band — P[share >= 1 band] ~ 1-(1-j^r)^b, the LSH S-curve.
    * Native codegen'd expression: the `transform` + `xxhash64(slice(...))`
    * formulation cost ~100us/row interpreted (9s of the sf0.1 bench).
    */
  def bandKeys(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    graft.expressions.NativeExpressions.minhashBandKeys(signature, numBands,
      rowsPerBand)

  /** Exact Jaccard similarity of two shingle arrays (distinct-element
    * set semantics), rounded to 6 places. Native codegen'd expression —
    * one hash-set pass instead of array_distinct x2 + array_intersect.
    */
  def jaccard(a: Column, b: Column): Column =
    graft.expressions.NativeExpressions.jaccard(a, b)

  /** Membership probe of a string column against a driver-built Bloom
    * filter ([[org.apache.spark.sql.DataFrameStatFunctions.bloomFilter]]
    * output). False positives at the filter's fpp, never false
    * negatives. Native codegen'd expression.
    */
  def bloomMightContain(s: Column,
      bf: org.apache.spark.util.sketch.BloomFilter): Column =
    graft.expressions.NativeExpressions.bloomMightContain(s, bf)

  /** Winnowed passage fingerprints of a token array (MOSS selection,
    * value-set variant): sorted distinct window-min md5_60 shingle
    * hashes. Any shared passage of >= w + n - 1 tokens guarantees a
    * shared fingerprint. Native codegen'd expression; md5-derived, so
    * any SQL engine replays the selection.
    */
  def winnowedFingerprints(tokens: Column, n: Int, w: Int): Column =
    graft.expressions.NativeExpressions.winnowedFingerprints(tokens, n, w)

  /** 60-bit SimHash of a token array: hash each token to 60 bits
    * (md5-derived, [[graft.expressions.Kernels.md5_60]] — reproducible
    * in any md5-equipped SQL engine, so the sketch is oracle-checkable);
    * for each bit position sum +1/-1 over tokens; the sign vector packed
    * into a long. Near-duplicates have small Hamming distance. Native
    * codegen'd expression — the HOF formulation paid interpreted eval on
    * every (token x bit) op, 24s on the sf0.1 corpus.
    */
  def simhash60(tokens: Column): Column =
    graft.expressions.NativeExpressions.simhash60(tokens)

  /** Hamming distance between two SimHash values. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash LSH keys: split the 60-bit value into `pieces` chunks of
    * ceil(60/pieces) bits (ceil so the union covers every bit); docs
    * within Hamming distance < pieces must agree on at least one chunk
    * (pigeonhole), so exact-match bucketing on chunks is a complete
    * candidate generator for distance <= pieces-1.
    */
  def simhashBandKeys(sim: Column, pieces: Int): Column = {
    val width = (60 + pieces - 1) / pieces
    val mask = (1L << width) - 1
    transform(sequence(lit(0), lit(pieces - 1)), p =>
      call_function("shiftright", sim, p * width).bitwiseAND(lit(mask))
        .bitwiseOR(call_function("shiftleft", p.cast("long") + 1, lit(56))))
  }
}
