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
    * text (so short docs still participate).
    */
  def wordShingles(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array(concat_ws(" ", tokens)))
      .otherwise(transform(
        sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))

  /** Character n-grams of a string (for CJK-ish text where word shingles
    * degenerate): positions 1..len-n+1.
    */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array(text))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** MinHash signature of length `numHashes`: the h-th component is
    * min over shingles of xxhash64(shingle, h). Seeding the 64-bit hash
    * with the component index gives `numHashes` independent-enough hash
    * functions from one primitive (standard MinHash-from-one-hash
    * construction).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { h =>
      array_min(transform(array_distinct(shingles), s => xxhash64(s, lit(h))))
    }: _*)

  /** LSH band keys for a MinHash signature: `numBands` keys, each the
    * xxhash64 of the band's `rowsPerBand` consecutive signature components
    * seeded with the band index (so band 0 and band 1 never collide with
    * each other). Two docs share a band key iff their signatures agree on
    * that whole band — P[share >= 1 band] ~ 1-(1-j^r)^b, the LSH S-curve.
    * xxhash64 over the array slice instead of rolling multiply-add: the
    * latter overflows under Spark 4's default ANSI arithmetic.
    */
  def bandKeys(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      xxhash64(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), b))

  /** Exact Jaccard similarity of two shingle arrays (distinct-element
    * set semantics), rounded to 6 places.
    */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd))
    val union = size(ad) + size(bd) - inter
    round(when(union === 0, lit(0.0))
      .otherwise(inter.cast("double") / union.cast("double")), 6)
  }

  /** 64-bit SimHash of a token array: hash each token to 64 bits; for
    * each bit position sum +1/-1 over tokens; the sign vector packed into
    * a long. Near-duplicates have small Hamming distance.
    */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, bit) => {
        // Scala wrappers for shiftright/shiftleft only take Int amounts;
        // the SQL builtins accept column amounts, so call them directly.
        val vote = aggregate(hashes, lit(0L),
          (a, h) => a + when(call_function("shiftright", h, bit)
            .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        acc.bitwiseOR(when(vote > 0,
          call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L)))
      })
  }

  /** Hamming distance between two 64-bit SimHash values. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash LSH keys: split the 64-bit value into `pieces` equal chunks;
    * docs within Hamming distance < pieces must agree on at least one
    * chunk (pigeonhole), so exact-match bucketing on chunks is a complete
    * candidate generator for distance <= pieces-1.
    */
  def simhashBandKeys(sim: Column, pieces: Int): Column = {
    val width = 64 / pieces
    val mask = (1L << width) - 1
    transform(sequence(lit(0), lit(pieces - 1)), p =>
      call_function("shiftright", sim, p * width).bitwiseAND(lit(mask))
        .bitwiseOR(call_function("shiftleft", p.cast("long") + 1, lit(56))))
  }
}
