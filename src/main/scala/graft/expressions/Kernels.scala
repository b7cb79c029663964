package graft.expressions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight compiled inner loops for the sketching expressions. The
  * generated code of each [[NativeExpressions]] expression is a single
  * static call into one of these — the loop runs as JIT-compiled Scala
  * instead of per-element interpreted Catalyst higher-order-function
  * eval (measured ~1000x per-element cost difference on the sf0.1
  * documents corpus).
  *
  * All hashing routes through Catalyst's XXH64 so distribution quality
  * matches the built-in `xxhash64` function family.
  */
object Kernels {

  private final val Seed = 42L

  private def hashString(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)

  private val md5Digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = md5Digest.get()
    d.reset()
    d.digest(bytes)
  }

  /** First 60 bits of md5(bytes): the value of the digest's first 15 hex
    * characters, always non-negative. The cross-engine hash — DuckDB (and
    * any ANSI engine with md5) reproduces it as
    * `('0x' || substr(md5(s), 1, 15))::BIGINT`, which is what makes the
    * sketches built on it oracle-checkable end to end.
    */
  def md5_60(bytes: Array[Byte]): Long = {
    val h = md5(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4 // drop the 16th hex char's low nibble
  }

  /** Lowercase 32-char hex of md5(bytes) — DuckDB's `md5(s)` output. */
  def md5Hex(bytes: Array[Byte]): String = {
    val h = md5(bytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) {
      val b = h(i) & 0xff
      sb.append(Character.forDigit(b >>> 4, 16))
      sb.append(Character.forDigit(b & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** n-word shingles of a token array: sliding windows of n tokens
    * joined by a single space; fewer than n tokens -> one shingle of the
    * whole text (so short docs still participate). Null tokens are
    * skipped within a window, matching concat_ws semantics.
    */
  def wordShingles(tokens: ArrayData, n: Int): ArrayData = {
    val total = tokens.numElements()
    val sep = UTF8String.fromString(" ")
    def window(start: Int, len: Int): UTF8String = {
      val parts = new Array[UTF8String](len)
      var i = 0
      while (i < len) {
        parts(i) =
          if (tokens.isNullAt(start + i)) null
          else tokens.getUTF8String(start + i)
        i += 1
      }
      UTF8String.concatWs(sep, parts: _*)
    }
    if (total < n) new GenericArrayData(Array[Any](window(0, total)))
    else {
      val out = new Array[Any](total - n + 1)
      var s = 0
      while (s <= total - n) { out(s) = window(s, n); s += 1 }
      new GenericArrayData(out)
    }
  }

  /** MinHash signature: component h = min over shingles of
    * hash_h(shingle), with hash_h derived as xxh64(xxh64(bytes), seed=h)
    * — one string hash + numHashes long hashes per shingle.
    * Duplicate shingles are harmless (min is idempotent).
    */
  def minhashSignature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = hashString(shingles.getUTF8String(i))
        var h = 0
        while (h < numHashes) {
          val v = XXH64.hashLong(base, h)
          if (v < sig(h)) sig(h) = v
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** LSH band keys over a MinHash signature: key b = fold of the band's
    * `rowsPerBand` consecutive components through xxh64, seeded with the
    * band index (so different bands never collide). Equal band segments
    * <=> equal keys, the property LSH needs.
    */
  def minhashBandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int)
      : ArrayData = {
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var i = 0
      while (i < rowsPerBand) {
        h = XXH64.hashLong(sig.getLong(b * rowsPerBand + i), h)
        i += 1
      }
      keys(b) = h
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** 60-bit SimHash over tokens: per-bit +1/-1 votes of each token's
    * 60-bit md5 hash ([[md5_60]]), sign vector packed into a long. 60
    * bits (not 64) so both the per-token hash and every band-key shift
    * stay inside signed-BIGINT range in SQL engines, making the whole
    * sketch DuckDB-oracle-checkable.
    */
  def simhash60(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5_60(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Exact Jaccard of two string arrays under distinct-set semantics;
    * 0.0 when the union is empty. Rounded to 6 places to match the
    * `round(j, 6)` convention of the column API.
    */
  def jaccardStrings(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (!a.isNullAt(i)) sa.add(a.getUTF8String(i)); i += 1
    }
    val sb = new java.util.HashSet[UTF8String]()
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (!b.isNullAt(i)) sb.add(b.getUTF8String(i)); i += 1
    }
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0
    // HALF_UP to 6 places (value is non-negative): matches Spark's and
    // DuckDB's round(); math.rint would round half-even and diverge on
    // exactly-representable midpoints like 81/128.
    else math.floor(inter.toDouble / union * 1e6 + 0.5) / 1e6
  }

  /** Cosine similarity of two double arrays in ONE pass, summing
    * left-to-right (bit-compatible with the zip_with/aggregate column
    * formulation and the DuckDB oracle); 0.0 when either norm is 0.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Symmetric int8 quantization of a double vector: per-vector scale
    * max|x|/127, `code_i = floor(x_i/scale + 0.5)` clamped to
    * [-127, 127] (floor(+0.5) = HALF_UP, the formula the oracle
    * replicates verbatim); an all-zero vector quantizes to all zeros.
    * Cosine is scale-invariant, so the codes alone rank — the scale is
    * deliberately NOT carried.
    */
  def quantizeI8(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i)); if (a > mx) mx = a; i += 1
    }
    val out = new Array[Byte](n)
    if (mx > 0.0) {
      val s = mx / 127.0
      i = 0
      while (i < n) {
        var c = math.floor(v.getDouble(i) / s + 0.5).toInt
        if (c > 127) c = 127
        if (c < -127) c = -127
        out(i) = c.toByte
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Cosine over int8 code arrays. Integer dot/norm accumulation is
    * EXACT (no FP ordering sensitivity at any scale: |sum| <= dim*127^2),
    * so engines agree bit-for-bit however they order the sum.
    */
  def cosineI8(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toLong
      val y = b.getByte(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Sign-LSH band keys: the planes are grouped into `bands` bands of
    * planes.length/bands; each key packs the sign bit of v·plane per
    * in-band plane, tagged with (band+1)<<56 so bands never collide.
    * Same key layout as the column-API formulation it replaces.
    */
  def signLshBandKeys(v: ArrayData, planes: Array[Array[Double]],
      bands: Int): ArrayData = {
    val perBand = planes.length / bands
    val dim = v.numElements()
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bits = 0L
      var p = 0
      while (p < perBand) {
        val plane = planes(b * perBand + p)
        val n = math.min(dim, plane.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v.getDouble(i) * plane(i); i += 1 }
        if (dot >= 0.0) bits |= (1L << p)
        p += 1
      }
      keys(b) = bits | ((b + 1).toLong << 56)
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Winnowed passage fingerprints (the MOSS selection of Schleimer,
    * Wilkerson & Aiken, SIGMOD 2003 — value-set variant): md5_60 of
    * every n-word shingle, then the DISTINCT set of per-window minima
    * over each window of `w` consecutive shingle hashes (documents
    * with fewer than `w` shingles contribute their single overall
    * min). Guarantee: any passage of >= w + n - 1 shared tokens
    * between two documents selects at least one shared fingerprint;
    * expected density is ~2/(w+1) of shingles. The value-set variant
    * (distinct minima, no positional tie rule) is what makes the
    * selection reproducible in ANSI SQL: `min(h) OVER (ORDER BY pos
    * ROWS w-1 FOLLOWING)` on full windows + DISTINCT. Returned sorted
    * ascending. One O(m) monotonic-deque pass per document.
    */
  def winnowedFingerprints(tokens: ArrayData, n: Int, w: Int)
      : ArrayData = {
    val sh = wordShingles(tokens, n)
    val m = sh.numElements()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = md5_60(sh.getUTF8String(i).getBytes)
      i += 1
    }
    val effW = math.min(w, m)
    val sel = new java.util.TreeSet[java.lang.Long]()
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - effW) head += 1
      if (i >= effW - 1) sel.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** Jaro-Winkler similarity — the classic record-linkage score
    * (match window max(|a|,|b|)/2 - 1, half-transposition count,
    * prefix boost p=0.1 up to 4 chars past jaro > 0.7). Semantics
    * replicate DuckDB's `jaro_winkler_similarity` EXACTLY (verified
    * over 20k randomized pairs, zero double-precision mismatches),
    * including its empty-string convention: either side empty — even
    * both — scores 0.0, not 1.0. Operates on UTF-16 code units, while
    * DuckDB compares raw UTF-8 BYTES — the two views coincide ONLY on
    * ASCII. Any non-ASCII text diverges, BMP included: an accented
    * Latin or CJK character is one code unit here but 2-3 bytes to
    * DuckDB, shifting its match window and counts (ADVICE r15; the
    * old note blamed only supplementary-plane text). Cross-engine JW
    * gates must therefore keep their keys ASCII, or normalize to
    * ASCII first — the current oracle gates use ASCII c_name keys.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString; val s2 = b.toString
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(i + md + 1, l2)
      var j = math.max(0, i - md)
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxP && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Bloom membership probe on the utf8 bytes — the same bytes
    * `Dataset.stat.bloomFilter` hashed when it put the string in, so
    * probe and build agree without materializing a java.lang.String
    * per row.
    */
  def bloomMightContain(bf: org.apache.spark.util.sketch.BloomFilter,
      s: UTF8String): Boolean =
    bf.mightContainBinary(s.getBytes)

  /** Greedy BPE segmentation of a token array under a caller-supplied
    * ranked merge table (the public byte-pair-encoding apply
    * algorithm, Sennrich et al. ACL'16): per word, symbols start as
    * Unicode code points; each step merges the LEFTMOST occurrence of
    * the minimum-rank adjacent pair and repeats until no pair is in
    * the table. One merge per step (not all occurrences at once) —
    * the contract an external SQL oracle replays exactly as a
    * recursive CTE. Keys are `left + "\u0001" + right`; null tokens
    * are skipped; output is the concatenation of every word's final
    * symbols in word order.
    */
  def bpeSegment(tokens: ArrayData,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    val n = tokens.numElements()
    var w = 0
    while (w < n) {
      if (!tokens.isNullAt(w)) {
        val word = tokens.getUTF8String(w).toString
        val syms = new scala.collection.mutable.ArrayBuffer[String]
        var i = 0
        while (i < word.length) {
          val cc = Character.charCount(word.codePointAt(i))
          syms += word.substring(i, i + cc)
          i += cc
        }
        var done = syms.length < 2
        while (!done) {
          var bestRank = Int.MaxValue
          var bestI = -1
          var j = 0
          while (j < syms.length - 1) {
            val r = ranks.get(syms(j) + "\u0001" + syms(j + 1))
            // strict <: ties keep the leftmost occurrence
            if (r != null && r.intValue() < bestRank) {
              bestRank = r.intValue(); bestI = j
            }
            j += 1
          }
          if (bestI < 0) done = true
          else {
            syms(bestI) = syms(bestI) + syms(bestI + 1)
            syms.remove(bestI + 1)
            done = syms.length < 2
          }
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}
