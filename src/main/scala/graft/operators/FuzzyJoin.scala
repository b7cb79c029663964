package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H}

/** Edit-distance similarity join (record linkage: corrupted ids,
  * misspelled names, OCR'd titles) without all-pairs comparison.
  *
  * Blocking is the prefix filter of the set-similarity join literature
  * (Chaudhuri/Ganjam/Kaushik SSJoin, Bayardo AllPairs, Xiao ED-Join):
  * `levenshtein(a, b) <= d` implies the distinct q-gram sets overlap in
  * at least `max(|Ga|, |Gb|) - d*q` elements (one edit disturbs at most
  * q grams), and any two sets with that overlap must share one of their
  * `d*q + 1` FIRST grams under a single global total order. Ordering
  * grams by ascending global frequency makes the signature the RAREST
  * grams of each string, so candidate buckets stay small and hot grams
  * (shared prefixes, padding runs) never become join keys.
  */
object FuzzyJoin {

  /** All (left, right) pairs with `levenshtein <= maxDist`, exactly.
    *
    * Plan shape: per-side distinct q-grams are a codegen'd projection;
    * the global gram-frequency table is a map-side-combinable
    * aggregate; signature selection is a per-string top-(d*q+1) (the
    * window partition is ONE string's grams, bounded by its length);
    * candidates join on signature grams only; verification is the
    * codegen'd `levenshtein` built-in behind a cheap length-difference
    * prefilter. Strings with <= d*q distinct grams (shorter than
    * ~q + d*q chars) cannot be prefix-filtered soundly and fall back
    * to a broadcast nested-loop pass — they are a tiny, bounded
    * universe; the honest cost is |short| x |other side|, so keep
    * ultra-short keys out of the join or pre-dedup them exactly.
    *
    * @return (left_id, right_id, dist), distinct pairs
    */
  def edJoin(left: DataFrame, leftId: String, leftKey: String,
      right: DataFrame, rightId: String, rightKey: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0 && q >= 1, "maxDist >= 0, q >= 1")
    val sigSize = maxDist * q + 1

    def side(df: DataFrame, id: String, key: String, pid: String,
        pk: String): DataFrame =
      df.select(col(id).as(pid), col(key).as(pk))
        .where(col(pk).isNotNull)
        .withColumn("g", array_distinct(H.charShingles(col(pk), q)))
        .withColumn("ng", size(col("g")))

    val l = side(left, leftId, leftKey, "left_id", "lk")
    val r = side(right, rightId, rightKey, "right_id", "rk")
    val freq = l.select(explode(col("g")).as("gram"))
      .unionAll(r.select(explode(col("g")).as("gram")))
      .groupBy("gram").agg(count(lit(1)).as("f"))

    def signature(s: DataFrame, id: String, k: String): DataFrame =
      s.where(col("ng") > maxDist * q)
        .select(col(id), col(k), explode(col("g")).as("gram"))
        .join(freq, "gram")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col(id)).orderBy(col("f"), col("gram"))))
        .where(col("rn") <= sigSize)
        .select(col(id), col(k), col("gram"))

    def verified(pairs: DataFrame): DataFrame =
      pairs
        .where(abs(length(col("lk")) - length(col("rk"))) <= maxDist)
        .withColumn("dist",
          levenshtein(col("lk"), col("rk")).cast("long"))
        .where(col("dist") <= maxDist)
        .select(col("left_id"), col("right_id"), col("dist"))

    val longPairs = verified(
      signature(l, "left_id", "lk")
        .join(signature(r, "right_id", "rk"), "gram")
        .select("left_id", "lk", "right_id", "rk").distinct())

    // short-string fallback: either side unfilterable -> nested loop
    // against the WHOLE other side (minus short x short double count)
    val shortL = l.where(col("ng") <= maxDist * q)
    val shortR = r.where(col("ng") <= maxDist * q)
    val shortPairs = verified(
      broadcast(shortL.select("left_id", "lk"))
        .crossJoin(r.select("right_id", "rk"))
        .unionByName(
          l.where(col("ng") > maxDist * q).select("left_id", "lk")
            .crossJoin(broadcast(shortR.select("right_id", "rk")))))

    longPairs.unionByName(shortPairs).distinct()
  }

  /** Jaro-Winkler-ranked record linkage over [[edJoin]]'s sound
    * edit-distance blocking. JW similarity admits no q-gram prefix
    * filter of its own (a high JW score does not bound gram overlap),
    * so the honest scalable shape is the two-stage one every linkage
    * system runs: candidates from a metric WITH a sound filter
    * (levenshtein <= maxDist), then the ranking score the matcher
    * actually wants (JW's prefix-weighted score orders name variants
    * far better than raw edit distance). Key payloads re-enter
    * late, fetched only for candidate ids — the [[edJoin]] pair set,
    * already skew-guarded — never for the full inputs.
    *
    * `jw` is rounded at 6 places (repr-based, the cross-engine
    * rounding convention) and `minJw` filters on the ROUNDED value so
    * both engines agree at the threshold boundary.
    *
    * @return (left_id, right_id, dist, jw) with jw >= minJw
    */
  def jwLinkage(left: DataFrame, leftId: String, leftKey: String,
      right: DataFrame, rightId: String, rightKey: String,
      maxDist: Int, minJw: Double, q: Int = 2): DataFrame = {
    val cands = edJoin(left, leftId, leftKey, right, rightId, rightKey,
      maxDist, q)
    val lk = left.select(col(leftId).as("left_id"),
      col(leftKey).as("__lk"))
    val rk = right.select(col(rightId).as("right_id"),
      col(rightKey).as("__rk"))
    cands.join(lk, "left_id").join(rk, "right_id")
      .withColumn("jw",
        round(graft.functions.TextFunctions.jaroWinkler(
          col("__lk"), col("__rk")), 6))
      .where(col("jw") >= minJw)
      .select(col("left_id"), col("right_id"), col("dist"), col("jw"))
  }
}
