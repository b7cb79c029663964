package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native sketch expressions.
  *
  * Two registration paths with one shared function table:
  *  - `spark.sql.extensions=graft.expressions.GraftExtensions` at
  *    session build time (the SparkSessionExtensions route);
  *  - [[GraftExtensions.register]] on a live session (tests, notebooks).
  *
  * After either, `SELECT minhash_signature(shingles, 32)` etc. work in
  * plain SQL, so the operators compose with `spark.sql` pipelines, not
  * only the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be an integer literal, got $other")
  }

  /** (name, info, builder) for every native expression. */
  val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("word_shingles",
      new ExpressionInfo(classOf[NativeExpressions.WordShingles].getName,
        "word_shingles"),
      (args: Seq[Expression]) => NativeExpressions.WordShingles(args(0),
        intArg(args(1), "n", "word_shingles"))),
    ("minhash_signature",
      new ExpressionInfo(classOf[NativeExpressions.MinHashSignature].getName,
        "minhash_signature"),
      (args: Seq[Expression]) => NativeExpressions.MinHashSignature(args(0),
        intArg(args(1), "numHashes", "minhash_signature"))),
    ("minhash_band_keys",
      new ExpressionInfo(classOf[NativeExpressions.MinHashBandKeys].getName,
        "minhash_band_keys"),
      (args: Seq[Expression]) => NativeExpressions.MinHashBandKeys(args(0),
        intArg(args(1), "bands", "minhash_band_keys"),
        intArg(args(2), "rowsPerBand", "minhash_band_keys"))),
    ("simhash60",
      new ExpressionInfo(classOf[NativeExpressions.SimHash60].getName,
        "simhash60"),
      (args: Seq[Expression]) => NativeExpressions.SimHash60(args(0))),
    ("winnow_fingerprints",
      new ExpressionInfo(
        classOf[NativeExpressions.WinnowedFingerprints].getName,
        "winnow_fingerprints"),
      (args: Seq[Expression]) => NativeExpressions.WinnowedFingerprints(
        args(0), intArg(args(1), "n", "winnow_fingerprints"),
        intArg(args(2), "w", "winnow_fingerprints"))),
    ("jaccard_sim",
      new ExpressionInfo(classOf[NativeExpressions.JaccardStrings].getName,
        "jaccard_sim"),
      (args: Seq[Expression]) =>
        NativeExpressions.JaccardStrings(args(0), args(1))),
    ("cosine_sim",
      new ExpressionInfo(classOf[NativeExpressions.CosineSimilarity].getName,
        "cosine_sim"),
      (args: Seq[Expression]) =>
        NativeExpressions.CosineSimilarity(args(0), args(1))),
    ("quantize_i8",
      new ExpressionInfo(classOf[NativeExpressions.QuantizeI8].getName,
        "quantize_i8"),
      (args: Seq[Expression]) => NativeExpressions.QuantizeI8(args(0))),
    ("cosine_i8",
      new ExpressionInfo(classOf[NativeExpressions.CosineI8].getName,
        "cosine_i8"),
      (args: Seq[Expression]) =>
        NativeExpressions.CosineI8(args(0), args(1))),
    ("bounded_top_k",
      new ExpressionInfo(classOf[BoundedTopKAgg].getName, "bounded_top_k"),
      (args: Seq[Expression]) => BoundedTopKAgg(args(0),
        intArg(args(1), "k", "bounded_top_k"))),
    ("misra_gries",
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (args: Seq[Expression]) => MisraGriesAgg(args(0),
        intArg(args(1), "capacity", "misra_gries")))
  )

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
