package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketching hot path.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) never
  * enter whole-stage codegen — every element op is an interpreted
  * `Expression.eval` with closure dispatch and boxing. For sketches that
  * touch every token x every hash component, that interpretive overhead
  * dominated the sf0.1 benchmark (minhash 57s, simhash 24s for a 5k-doc
  * corpus). Each expression here generates a single static call into a
  * compiled [[Kernels]] loop, keeping the operator inside the
  * WholeStageCodegen span (preference order (b) of the build brief:
  * native Expression with doGenCode over UDF).
  */
object NativeExpressions {

  private val kernels = Kernels.getClass.getName.stripSuffix("$") + "$.MODULE$"

  /** array<string> tokens -> array<string> n-word shingles. */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType)
    override def prettyName: String = "word_shingles"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.wordShingles(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernels.wordShingles($c, $n);")
    override protected def withNewChildInternal(newChild: Expression)
        : WordShingles = copy(child = newChild)
  }

  /** array<string> tokens -> array<long> winnowed passage
    * fingerprints (sorted distinct window-min md5_60 shingle hashes).
    */
  case class WinnowedFingerprints(child: Expression, n: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fingerprints"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.winnowedFingerprints(input.asInstanceOf[ArrayData], n, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernels.winnowedFingerprints($c, $n, $w);")
    override protected def withNewChildInternal(newChild: Expression)
        : WinnowedFingerprints = copy(child = newChild)
  }

  /** array<string> shingles -> array<long> MinHash signature. */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.minhashSignature(input.asInstanceOf[ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernels.minhashSignature($c, $numHashes);")
    override protected def withNewChildInternal(newChild: Expression)
        : MinHashSignature = copy(child = newChild)
  }

  /** array<long> MinHash signature -> array<long> LSH band keys. */
  case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_band_keys"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.minhashBandKeys(input.asInstanceOf[ArrayData], bands,
        rowsPerBand)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $kernels.minhashBandKeys($c, $bands, $rowsPerBand);")
    override protected def withNewChildInternal(newChild: Expression)
        : MinHashBandKeys = copy(child = newChild)
  }

  /** array<string> tokens -> long SimHash. */
  case class SimHash60(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash60"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.simhash60(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.simhash60($c);")
    override protected def withNewChildInternal(newChild: Expression)
        : SimHash60 = copy(child = newChild)
  }

  /** (array<string>, array<string>) -> double exact Jaccard. */
  case class JaccardStrings(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.jaccardStrings(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = $kernels.jaccardStrings($a, $b);")
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): JaccardStrings =
      copy(left = newLeft, right = newRight)
  }

  /** (string, string) -> double Jaro-Winkler similarity (the
    * record-linkage score Spark lacks natively; DuckDB-exact
    * semantics, see [[Kernels.jaroWinkler]]). One static call, stays
    * inside WholeStageCodegen.
    */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.jaroWinkler(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = $kernels.jaroWinkler($a, $b);")
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): JaroWinkler =
      copy(left = newLeft, right = newRight)
  }

  /** (array<double>, array<double>) -> double cosine similarity.
    * Inputs MUST already be array<double> (callers cast via
    * [[graft.functions.VectorFunctions.toDouble]]) — AbstractDataType is
    * private[sql] in Spark 4, so no implicit-cast contract here.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = $kernels.cosine($a, $b);")
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  /** array<double> -> array<long> sign-LSH band keys against a fixed
    * (driver-computed, deterministic-seed) plane matrix carried as an
    * expression reference object.
    */
  case class SignLshBandKeys(child: Expression,
      planes: Array[Array[Double]], bands: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "sign_lsh_band_keys"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.signLshBandKeys(input.asInstanceOf[ArrayData], planes, bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernels.signLshBandKeys($c, $planesRef, $bands);")
    }
    override protected def withNewChildInternal(newChild: Expression)
        : SignLshBandKeys = copy(child = newChild)
  }

  /** array<double> -> array<byte> symmetric int8 codes (4x smaller than
    * float32 — the storage/shuffle lever for billion-vector ANN; cosine
    * is scale-invariant so the codes alone rank).
    */
  case class QuantizeI8(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def prettyName: String = "quantize_i8"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.quantizeI8(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.quantizeI8($c);")
    override protected def withNewChildInternal(newChild: Expression)
        : QuantizeI8 = copy(child = newChild)
  }

  /** (array<byte>, array<byte>) -> double cosine over int8 codes —
    * exact integer accumulation, order-insensitive across engines.
    */
  case class CosineI8(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_i8"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosineI8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = $kernels.cosineI8($a, $b);")
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): CosineI8 =
      copy(left = newLeft, right = newRight)
  }

  // ---- Column-API wrappers --------------------------------------------

  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def wordShingles(tokens: Column, n: Int): Column =
    c(WordShingles(e(tokens), n))
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    c(MinHashSignature(e(shingles), numHashes))
  def minhashBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    c(MinHashBandKeys(e(sig), bands, rowsPerBand))
  def simhash60(tokens: Column): Column = c(SimHash60(e(tokens)))
  def winnowedFingerprints(tokens: Column, n: Int, w: Int): Column =
    c(WinnowedFingerprints(e(tokens), n, w))
  def jaccard(a: Column, b: Column): Column =
    c(JaccardStrings(e(a), e(b)))
  def jaroWinkler(a: Column, b: Column): Column =
    c(JaroWinkler(e(a), e(b)))
  def bpeSegment(tokens: Column, merges: Seq[(String, String)]): Column =
    c(BpeSegment(e(tokens), merges))
  def cosine(a: Column, b: Column): Column =
    c(CosineSimilarity(e(a), e(b)))
  def signLshBandKeys(v: Column, planes: Seq[Seq[Double]], bands: Int)
      : Column =
    c(SignLshBandKeys(e(v), planes.map(_.toArray).toArray, bands))
  def quantizeI8(v: Column): Column = c(QuantizeI8(e(v)))
  def cosineI8(a: Column, b: Column): Column = c(CosineI8(e(a), e(b)))
  def bloomMightContain(s: Column,
      bf: org.apache.spark.util.sketch.BloomFilter): Column =
    c(BloomMightContain(e(s), bf))

  /** string -> boolean membership probe against a driver-built
    * [[org.apache.spark.util.sketch.BloomFilter]] carried as an
    * expression reference object (the same vehicle as
    * [[SignLshBandKeys]]' plane matrix). Codegen'd, so a
    * bloom-prefilter stays inside the scan's WholeStageCodegen span
    * instead of dropping the whole pipeline out through a UDF. May
    * return false-positive `true` (the filter's fpp), NEVER a false
    * negative — callers re-verify positives exactly.
    */
  case class BloomMightContain(child: Expression,
      bf: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.bloomMightContain(bf,
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val bfRef = ctx.addReferenceObj("bloom", bf,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernels.bloomMightContain($bfRef, $c);")
    }
    override protected def withNewChildInternal(newChild: Expression)
        : BloomMightContain = copy(child = newChild)
  }

  /** array<string> tokens -> array<string> BPE symbols under a ranked
    * merge table ([[Kernels.bpeSegment]] — greedy min-rank leftmost
    * merge per word). The merge map is built once per expression
    * instance and rides codegen as a reference object (the
    * [[BloomMightContain]] vehicle), so tokenizer application stays
    * inside the WholeStageCodegen span.
    */
  case class BpeSegment(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    // an EMPTY merge table is legal: no merge ever applies, so the
    // expression degrades to pure code-point segmentation — exactly
    // the iteration-0 state BPE TRAINING needs ([[graft.operators
    // .Tokenizer.bpeTrain]])
    private lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((l, r), k) =>
        // first occurrence wins: BPE ranks are unique by construction,
        // but a duplicated pair must not silently change its rank
        m.putIfAbsent(l + "\u0001" + r, Integer.valueOf(k))
      }
      m
    }
    override def dataType: DataType = ArrayType(StringType,
      containsNull = false)
    override def prettyName: String = "bpe_segment"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.bpeSegment(input.asInstanceOf[ArrayData], ranks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
        "java.util.HashMap<String, Integer>")
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernels.bpeSegment($c, $ranksRef);")
    }
    override protected def withNewChildInternal(newChild: Expression)
        : BpeSegment = copy(child = newChild)
  }
}
