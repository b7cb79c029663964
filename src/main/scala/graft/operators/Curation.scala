package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation filters that decide survival from AGGREGATE
  * statistics, not per-row signals: source/domain-level quality gating
  * and percentile-bounded length filtering — the passes a web-corpus
  * pipeline (C4/RefinedWeb-style) runs between dedup and split.
  */
object Curation {

  /** Domain-level filtering: keep documents whose SOURCE's mean score
    * clears `minMean`. A low-quality domain is dropped wholesale even
    * when individual pages look fine — the aggregate is the signal.
    * Rows with a NULL source are always dropped (a null join key never
    * matches — standard SQL IN semantics); coalesce the column to a
    * sentinel domain first if unattributed rows should form their own
    * stratum.
    *
    * Scale shape: the per-source aggregate is map-side combinable and
    * its output is one row per domain — orders of magnitude smaller
    * than the corpus — so the survivor set re-enters as a LEFT SEMI
    * join that AQE plans as a broadcast for any realistic domain
    * count. The corpus itself shuffles once (for the aggregate) and
    * never carries extra columns.
    */
  /** Eval-set decontamination — the n-gram-overlap pass every LLM
    * training pipeline runs before a release so benchmark text cannot
    * leak into the training corpus (public precedent: GPT-3's 13-gram
    * and Gopher's n-gram eval-overlap filters): flag every train
    * document sharing >= `minShared` distinct `shingleWidth`-word
    * shingles with ANY eval document.
    *
    * Scale shape: the EVAL side collapses to its distinct 60-bit
    * shingle-hash set — benchmarks are tiny next to a 100 TB corpus,
    * so that set broadcasts and the train side's exploded shingles
    * semi-probe it map-side (no shuffle of the corpus by shingle key,
    * which matters because shingle frequencies are Zipf-skewed); the
    * only corpus-keyed shuffle is the per-doc count aggregate, which
    * is map-side combinable. Hashes are the engine's md5-60
    * ([[Sketches.h60]]'s idiom), so an external SQL oracle replays
    * the flag bit-for-bit; a 60-bit collision can only ADD a shared
    * shingle (false-positive direction — conservative for a
    * decontamination gate, never hiding real overlap... and both
    * engines hash identically, so they agree even on collisions).
    *
    * @return train's rows plus (n_shared = distinct shared shingles,
    *         contaminated = n_shared >= minShared)
    */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, shingleWidth: Int = 8,
      minShared: Int = 1): DataFrame = {
    require(shingleWidth >= 1 && minShared >= 1,
      s"shingleWidth/minShared must be >= 1: $shingleWidth/$minShared")
    import graft.functions.{HashFunctions => H, TextFunctions => T}
    def grams(df: DataFrame): org.apache.spark.sql.Column =
      array_distinct(H.wordShingles(T.tokens(col(textCol)),
        shingleWidth))
    val evalSet = eval
      .select(explode(grams(eval)).as("__g"))
      .select(Sketches.h60(col("__g")).as("__gh")).distinct()
    val shared = train
      .select(col(idCol), explode(grams(train)).as("__g"))
      .select(col(idCol), Sketches.h60(col("__g")).as("__gh"))
      .join(broadcast(evalSet), Seq("__gh"))
      // per-doc grams are array_distinct'd, so count == distinct
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    train.join(shared, Seq(idCol), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("contaminated", col("n_shared") >= minShared)
  }

  def sourceFilter(docs: DataFrame, srcCol: String, scoreCol: String,
      minMean: Double): DataFrame = {
    val good = docs.groupBy(srcCol)
      .agg(avg(col(scoreCol)).as("__mean"))
      .where(col("__mean") >= minMean)
      .select(col(srcCol))
    docs.join(good, Seq(srcCol), "left_semi")
  }

  /** Unigram log-probability quality score (the CCNet/perplexity-filter
    * shape with the corpus itself as the language model): each
    * document's mean log p(token) under the corpus unigram
    * distribution. Prose scores near the corpus mean; boilerplate and
    * keyword-stuffed junk drift to the tails.
    *
    * Scale shape: the exploded corpus collapses to per-doc term
    * frequencies FIRST (map-side combinable), the vocabulary table is
    * broadcast — the tf frame never shuffles by term, which matters
    * because term keys are Zipf-skewed and a shuffle join would pile
    * every "the" row on one reducer. For a vocabulary too large to
    * broadcast, cap it (rare terms can share an OOV bucket) before
    * calling. Decimal accumulation keeps the mean order-independent.
    *
    * @return (idCol, n_tokens, mean_logp) — mean_logp rounded to 6dp;
    *   zero-token documents are absent (they have no distribution)
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import graft.functions.{TextFunctions => T}
    val tf = docs
      .select(col(idCol), explode(T.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val tc = tf.groupBy("term").agg(sum("tf").as("c"))
    val tot = tc.agg(sum(col("c")).as("n"))
    tf.join(broadcast(tc), "term")
      .crossJoin(broadcast(tot))
      .withColumn("lp", log(col("c").cast("double") / col("n")))
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"),
        round(sum((col("lp") * col("tf")).cast("decimal(28,12)"))
          .cast("double") / sum("tf"), 6).as("mean_logp"))
  }

  /** Robust outlier gate by median absolute deviation: keep rows with
    * `|v - median| <= k * MAD` — the outlier filter that, unlike
    * mean/stddev z-scores, is not itself dragged by the outliers it
    * should remove. On an INTEGER column both the median and the MAD
    * are integers or exact halves (interpolation midpoints), so the
    * threshold comparison is exact in IEEE doubles and any engine
    * reproduces the identical keep set — no rounding tolerance needed.
    * A zero MAD (majority at one value) degenerates to keeping only
    * the median value, the standard strictness of the estimator.
    *
    * Scale shape: two exact-percentile aggregates (sort-based, each
    * one pass) collect two scalars to the driver; the gate itself is
    * a codegen'd scan-side predicate, no shuffle.
    *
    * @return df's rows within k MADs of the median
    */
  def madOutliers(df: DataFrame, valueCol: String, k: Double)
      : DataFrame = {
    require(k >= 0, "k must be >= 0")
    val medRow = df.agg(expr(s"percentile(`$valueCol`, 0.5)"))
      .collect()(0)
    if (medRow.isNullAt(0)) return df.where(lit(false)) // no non-null rows
    val med = medRow.getDouble(0)
    val mad = df.agg(
        expr(s"percentile(abs(`$valueCol` - $med), 0.5)"))
      .collect()(0).getDouble(0)
    df.where(abs(col(valueCol) - med) <= k * mad)
  }

  /** Bigram log-probability quality score — the next order up from
    * [[unigramLogProb]]: each document's mean log p(b | a) over its
    * adjacent token pairs under the corpus's own add-1-smoothed
    * bigram model, p = (c_ab + 1) / (c_a + V). Catches what unigrams
    * cannot: scrambled word salad has a prose-like unigram profile
    * but collapses under bigram transitions.
    *
    * Scale shape: adjacent pairs come from the codegen'd 2-shingle
    * kernel (no positional self-join); per-doc pair frequencies
    * collapse map-side before anything joins; the bigram and context
    * models re-enter BROADCAST exactly like the unigram scorer (cap
    * the vocabulary upstream if it cannot broadcast — Zipf-skewed
    * keys must not become shuffle-join keys). Only V (one scalar)
    * and the model tables' aggregates move. Decimal accumulation,
    * 6-place round, so engines agree bit-for-bit.
    *
    * @param cache storage level for the per-doc pair-frequency frame,
    *   which the score join, the bigram model, and (via the model)
    *   the context model all consume — uncached, the plan re-explodes
    *   the corpus once per consumer
    * @return (idCol, n_bigrams, mean_logp) — documents with < 2
    *   tokens are absent (they have no bigram distribution)
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      cache: Option[org.apache.spark.storage.StorageLevel] = None)
      : DataFrame = {
    import graft.functions.{HashFunctions => H, TextFunctions => T}
    val toks = docs.select(col(idCol), T.tokens(col(textCol)).as("t"))
      .where(size(col("t")) >= 2)
    val v = toks.select(explode(col("t")).as("term"))
      .distinct().count()
    val bf0 = toks
      .select(col(idCol), explode(H.wordShingles(col("t"), 2)).as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("bf"))
    val bf = cache.fold(bf0)(bf0.persist)
    val bc = bf.groupBy("bg").agg(sum("bf").as("c_ab"))
    val cc = bc
      .withColumn("a", substring_index(col("bg"), " ", 1))
      .groupBy("a").agg(sum("c_ab").as("c_a"))
    bf.join(broadcast(bc), "bg")
      .withColumn("a", substring_index(col("bg"), " ", 1))
      .join(broadcast(cc), "a")
      .withColumn("lp", log(
        (col("c_ab") + 1L).cast("double") /
          (col("c_a") + lit(v)).cast("double")))
      .groupBy(col(idCol))
      .agg(sum("bf").as("n_bigrams"),
        round(sum((col("lp") * col("bf")).cast("decimal(28,12)"))
          .cast("double") / sum("bf"), 6).as("mean_logp"))
  }

  /** Fixed-size overlapping document chunking — the preprocessing pass
    * of an embedding/RAG pipeline: each document becomes
    * ceil(max(len - overlap, 1) / stride) windows of `chunkChars`
    * characters advancing by `stride = chunkChars - overlap`. The
    * count subtracts the overlap BEFORE dividing so the last window
    * is never a pure suffix of its predecessor (a naive ceil(len /
    * stride) emits a fully-redundant final chunk whenever
    * len % stride lands in [1, overlap] — duplicate embeddings and
    * duplicate retrieval hits downstream). Pure per-row projection
    * (sequence + explode + substring, all codegen'd): no shuffle, no
    * UDF, and chunk counts scale with text length so the explode's
    * row growth is exactly the output size. Empty/null text yields one
    * empty chunk (chunk_ix 0), keeping every document addressable.
    *
    * @return input columns minus textCol, plus (chunk_ix, chunk_text)
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      chunkChars: Int, overlap: Int = 0): DataFrame = {
    require(chunkChars > 0 && overlap >= 0 && overlap < chunkChars,
      s"need 0 <= overlap < chunkChars, got $overlap / $chunkChars")
    val stride = chunkChars - overlap
    val nChunks = greatest(
      ceil(greatest(length(coalesce(col(textCol), lit(""))) - overlap,
        lit(1)).cast("double") / stride).cast("long"), lit(1L))
    docs
      .withColumn("chunk_ix",
        explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("chunk_text",
        coalesce(col(textCol), lit(""))
          .substr((col("chunk_ix") * stride + 1).cast("int"),
            lit(chunkChars)))
      .drop(textCol)
  }

  /** Nearest-rank percentile bounds of an integer-valued column via a
    * value histogram: the value at rank `ceil(q * n)` (1-based, rank
    * clamped to >= 1). Deterministic INTEGER bounds — no interpolation,
    * so an external engine restating the same cumulative-histogram
    * logic lands on identical thresholds, where interpolated
    * percentiles invite 1-ulp boundary drift.
    *
    * The histogram groups by VALUE, so the collect is bounded by the
    * column's distinct-value count, not the corpus (document lengths:
    * thousands of values at any corpus size); refuse anything that
    * would actually strain the driver.
    */
  def rankBounds(docs: DataFrame, valueCol: String, lo: Double,
      hi: Double, maxDistinct: Int = 1000000): (Long, Long) = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"bad quantiles [$lo, $hi]")
    val hist = docs
      // null lengths (failed-ingest rows) carry no rank information and
      // would NPE the histogram collect; they are excluded here and the
      // range predicate in lengthFilter drops them too — consistent.
      .where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .orderBy("v")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(hist.nonEmpty, "rankBounds on an empty frame")
    require(hist.length <= maxDistinct,
      s"${hist.length} distinct values exceed maxDistinct=$maxDistinct; " +
        "bucket the column first (rankBounds is for low-cardinality " +
        "integer columns like lengths and counts)")
    val n = hist.map(_._2).sum
    def at(rank: Long): Long = {
      var cum = 0L
      var i = 0
      while (i < hist.length) {
        cum += hist(i)._2
        if (cum >= rank) return hist(i)._1
        i += 1
      }
      hist.last._1
    }
    (at(math.max(math.ceil(lo * n).toLong, 1L)),
      at(math.max(math.ceil(hi * n).toLong, 1L)))
  }

  /** Length filter: keep rows whose `valueCol` lies within the corpus's
    * own nearest-rank `[lo, hi]` percentile band — the "drop the
    * freakishly short and long tails" pass, with data-derived rather
    * than hand-tuned thresholds. Two jobs: the bounded histogram
    * aggregate, then a scan-side range predicate (both thresholds are
    * literals by the time the filter runs, so it pushes to the source).
    */
  def lengthFilter(docs: DataFrame, valueCol: String, lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    val (a, b) = rankBounds(docs, valueCol, lo, hi)
    docs.where(col(valueCol) >= a && col(valueCol) <= b)
  }

  /** Train a token log-odds quality model — the CCNet/LLaMA-style
    * "looks like the reference corpus vs looks like the crawl"
    * classifier, as a naive-Bayes table: for every token of either
    * class, `ln((c_pos+1)/(N_pos+V)) - ln((c_neg+1)/(N_neg+V))` with
    * add-1 smoothing over the joint vocabulary V. Positive values
    * mark reference-corpus tokens, negative values crawl tokens. One
    * extra row with a NULL term carries the unknown-token log-odds
    * (both counts 0 — the same formula), so [[logOddsScore]] needs no
    * side channel.
    *
    * Scale shape: one explode + map-side-combinable count per class,
    * a vocabulary-sized outer join, three scalars collected. Rounded
    * to 9 places so scoring sums identical values on every engine.
    *
    * @return (term, logodds) — one row per joint-vocabulary term plus
    *   the NULL-term unknown default
    */
  def trainLogOdds(pos: DataFrame, neg: DataFrame,
      textCol: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    def counts(df: DataFrame, n: String): DataFrame =
      df.select(explode(T.tokens(col(textCol))).as("term"))
        .groupBy("term").agg(count(lit(1)).as(n))
    val j = counts(pos, "ca").join(counts(neg, "cb"), Seq("term"),
        "full_outer")
      .select(col("term"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val st = j.agg(sum("ca"), sum("cb"), count(lit(1))).head()
    val (na, nb, v) = (st.getLong(0), st.getLong(1), st.getLong(2))
    def lo(ca: org.apache.spark.sql.Column,
        cb: org.apache.spark.sql.Column) = round(
      log((ca + 1L).cast("double") / lit((na + v).toDouble)) -
        log((cb + 1L).cast("double") / lit((nb + v).toDouble)), 9)
    j.select(col("term"), lo(col("ca"), col("cb")).as("logodds"))
      .unionByName(pos.sparkSession.range(1)
        .select(lit(null).cast("string").as("term"),
          lo(lit(0L), lit(0L)).as("logodds")))
  }

  /** Score documents under a [[trainLogOdds]] model: each document's
    * mean token log-odds — the per-document quality number the
    * curation gate thresholds ("keep what scores reference-like").
    * Out-of-vocabulary tokens take the model's NULL-term default, so
    * the score is total.
    *
    * Scale shape: the [[unigramLogProb]] plan with the corpus's own
    * model swapped for the trained one — per-doc term frequencies
    * collapse map-side, the model re-enters BROADCAST (vocabularies
    * broadcast; corpora don't), and the mean accumulates in
    * DECIMAL(28,12) for engine-exact 6-place scores.
    *
    * @return (idCol, n_tokens, score) — empty/tokenless docs absent
    */
  def logOddsScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val default = model.where(col("term").isNull)
      .select("logodds").head().getDouble(0)
    val tf = docs
      .select(col(idCol), explode(T.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(model.where(col("term").isNotNull)), Seq("term"),
        "left_outer")
      .withColumn("lo", coalesce(col("logodds"), lit(default)))
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"),
        round(sum((col("lo") * col("tf")).cast("decimal(28,12)"))
          .cast("double") / sum("tf"), 6).as("score"))
  }

  /** Equi-depth bucket assignment — the data-derived banding pass
    * ([[lengthFilter]]'s sibling): every row gets the quantile bucket
    * its `valueCol` falls in, with thresholds at the nearest-rank
    * i/nBuckets quantiles of the column itself. The bands feed
    * stratified sampling (length bands, quality bands, token-budget
    * bands) with equal POPULATION per band rather than equal width.
    *
    * Same two-job shape as [[rankBounds]] (and the same
    * integer/low-cardinality contract): one bounded histogram
    * aggregate to the driver, then the assignment is a scan-side
    * literal CASE — fully pushable, no second shuffle. Heavily
    * repeated values collapse thresholds; first-match CASE keeps the
    * assignment total and deterministic (a value equal to several
    * thresholds lands in the lowest such bucket).
    *
    * @return df plus `bucket` (0..nBuckets-1)
    */
  def equiDepthBuckets(df: DataFrame, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be > 0")
    // ONE histogram collect for all thresholds (per-threshold
    // rankBounds calls would re-aggregate the corpus nBuckets times)
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .orderBy("v")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(hist.nonEmpty, "equiDepthBuckets on an empty frame")
    val n = hist.map(_._2).sum
    def at(rank: Long): Long = {
      var cum = 0L
      var i = 0
      while (i < hist.length) {
        cum += hist(i)._2
        if (cum >= rank) return hist(i)._1
        i += 1
      }
      hist.last._1
    }
    val thresholds = (1 until nBuckets).map { i =>
      at(math.max(math.ceil(i.toDouble / nBuckets * n).toLong, 1L))
    }
    val bucket = thresholds.zipWithIndex.foldLeft(
      None: Option[org.apache.spark.sql.Column]) {
      case (acc, (t, i)) =>
        val branch = acc match {
          case None    => when(col(valueCol) <= t, lit(i.toLong))
          case Some(c) => c.when(col(valueCol) <= t, lit(i.toLong))
        }
        Some(branch)
    }.map(_.otherwise(lit((nBuckets - 1).toLong)))
      .getOrElse(lit(0L))
    // NULL values carry no rank (the histogram above excluded them) —
    // they band to a NULL bucket, not the top quantile the bare CASE's
    // otherwise() would silently assign (ADVICE r10).
    df.withColumn("bucket",
      when(col(valueCol).isNotNull, bucket))
  }

  /** k-anonymity audit: the quasi-identifier combinations shared by
    * FEWER than `k` rows — the groups whose members a release would
    * make re-identifiable. The complement of the PII regex scan: that
    * finds explicit identifiers inside text, this finds rows whose
    * metadata COMBINATION (zip + birth year + device, source + lang +
    * length band, ...) is itself the identifier. An empty result
    * certifies the projection k-anonymous.
    *
    * Scale shape: one map-side-combinable groupBy on the quasi-
    * identifier tuple — the output is bounded by the number of rare
    * combinations, and the `< k` filter sits on the aggregate, so
    * only violating groups ever leave the reducers. No second scan:
    * callers who need the offending ROWS semi-join this result back.
    *
    * @return one row per violating combination: the quasi columns
    *   plus `n_rows` (1 <= n_rows < k)
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k < 2 makes every group compliant")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") < k)
  }
}
