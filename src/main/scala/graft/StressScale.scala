package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stress-data scaler: writes an N-times-larger copy of a testdata
  * directory for superlinearity checks (VERDICT r10 item 7 — "does the
  * heavy tail stay ~linear at 10x data?"). FACT tables replicate with
  * key offsets (each replica's join keys shift by `i * stride`, so
  * fact-to-fact joins like orders-lineitem keep exactly their 1:1
  * per-replica semantics and aggregate cardinalities scale by N);
  * DIMENSION tables (part, customer, supplier, nation, region) copy
  * unscaled — 10x facts over a fixed dimension population is how real
  * warehouses grow, and it preserves dimension-join hit rates.
  * Foreign keys INTO dimensions (o_custkey, l_partkey) are left
  * unshifted for the same reason.
  *
  * CONTENT columns mutate per replica (VERDICT r11 item 3): replicating
  * `documents.text` / `embeddings.embedding` byte-identical would give
  * every band/cell bucket N copies of each member, so near-dup
  * verification pairs would grow N^2 — an artifact of the scaler, not a
  * property of a real N-times-larger corpus. Instead replica i > 0
  * suffixes every whitespace token with "x<i>" (word-shingle sets
  * across replicas become disjoint) and circularly shifts each
  * embedding by i positions (random vectors decorrelate at lag >= 1).
  * Replica 0 stays byte-identical to the source, so fixtures that
  * plant twins in the low-id range (docsWithTwins / vecsWithTwins)
  * keep their planted structure, and each replica carries its own
  * natural near-dup population — pair counts scale ~N, like a corpus
  * that actually grew.
  *
  * The output is a bench input, not a correctness fixture — oracle
  * queries keep running against the driver's own testdata.
  *
  * SKEW MODE (VERDICT r14 items 1-2): every uniform-mode ratio is
  * measured on deliberately strided (uniform) keys, which says nothing
  * about a hot key — the one 100 TB cliff the strided fixture cannot
  * show. `mode = skew` plants two adversarial distributions AFTER
  * replication:
  *   - a HOT USER: every 7th event (~14%) reroutes `user_id` to one
  *     fixed id, so per-user windows (sessionize, session prefixes,
  *     event dedup, as-of) see a single reducer holding 14% of the
  *     fact table — the generalization of the reference's
  *     hot-`queryItemId` risk (SURVEY §7.4#7);
  *   - a MEGA-CLUSTER: every 20th document (~5%) rewrites `text` to a
  *     shared 60-token base plus one per-doc unique token — mutually
  *     near-identical (word-shingle Jaccard ≈ 0.9), so MinHash banding
  *     funnels them into one giant bucket and CC label propagation
  *     sees one giant component. `n_chars` tracks the rewrite.
  * Everything else (strides, dims, embedding mutation) is identical to
  * uniform mode, so a skew-vs-uniform bench delta isolates the key
  * distribution.
  *
  * Usage: runMain graft.StressScale [srcDir] [dstDir] [factor] [mode] [tables]
  *   mode: "uniform" (default) | "skew"
  *   tables: optional comma list restricting output (e.g. "events") —
  *     a single-family probe (the x100 events run) shouldn't pay the
  *     60M-row lineitem rewrite it never reads. Unlisted tables are
  *     simply not written; strides/guards for excluded tables are not
  *     computed, so excluding `embeddings` also lifts its 2*dim factor
  *     cap.
  */
object StressScale {
  private def replicate(df: DataFrame, factor: Int,
      offsets: Map[String, Long],
      mutations: Seq[(String, Column)] = Seq.empty): DataFrame = {
    // one row per (row, replica) pair via a codegen'd explode — no
    // driver loop, no union of N plans
    val exploded = df.withColumn("__rep",
      explode(sequence(lit(0L), lit(factor - 1L))))
    val keyed = offsets.foldLeft(exploded) { case (d, (c, stride)) =>
      d.withColumn(c, col(c) + col("__rep") * stride)
    }
    // mutation expressions may reference col("__rep") and earlier
    // mutations' outputs (applied in sequence order — n_chars must see
    // the already-mutated text), hence Seq, not Map
    mutations.foldLeft(keyed) { case (d, (c, e)) =>
      d.withColumn(c, e)
    }.drop("__rep")
  }

  /** Replica-i text: every token suffixed with "x<i>" (i = 0 keeps the
    * original bytes). One token's mutation never collides with another
    * replica's, so word-shingle sets across replicas are disjoint.
    */
  private def mutateText(c: Column): Column =
    when(col("__rep") === 0, c).otherwise(
      array_join(transform(split(c, " "),
        w => concat(w, lit("x"), col("__rep"))), " "))

  /** Replica-i embedding: circular shift by `i mod dim` positions,
    * globally negated on the second lap (`i / dim` odd). Both halves
    * of the family preserve the norm exactly and (for the generator's
    * random-ish vectors) decorrelate replicas from the original and
    * from each other — a negated rotation has cosine -1 against its
    * un-negated twin, far below any positive near-dup threshold.
    * `pmod` keeps the slice lengths legal for any replica index
    * (ADVICE r12 — a raw `i` shift went negative-length past the
    * dimension). Two replicas collide only at equal shift AND equal
    * sign, i.e. equal index, so the family carries 2*dim distinct
    * members; main's `factor <= 2*dim` guard (VERDICT r14 item 7 —
    * the sf10 probe needs factor 100 > dim 64) keeps byte-identical
    * replicas (the N^2 near-dup artifact this mutation exists to
    * avoid) structurally impossible within the supported range.
    */
  private[graft] def mutateVec(c: Column): Column = {
    val dim = size(c).cast("long")
    val shift = pmod(col("__rep"), dim)
    val rotated = when(shift === 0, c).otherwise(concat(
      slice(c, (shift + 1).cast("int"),
        (size(c) - shift.cast("int")).cast("int")),
      slice(c, lit(1), shift.cast("int"))))
    when(pmod(floor(col("__rep") / dim), lit(2)) === 0, rotated)
      .otherwise(transform(rotated, x => -x))
  }

  /** The planted hot user id (skew mode). A small constant far below
    * any stride, so it never collides with a replica's shifted range
    * ambiguously — it simply becomes the one user with ~14% of events.
    */
  val HotUserId = 7L

  /** Skew-mode rewrite for one table's replicated frame (identity for
    * tables without a planted distribution).
    */
  private[graft] def plantSkew(table: String, df: DataFrame): DataFrame =
    table match {
      case "events" =>
        df.withColumn("user_id",
          when(pmod(col("event_id"), lit(7L)) === 0, lit(HotUserId))
            .otherwise(col("user_id")))
      case "documents" =>
        // 60 shared tokens + 1 unique: pairwise word-shingle Jaccard
        // stays far above any near-dup threshold, but no two texts are
        // byte-identical (a mega NEAR-dup cluster, not an exact-dup one)
        val base = (1 to 60).map(i => s"mega$i").mkString(" ")
        val hot = pmod(col("doc_id"), lit(20L)) === 0
        df.withColumn("text",
            when(hot, concat(lit(base + " uniq"), col("doc_id")))
              .otherwise(col("text")))
          .withColumn("n_chars",
            when(hot, length(col("text")).cast("long"))
              .otherwise(col("n_chars")))
      case _ => df
    }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val mode = args.lift(3).getOrElse("uniform")
    val wanted: Option[Set[String]] =
      args.lift(4).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkBoot.session(SparkBoot.cpus(), Some("32"))
    run(spark, src, dst, factor, mode, wanted)
    spark.stop()
  }

  /** The scaler body on a CALLER-OWNED session — the streaming-state
    * specs regenerate their /tmp fixtures through this (VERDICT r17
    * what's-wrong #3: the x100 specs must not silently cancel on a
    * fresh box), and main wraps it for the CLI.
    */
  def run(spark: SparkSession, src: String, dst: String, factor: Int,
      mode: String, wanted: Option[Set[String]]): Unit = {
    require(mode == "uniform" || mode == "skew",
      s"StressScale: unknown mode `$mode` (uniform|skew)")
    def t(n: String) = spark.read.parquet(s"$src/$n.parquet")
    // strides: a round power of ten above the source's max key keeps
    // replica key ranges disjoint and human-readable
    def stride(df: DataFrame, c: String): Long = {
      // getAs[Number] + null check, not getLong: an empty source table
      // or a non-bigint key column should name the column, not NPE
      // (ADVICE r11 — dev tool, a clear failure is enough)
      val row = df.agg(max(col(c))).head()
      require(!row.isNullAt(0),
        s"stride: key column `$c` has no non-null values (empty table?)")
      val mx = row.get(0) match {
        case n: java.lang.Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"stride: key column `$c` must be integral, got " +
            s"${other.getClass.getSimpleName} ($other)")
      }
      var s = 10L
      while (s <= mx) s *= 10
      s
    }
    // offsets are thunks: a table excluded by `tables` must not pay
    // (or require) its stride scan — orders/lineitem share one stride
    // so their fact-to-fact join keys stay aligned per replica
    lazy val orderStride = stride(t("orders"), "o_orderkey")
    val allFacts: Seq[(String, () => Map[String, Long])] = Seq(
      // o_custkey/l_partkey unshifted: FKs into fixed dimensions
      "orders" -> (() => Map("o_orderkey" -> orderStride)),
      "lineitem" -> (() => Map("l_orderkey" -> orderStride)),
      "events" -> (() => Map(
        "event_id" -> stride(t("events"), "event_id"),
        "user_id" -> stride(t("events"), "user_id"))),
      "documents" -> (() => Map("doc_id" -> stride(t("documents"), "doc_id"))),
      // embeddings stride must clear vecsWithTwins' +100000 twin range
      "embeddings" -> (() => Map("vec_id" ->
        math.max(stride(t("embeddings"), "vec_id"), 1000000L))))
    val allDims = Seq("part", "customer", "supplier", "nation", "region")
    wanted.foreach { w =>
      val unknown = w -- (allFacts.map(_._1) ++ allDims).toSet
      require(unknown.isEmpty,
        s"StressScale: unknown tables ${unknown.mkString(", ")} " +
          s"(know: ${(allFacts.map(_._1) ++ allDims).mkString(", ")})")
    }
    def included(n: String): Boolean = wanted.forall(_.contains(n))
    val facts = allFacts.collect {
      case (n, off) if included(n) => n -> off()
    }
    val dims = allDims.filter(included)
    // n_chars tracks the mutated text so length-derived scores stay
    // internally consistent on the scaled fixture
    // factor <= 2 * embedding dim (ADVICE r12 / VERDICT r14 item 7):
    // mutateVec's rotation+second-lap-negation family has exactly
    // 2*dim distinct members, so replica indexes at/past 2*dim would
    // repeat one and plant byte-identical vectors across replicas —
    // exactly the N^2 near-dup artifact mutateVec exists to avoid.
    if (included("embeddings"))
      t("embeddings").select(size(col("embedding"))).limit(1).collect()
        .headOption.foreach { r =>
        val dim = r.getInt(0)
        require(factor <= 2 * dim,
          s"StressScale: factor $factor > 2 x embedding dimension $dim — " +
          s"only ${2 * dim} distinct rotation/negation mutations exist, " +
          "so some replicas would carry byte-identical embeddings (an " +
          s"N^2 near-dup artifact of the scaler); use factor <= ${2 * dim}")
      }
    val mutations: Map[String, Seq[(String, Column)]] = Map(
      "documents" -> Seq(
        "text" -> mutateText(col("text")),
        "n_chars" -> length(col("text")).cast("long")),
      "embeddings" -> Seq(
        "embedding" -> mutateVec(col("embedding"))))
    for ((n, off) <- facts) {
      val scaled =
        replicate(t(n), factor, off, mutations.getOrElse(n, Seq.empty))
      val out = if (mode == "skew") plantSkew(n, scaled) else scaled
      out.write.mode("overwrite").parquet(s"$dst/$n.parquet")
      println(s"[scale] $n x$factor ($mode) -> $dst/$n.parquet")
    }
    for (n <- dims) {
      t(n).write.mode("overwrite").parquet(s"$dst/$n.parquet")
      println(s"[scale] $n (dim, unscaled) -> $dst/$n.parquet")
    }
  }
}
