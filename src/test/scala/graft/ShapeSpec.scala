package graft

import org.apache.spark.sql.{DataFrame, functions}
import org.apache.spark.sql.functions.{concat, lit}

import graft.operators.{AsofJoin, Events, ShapeSelect}

/** Auto shape selection (VERDICT r15 #1): [[ShapeSelect.decide]] must
  * route the plain per-key window on uniform keys and the bucketed
  * two-phase shape on a hot entity, the auto entry points must follow
  * that verdict (pinned from the PLAN — the bucketed shapes carry a
  * join operator the plain window shapes lack), and all three routes
  * must be output-identical on BOTH fixtures.
  */
class ShapeSpec extends SparkSpec {
  import spark.implicits._

  /** 800 events; `hotShare` of them on user 0, the rest uniform over
    * 40 users, plus a NULL-user stripe (~2.7%) — the window shapes
    * keep null keys as one partition, so the probe must count them
    * as one key too.
    */
  private def mkEvents(hotShare: Double, seed: Int = 5): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to 800).map { i =>
      val u = if (rnd.nextDouble() < hotShare) 0L
              else 1L + rnd.nextInt(40).toLong
      (if (i % 37 == 0) None else Some(u), i.toLong,
       rnd.nextInt(30).toLong * 1800L + rnd.nextInt(40))
    }.toDF("user_id", "event_id", "ts_s")
  }
  private lazy val uniform = mkEvents(0.0)
  private lazy val hot = mkEvents(0.6)

  private def hasJoin(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin").exists(p.contains)
  }

  test("decide: share arm — plain on uniform keys, bucketed on a hot key") {
    val du = ShapeSelect.decide(uniform, Seq("user_id"), "ts_s")
    assert(!du.bucketed,
      s"uniform fixture routed bucketed (top share ${du.topShare})")
    assert(du.nRows == 800 && du.topShare < 0.05)
    val dh = ShapeSelect.decide(hot, Seq("user_id"), "ts_s")
    assert(dh.bucketed,
      s"hot fixture routed plain (top share ${dh.topShare})")
    assert(dh.topShare > 0.5)
  }

  test("decide: absolute-rows arm and sampled probe") {
    // a key can dominate absolutely without dominating by share:
    // tiny maxKeyRows stands in for the 4M default
    val abs = ShapeSelect.decide(uniform, Seq("user_id"), "ts_s",
      maxKeyRows = 10L)
    assert(abs.bucketed && abs.topShare < 0.05)
    // estTopRows scales the sampled count back up by probeFraction
    val half = ShapeSelect.decide(uniform, Seq("user_id"), "ts_s",
      maxKeyRows = 10L, probeFraction = 0.5, seed = 3L)
    assert(half.estTopRows > half.topRows && half.bucketed)
    // a 60% hot key survives any reasonable sample
    assert(ShapeSelect.decide(hot, Seq("user_id"), "ts_s",
      probeFraction = 0.25, seed = 9L).bucketed)
  }

  test("decide: time bounds are exact under sampling (ADVICE r16)") {
    // one extreme row far outside the bulk: a 1% Bernoulli sample
    // almost surely misses it, and a bucket span derived from sampled
    // bounds would then under-cover — rows past the sampled max land
    // past targetBuckets. The probe must keep min/max over EVERY row
    // (only the counts are sampled), so the bounds equal the true
    // extremes for ANY seed.
    val bulk = (0L until 2000L).map(i => (i % 40, i, 1000L + i % 500))
    val outlier = Seq((777L, 999999L, 1000000000L),
      (778L, 999998L, -5L))
    val df = (bulk ++ outlier).toDF("user_id", "event_id", "ts_s")
    for (seed <- 1L to 5L) {
      val d = ShapeSelect.decide(df, Seq("user_id"), "ts_s",
        probeFraction = 0.01, seed = seed)
      assert(d.minTime == -5L && d.maxTime == 1000000000L,
        s"seed $seed: sampled bounds drifted (${d.minTime}, ${d.maxTime})")
      // the distinct-key count is exact too: the grouping sees all rows
      assert(d.nKeys == 42, s"seed $seed: nKeys ${d.nKeys}")
    }
  }

  test("decide: empty input probes as unskewed") {
    val empty = Seq.empty[(Option[Long], Long, Long)]
      .toDF("user_id", "event_id", "ts_s")
    val d = ShapeSelect.decide(empty, Seq("user_id"), "ts_s")
    assert(!d.bucketed && d.nRows == 0 && d.nKeys == 0 &&
      d.topRows == 0 && d.topShare == 0.0)
  }

  test("sessionizeAuto: route pinned from the plan, outputs identical") {
    def norm(df: DataFrame) = df
      .select("user_id", "event_id", "session_seq").collect()
      .map(r => (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
        r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    for ((ev, wantBucketed) <- Seq((uniform, false), (hot, true))) {
      val auto = Events.sessionizeAuto(ev, "user_id", "ts_s",
        gapMinutes = 30, orderCols = Seq("ts_s", "event_id"),
        bucketSeconds = 1800L)
      // the bucketed shape joins phase-1 rows to the offset summary;
      // the plain shape is windows only — the join's presence IS the
      // route
      assert(hasJoin(auto) == wantBucketed,
        s"wrong route for wantBucketed=$wantBucketed")
      val plain = Events.sessionize(ev, "user_id", "ts_s", 30,
        Seq("ts_s", "event_id"))
      val bucketed = Events.sessionizeBucketed(ev, "user_id", "ts_s",
        30, Seq("ts_s", "event_id"), 1800L)
      assert(norm(auto) == norm(plain) && norm(auto) == norm(bucketed))
    }
  }

  test("sessionPrefixesAuto: one probe routes both windows, outputs identical") {
    def norm(df: DataFrame) = df.collect()
      .map(r => (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
        r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._4)).toSeq
    for ((ev, wantBucketed) <- Seq((uniform, false), (hot, true))) {
      val auto = Events.sessionPrefixesAuto(ev, "user_id", "ts_s",
        "event_id", gapMinutes = 30, orderCols = Seq("ts_s", "event_id"),
        maxPrefix = 5, bucketSeconds = 1800L, prefixChunkRows = 64L)
      assert(hasJoin(auto) == wantBucketed,
        s"wrong route for wantBucketed=$wantBucketed")
      val plain = Events.sessionPrefixes(ev, "user_id", "ts_s",
        "event_id", 30, Seq("ts_s", "event_id"), maxPrefix = 5)
      val chunked = Events.sessionPrefixes(ev, "user_id", "ts_s",
        "event_id", 30, Seq("ts_s", "event_id"), maxPrefix = 5,
        bucketSeconds = Some(1800L), prefixChunkRows = 64L)
      assert(norm(auto) == norm(plain) && norm(auto) == norm(chunked))
    }
  }

  test("asofBackwardAuto: union-volume probe, derived span, outputs identical") {
    def split(ev: DataFrame): (DataFrame, DataFrame) = (
      ev.where($"event_id" % 2 === 0)
        .select($"user_id".as("k"), $"ts_s".as("t"),
          $"event_id".as("lid")),
      ev.where($"event_id" % 2 === 1)
        .select($"user_id".as("k"), $"ts_s".as("t"),
          $"event_id".as("rid"), concat(lit("p"), $"event_id").as("pv")))
    def norm(df: DataFrame) = df
      .select("k", "t", "lid", "rid", "pv").collect()
      .map(r => (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
        r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) "NULL" else r.getString(4)))
      .sortBy(t => (t._1, t._3)).toSeq
    for ((ev, wantBucketed) <- Seq((uniform, false), (hot, true))) {
      val (lf, rf) = split(ev)
      // bucketSpan = 0: span derives from the probed time range
      val auto = AsofJoin.asofBackwardAuto(lf, rf, Seq("k"), "t",
        Some("rid"), targetBuckets = 16)
      // plain asof is the union+window shape with NO join operator
      // at all (PlanRegressionSpec pins that); the bucketed carry
      // introduces joins — again the plan reveals the route
      assert(hasJoin(auto) == wantBucketed,
        s"wrong route for wantBucketed=$wantBucketed")
      val plain = AsofJoin.asofBackward(lf, rf, Seq("k"), "t",
        Some("rid"))
      val bucketed = AsofJoin.asofBackwardBucketed(lf, rf, Seq("k"),
        "t", Some("rid"), bucketSpan = 1800L)
      assert(norm(auto) == norm(plain) && norm(auto) == norm(bucketed))
    }
  }

  test("JoinAdvisor: exact counts, HLL estimate near truth, nulls out") {
    import graft.operators.JoinAdvisor
    val left = spark.read
      .parquet("/root/testdata/sf0.01/orders.parquet")
    val right = spark.read
      .parquet("/root/testdata/sf0.01/customer.parquet")
    val a = JoinAdvisor.advise(left, right, "o_custkey", "c_custkey",
      broadcastRows = 2000L)
    assert(a.nLeft == 15000L && a.nRight == 1500L)
    // raw HLL at p=5 (~18% std err): both sides' true key-distinct is
    // 1500 — accept a generous band, determinism is the real contract
    assert(a.dLeft > 800 && a.dLeft < 2800, s"dLeft=${a.dLeft}")
    assert(a.dRight > 800 && a.dRight < 2800, s"dRight=${a.dRight}")
    // containment estimate: true |join| = 15000 (every order matches)
    assert(a.estRows > 7500 && a.estRows < 30000, s"est=${a.estRows}")
    assert(a.strategy == "broadcast_right" && !a.explosive)
    // determinism under repartitioning (register merge is a max)
    val b = JoinAdvisor.advise(left.repartition(13), right.repartition(7),
      "o_custkey", "c_custkey", broadcastRows = 2000L)
    assert(a == b)
    // null keys never equi-join, so they must not count
    val withNulls = left.unionByName(
      left.limit(50).withColumn("o_custkey",
        lit(null).cast("long")))
    val c = JoinAdvisor.advise(withNulls, right, "o_custkey",
      "c_custkey", broadcastRows = 2000L)
    assert(c.nLeft == 15000L && c.dLeft == a.dLeft)
  }

  test("JoinAdvisor: strategy routing and plan pins") {
    import graft.operators.JoinAdvisor
    val big = (1L to 4000L).map(i => (i, i % 97)).toDF("k", "pay")
    val small = (1L to 400L).map(i => (i, s"d$i")).toDF("j", "name")
    // right fits the broadcast bound -> BroadcastHashJoin in the plan
    val (bj, ba) = JoinAdvisor.autoJoin(big, small, "k", "j",
      broadcastRows = 1000L)
    assert(ba.strategy == "broadcast_right")
    assert(bj.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // neither side fits, right 4x+ smaller -> shuffle-hash, right build
    val (hj, ha) = JoinAdvisor.autoJoin(big, small, "k", "j",
      broadcastRows = 100L)
    assert(ha.strategy == "shuffle_hash_right")
    assert(hj.queryExecution.executedPlan.toString
      .contains("ShuffledHashJoin"))
    // comparable sizes -> sort-merge
    val (mj, ma) = JoinAdvisor.autoJoin(big, big.withColumnRenamed("k", "j"),
      "k", "j", broadcastRows = 100L)
    assert(ma.strategy == "sort_merge")
    assert(mj.queryExecution.executedPlan.toString
      .contains("SortMergeJoin"))
    // all routes output-identical
    def keys(df: DataFrame) =
      df.select("k", "j").as[(Long, Long)].collect().toSet
    assert(keys(bj) == keys(hj))
    // explosive flag: a many-to-many key blow-up is called out
    val mm = (1L to 2000L).map(i => (i % 2, i)).toDF("k", "pay")
    val ex = JoinAdvisor.advise(mm, mm.withColumnRenamed("k", "j"),
      "k", "j")
    assert(ex.explosive, s"2000x2000-over-2-keys not flagged: $ex")
  }

  test("JoinAdvisor: broadcast is BYTE-gated, not row-gated") {
    import graft.operators.JoinAdvisor
    val big = (1L to 40000L).map(i => (i, i % 97)).toDF("k", "pay")
    // 5k rows — far under any row cap — but 10 KB payloads: ~50 MB.
    // The pre-fix row-count gate would broadcast a multi-GB dim at
    // 100x scale (VERDICT r19 #2); the byte gate must refuse.
    val wide = (1L to 5000L).map(i => (i, "x" * 10240)).toDF("j", "blob")
    val a = JoinAdvisor.advise(big, wide, "k", "j",
      broadcastRows = 10000L)
    assert(a.bRight > 5000L * 10240L, s"bytes under-measured: $a")
    assert(a.strategy != "broadcast_right" &&
      a.strategy != "broadcast_left", s"broadcast a 50MB dim: $a")
    // same dim under a raised byte budget: rows still gate
    val b = JoinAdvisor.advise(big, wide, "k", "j",
      broadcastRows = 10000L, broadcastBytes = 100L << 20)
    assert(b.strategy == "broadcast_right", s"got $b")
    // exact width accounting: fixed-width side is bit-predictable
    // (8 row overhead + 8 + 8 per (long, long) row)
    assert(a.bLeft == 40000L * 24L, s"bLeft=${a.bLeft}")
  }

  test("JoinAdvisor: register-table path == direct profile, " +
      "adviseProfiles == advise") {
    import graft.operators.JoinAdvisor
    val left = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val right = spark.read
      .parquet("/root/testdata/sf0.01/customer.parquet")
    // the streaming entry points (profileRegisters -> collect ->
    // profileFromRegisters -> adviseProfiles) must agree bit-for-bit
    // with the batch path — that identity is what lets the streaming
    // advisor share the batch oracle
    val lp = JoinAdvisor.profileFromRegisters(
      JoinAdvisor.profileRegisters(left, "o_custkey", p = 5).collect(),
      p = 5)
    val rp = JoinAdvisor.profileFromRegisters(
      JoinAdvisor.profileRegisters(right, "c_custkey", p = 5)
        .collect(), p = 5)
    assert(lp == JoinAdvisor.profile(left, "o_custkey"))
    assert(rp == JoinAdvisor.profile(right, "c_custkey"))
    assert(JoinAdvisor.adviseProfiles(lp, rp, broadcastRows = 2000L) ==
      JoinAdvisor.advise(left, right, "o_custkey", "c_custkey",
        broadcastRows = 2000L))
    // sharded register tables union-merge into the same profile (the
    // fold a streaming complete-mode aggregation performs)
    val sharded = JoinAdvisor.profileRegisters(
        left.repartition(7), "o_custkey", p = 5)
      .groupBy("j").agg(functions.max("r").as("r"),
        functions.sum("c").as("c"), functions.sum("w").as("w"))
    assert(JoinAdvisor.profileFromRegisters(sharded.collect(), 5) == lp)
  }

  test("JoinAdvisor.autoJoin: self-join on shared lineage resolves") {
    import graft.operators.JoinAdvisor
    // pre-fix, left(key) === right(key) on one DataFrame was
    // ambiguous/trivially-true (ADVICE r19) — the subquery aliases
    // must make this a real equi-join
    val df = (1L to 100L).map(i => (i % 10, i)).toDF("k", "v")
    val (j, _) = JoinAdvisor.autoJoin(df, df, "k", "k")
    // 100 rows over 10 keys, 10 per key -> 10 keys * 10 * 10 = 1000
    assert(j.count() == 1000L, s"got ${j.count()}")
    val (m, _) = JoinAdvisor.autoJoin(df, df, "k", "k",
      broadcastRows = 1L)
    assert(m.count() == 1000L)
  }
}
