package graft

import graft.operators.{Graph, ItemSim, RankEval}

/** Hand-checkable fixtures for item-CF cosine, beyond-accuracy
  * metrics, and multi-source BFS.
  */
class ItemSimSpec extends SparkSpec {
  import spark.implicits._

  test("cosineNeighbors: cosine math, both directions, minCo prune") {
    // items: A with users {1,2,3}; B with {1,2}; C with {3}
    // pairs: (A,B) co=2, (A,C) co=1 (pruned at minCo=2)
    val ui = Seq((1L, "A"), (2L, "A"), (3L, "A"), (1L, "B"), (2L, "B"),
      (3L, "C"), (3L, "C") /* dup collapses */)
      .toDF("user_id", "item_id")
    val out = ItemSim.cosineNeighbors(ui, minCo = 2L).collect()
    assert(out.length == 2) // A->B and B->A only
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    val expSim = BigDecimal(2.0 / math.sqrt(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(("A", "B")) == ((2L, expSim, 1)))
    assert(m(("B", "A")) == ((2L, expSim, 1)))
  }

  test("cosineNeighbors: hyperactive users excluded before pairing") {
    // user 9 touches 3 items -> excluded at cap 2; only user 1's pair
    // survives, and supports count the capped population (n=1 each)
    val ui = (Seq((9L, "A"), (9L, "B"), (9L, "C")) ++
      Seq((1L, "A"), (1L, "B"))).toDF("user_id", "item_id")
    val out = ItemSim
      .cosineNeighbors(ui, maxUserItems = 2, minCo = 1L).collect()
    assert(out.length == 2)
    assert(out.forall(_.getDouble(3) == 1.0)) // 1/sqrt(1*1)
    intercept[IllegalArgumentException] {
      ItemSim.cosineNeighbors(ui, maxUserItems = 1)
    }
  }

  test("cosineNeighbors: topN cuts by sim desc then neighbor asc") {
    // item X co-occurs with Y (2 shared) and Z (1 shared of 1-user set)
    val ui = Seq((1L, "X"), (1L, "Y"), (2L, "X"), (2L, "Y"), (3L, "X"),
      (3L, "Z")).toDF("user_id", "item_id")
    val ranks = ItemSim.cosineNeighbors(ui, minCo = 1L, topN = 1)
      .where($"item" === "X").collect()
    assert(ranks.length == 1)
    // sim(X,Y) = 2/sqrt(3*2) = .8165 > sim(X,Z) = 1/sqrt(3*1) = .577
    assert(ranks.head.getString(1) == "Y")
  }

  test("cosineNeighborsIncremental == full rebuild: randomized, " +
      "joint-threshold pairs, cap flips") {
    // deterministic pseudo-random interactions; the delta adds items
    // to EXISTING users (re-pairing their history), brand-new users,
    // and pushes one user over the cap
    val old = (0 until 120).map { i =>
      ((i * 13) % 12L, "i" + ((i * 29) % 15)) }
    val dlt = (0 until 60).map { i =>
      ((i * 7) % 14L, "i" + ((i * 31) % 15)) }
    val oldDf = old.toDF("user_id", "item_id")
    val dltDf = dlt.toDF("user_id", "item_id")
    for ((cap, minCo) <- Seq((100, 2L), (8, 1L), (6, 3L))) {
      val full = graft.operators.ItemSim.cosineNeighbors(
        oldDf.unionByName(dltDf), maxUserItems = cap, minCo = minCo)
        .collect().map(_.toSeq).toSet
      val inc = graft.operators.ItemSim.cosineNeighborsIncremental(
        oldDf, dltDf, maxUserItems = cap, minCo = minCo)
        .collect().map(_.toSeq).toSet
      assert(inc == full, s"divergence at cap=$cap minCo=$minCo")
    }
    // a pair clearing minCo only JOINTLY (one old user, one delta
    // user) must survive — the reason both branches count at 1
    val o2 = Seq((1L, "a"), (1L, "b")).toDF("user_id", "item_id")
    val d2 = Seq((2L, "a"), (2L, "b")).toDF("user_id", "item_id")
    val joint = graft.operators.ItemSim.cosineNeighborsIncremental(
      o2, d2, minCo = 2L).collect()
    assert(joint.length == 2) // (a,b) co=2 survives, both directions
    assert(joint.forall(_.getLong(2) == 2L))
  }

  test("cosineNeighborsFromState: persisted-state maintenance equals " +
      "rebuild (cap flip, new user, support drop)") {
    // user 2's delta pushes it over cap 4 (flip: its old pairs must be
    // SUBTRACTED and nothing added); user 4 is brand-new; item c's
    // only capped supporter is user 2, so c's support drops to zero
    val oldDf = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "c"),
      (3L, "a"), (3L, "b")).toDF("user_id", "item_id")
    val dltDf = Seq((2L, "b"), (2L, "d"), (2L, "e"), (4L, "a"),
      (4L, "b")).toDF("user_id", "item_id")
    val (pairs, sup) = ItemSim.pairCountState(oldDf, maxUserItems = 4)
    val viaState = ItemSim.cosineNeighborsFromState(pairs, sup,
        oldDf, dltDf, maxUserItems = 4, minCo = 1L)
      .collect().map(_.toSeq).toSet
    val rebuild = ItemSim.cosineNeighbors(oldDf.unionByName(dltDf),
        maxUserItems = 4, minCo = 1L)
      .collect().map(_.toSeq).toSet
    assert(viaState == rebuild)
    assert(!viaState.exists(_.contains("c"))) // c supported only by
    // the cap-flipped user: its pairs and support must vanish
  }

  test("catalogMetrics: coverage, novelty smoothing, exposure bias") {
    // catalog {A,B,C,D} (4 items), users {1,2}; recs: top-1 per user
    val inter = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "C"),
      (1L, "D")).toDF("user_id", "item_id")
    val recs = Seq((1L, "A", 1), (2L, "Z", 1))
      .toDF("user_id", "item_id", "rank")
    val r = RankEval.catalogMetrics(recs, inter, 1).collect().head
    assert(r.getAs[Long]("catalog_size") == 4)
    assert(r.getAs[Long]("n_users") == 2)
    assert(r.getAs[Long]("n_rec_items") == 2)
    assert(r.getAs[Double]("coverage") == 0.5)
    // pops: A = 2/2 = 1.0, Z = 0 -> avg 0.5
    assert(r.getAs[Double]("avg_popularity") == 0.5)
    // novelty: -log2(3/3) = 0 for A; -log2(1/3) for Z (smoothed)
    val exp = (0.0 + math.log(3.0) / math.log(2.0)) / 2.0
    assert(math.abs(r.getAs[Double]("novelty") - exp) < 1e-6)
  }

  test("bfsDistances: hop distances, horizon cut, unreached absent") {
    // path graph 1-2-3-4-5 plus isolated edge 8-9; seed {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("s")
    val d = Graph.bfsDistances(edges, "src", "dst", seeds, "s", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 5: 4 hops
  }

  test("personalizedPageRank: seed restart, mass conservation, zeros") {
    import graft.operators.Graph
    // symmetrized path 1-2-3, seed {1}, d = 0.5:
    // r1 = [.5, .5, 0]; r2 = [.625, .25, .125]
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("s")
    val r = Graph.personalizedPageRank(edges, "src", "dst", seeds, "s",
        iters = 2, damping = 0.5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 0.625, 2L -> 0.25, 3L -> 0.125))
    // unreached node stays exactly 0.0
    val e2 = edges.unionByName(Seq((8L, 9L), (9L, 8L)).toDF("src", "dst"))
    val r2 = Graph.personalizedPageRank(e2, "src", "dst", seeds, "s",
        iters = 2, damping = 0.5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r2(8L) == 0.0 && r2(9L) == 0.0)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, "src", "dst",
        Seq(99L).toDF("s"), "s", iters = 1)
    }
  }

  test("bfsDistances: multi-seed takes the nearer seed; undirected") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("s")
    val d = Graph.bfsDistances(edges, "src", "dst", seeds, "s", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 is 2 hops from both; 2 is 1 from seed 1; 4 is 1 from seed 5
    assert(d == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }
}
