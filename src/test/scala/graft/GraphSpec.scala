package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Graph}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Double)].collect().toMap

  test("pageRank: symmetric 2-cycle is stationary at 1/N") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    for (iters <- Seq(1, 3)) {
      val r = ranks(Graph.pageRank(edges, "src", "dst", iters))
      assert(r(1L) == 0.5 && r(2L) == 0.5, s"iters=$iters: $r")
    }
  }

  test("pageRank: hand-computed asymmetric triangle after one iteration") {
    // c->a, a->b, b->a: every node has an out-edge, c has no in-edge.
    val edges = Seq((3L, 1L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = ranks(Graph.pageRank(edges, "src", "dst", iters = 1))
    val base = (1.0 - 0.85) / 3 // the operator's own fold order
    assert(math.abs(r(1L) - (base + 0.85 * (2.0 / 3))) < 1e-12)
    assert(math.abs(r(2L) - (base + 0.85 * (1.0 / 3))) < 1e-12)
    assert(r(3L) == base) // no in-edges: exactly the floor
    assert(math.abs(r.values.sum - 1.0) < 1e-12) // no dangling leakage
  }

  test("pageRank weighted: equal weights match uniform; bias follows w") {
    val edges = Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0),
      (1L, 3L, 1.0)).toDF("src", "dst", "w")
    val uni = ranks(Graph.pageRank(edges, "src", "dst", iters = 3))
    val eq = ranks(Graph.pageRank(edges, "src", "dst", iters = 3,
      weightCol = Some("w")))
    uni.foreach { case (k, v) => assert(math.abs(eq(k) - v) < 1e-12) }
    // tilt 1's out-mass toward 2: rank(2) must rise above rank(3)
    val tilted = Seq((1L, 2L, 0.9), (1L, 3L, 0.1), (2L, 1L, 1.0),
      (3L, 1L, 1.0)).toDF("src", "dst", "w")
    val t = ranks(Graph.pageRank(tilted, "src", "dst", iters = 3,
      weightCol = Some("w")))
    assert(t(2L) > t(3L))
    assert(math.abs(t.values.sum - 1.0) < 1e-9)
    // negative weights clamp to non-edges: an all-negative src is
    // dangling (contributes nothing) but still holds its floor rank
    val neg = Seq((1L, 2L, 1.0), (2L, 1L, -0.5)).toDF("src", "dst", "w")
    val rn = ranks(Graph.pageRank(neg, "src", "dst", iters = 1,
      weightCol = Some("w")))
    assert(rn(1L) == (1.0 - 0.85) / 2) // nothing flows back to 1
    assert(rn(2L) == (1.0 - 0.85) / 2 + 0.85 * 0.5)
  }

  test("labelPropagation: disjoint triangles converge to their min ids") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val l = Graph.labelPropagation(edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(l == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("labelPropagation: mode outvotes min; sync replay is exact") {
    // Hand-replayed synchronous updates. iter1 labels are always
    // min-of-neighbors (initial labels are distinct ids, every count
    // is 1); the mode only becomes decisive from iter2 on.
    val edges = Seq((60L, 8L), (60L, 9L), (60L, 2L),
      (8L, 7L), (9L, 7L), (2L, 3L)).toDF("src", "dst")
    val l1 = Graph.labelPropagation(edges, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(l1 == Map(60L -> 2L, 8L -> 7L, 9L -> 7L, 2L -> 3L,
      7L -> 8L, 3L -> 2L))
    val l2 = Graph.labelPropagation(edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    // iter2 at node 60: neighbor labels {8->7, 9->7, 2->3} -- label 7
    // counts 2 and OUTVOTES the smaller singleton label 3.
    assert(l2(60L) == 7L)
  }

  test("labelPropagation: deterministic under repartitioning") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val edges = Ann.knnGraph(e, kG = 4, nCells = 16)
    val a = Graph.labelPropagation(edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    val b = Graph.labelPropagation(edges.repartition(13), "src", "dst",
      iters = 2).as[(Long, Long)].collect().toMap
    assert(a == b)
    // every node got a label, labels are node ids
    assert(a.values.toSet.subsetOf(a.keySet))
  }

  test("triangleCount: K3, K4, square, star — counts and coefficients") {
    def tri(edges: org.apache.spark.sql.DataFrame) =
      Graph.triangleCount(edges, "src", "dst")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // triangle: every node in 1 triangle, coef 1
    val k3 = tri(Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))
    assert(k3 == Map(1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
      3L -> ((2L, 1L, 1.0))))
    // K4: each node deg 3, in 3 triangles, coef 2*3/(3*2) = 1
    val k4 = tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("src", "dst"))
    k4.foreach { case (n, (d, t, c)) =>
      assert(d == 3L && t == 3L && c == 1.0, s"$n -> ($d,$t,$c)")
    }
    // square: no triangles anywhere
    val sq = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst"))
    sq.foreach { case (n, (d, t, c)) =>
      assert(d == 2L && t == 0L && c == 0.0, s"$n -> ($d,$t,$c)")
    }
    // star: hub has degree 3 but zero closure; leaves deg 1 -> coef 0
    val st = tri(Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("src", "dst"))
    assert(st(9L) == ((3L, 0L, 0.0)) && st(1L) == ((1L, 0L, 0.0)))
  }

  test("triangleCount over knnGraph: brute global count, determinism") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val edges = Ann.knnGraph(e, kG = 4, nCells = 16)
    val out = Graph.triangleCount(edges, "src", "dst")
    // brute: symmetrized adjacency cubed over node triples / 6
    val e0 = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    val und = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst"))).distinct()
    val brute = und.as("x")
      .join(und.as("y"), col("x.dst") === col("y.src"))
      .join(und.as("z"), col("y.dst") === col("z.src") &&
        col("z.dst") === col("x.src"))
      .count() / 6
    val total = out.agg(sum("n_tri")).as[Long].head()
    assert(total == 3 * brute, s"per-node sum $total vs brute $brute")
    val again = Graph.triangleCount(edges.repartition(13), "src", "dst")
    assert(out.orderBy("node").collect().toSeq ==
      again.orderBy("node").collect().toSeq)
  }

  test("pageRank over knnGraph: mass conserved, deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val edges = Ann.knnGraph(e, kG = 4, nCells = 16)
    val r = ranks(Graph.pageRank(edges, "src", "dst", iters = 2))
    // mirrored edge list: every node keeps out-edges, so total mass
    // stays 1 up to the decimal(30,15) contribution truncation
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"sum=${r.values.sum}")
    val r2 = ranks(Graph.pageRank(edges.repartition(13), "src", "dst",
      iters = 2))
    assert(r == r2) // decimal sums: partitioning cannot move a bit
  }
}
