package graft.queries

import graft.SparkSuite

/** Iterative-graph guards: the properties that keep PageRank viable at
  * scale — constant plan size across iterations (lineage truncation)
  * and bit-exact determinism (integer micro-unit arithmetic). */
class GraphSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("plan size stays constant in the iteration count") {
    // without localCheckpoint each round, the plan doubles per iteration
    // (the join references the previous round's frame) and analysis cost
    // explodes long before the data does
    val p3 = Graph.pageRank(spark, sf, iters = 3)
      .queryExecution.executedPlan.toString()
    val p6 = Graph.pageRank(spark, sf, iters = 6)
      .queryExecution.executedPlan.toString()
    assert(p6.length < p3.length * 2,
      s"plan grows with iterations: ${p3.length} -> ${p6.length} chars")
  }

  test("ranks are bit-exact across runs and sane") {
    import spark.implicits._
    val r1 = Graph.pageRank(spark, sf).as[(Long, Long)].collect().toSeq
    val r2 = Graph.pageRank(spark, sf).as[(Long, Long)].collect().toSeq
    assert(r1 == r2, "integer PageRank must be run-deterministic")
    // every node retains the teleport floor; total mass is bounded by
    // the node count (flooring only ever drops mass)
    assert(r1.forall(_._2 >= 150000L))
    assert(r1.map(_._2).sum <= r1.size * 1000000L)
    // suppliers (degree ~ customers/supplier) outrank the average
    // customer node in this bipartite trade graph
    val (sup, cust) = r1.partition(_._1 < (1L << 40))
    val avgSup = sup.map(_._2).sum / sup.size
    val avgCust = cust.map(_._2).sum / cust.size
    assert(avgSup > avgCust,
      s"hub nodes should concentrate rank: sup=$avgSup cust=$avgCust")
  }

  test("triangle count: degree-oriented ≡ naive wedge count, full graph") {
    import org.apache.spark.sql.functions._
    // orientation independence — the property the scale plan rests on:
    // count the same FULL sf0.001 co-purchase graph with the naive
    // p1<p2 orientation and require equality with the degree-ordered
    // plan (plus the DuckDB-computed absolute pin)
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
    val e = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").cast("long").as("p1"),
        col("b.l_partkey").cast("long").as("p2"))
      .distinct().localCheckpoint()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.p2") === col("e2.p1"))
      .join(e.as("e3"), col("e3.p1") === col("e1.p1") &&
        col("e3.p2") === col("e2.p2"))
      .count()
    val r = Graph.triangleCount(spark, sf).collect().head
    assert(r.getLong(0) == naive,
      s"degree-oriented ${r.getLong(0)} != naive $naive")
    assert((r.getLong(0), r.getLong(1)) == (125968L, 8899L),
      s"sf0.001 full-graph pin moved: $r")
  }

  test("k-core ≡ single-threaded peeler; cores nest") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // rebuild the trade edges locally and peel to fixpoint — the
    // reference the distributed loop must match node-for-node
    val pairs = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").cast("long").as("s"),
        (col("o_custkey") + (1L << 40)).cast("long").as("c"))
      .distinct().as[(Long, Long)].collect()
    def peel(k: Int): Map[Long, Int] = {
      var edges = pairs.flatMap(p => Seq(p, p.swap)).toSet
      var changed = true
      while (changed) {
        val deg = edges.toSeq.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val e2 = edges.filter(e => keep(e._1) && keep(e._2))
        changed = e2.size != edges.size
        edges = e2
      }
      edges.toSeq.groupBy(_._1).view.mapValues(_.size).toMap
    }
    val want10 = peel(10)
    val got10 = Graph.kCore(spark, sf, k = 10)
      .as[(Long, Long)].collect().map(r => r._1 -> r._2.toInt).toMap
    assert(got10 == want10,
      s"k=10 core diverged: ${got10.size} vs ${want10.size} nodes")
    // nesting: the 12-core's nodes are a subset of the 10-core's
    val got12 = Graph.kCore(spark, sf, k = 12)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(got12.subsetOf(got10.keySet), "core(12) ⊄ core(10)")
    assert(got10.nonEmpty && got10.values.min >= 10,
      "a surviving node dropped below k within the core")
    // the unrolled-CTE oracle is exact only while the true peel depth
    // stays inside its 8 rounds — pin the margin: the fixpoint (which
    // kCore requires) must arrive within 8 rounds, or this fails
    // loudly before the driver's hash compare would
    Graph.kCore(spark, sf, k = 10, maxIters = 8).count()
  }

  test("personalized PageRank concentrates mass around the seed set") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val offset = 1L << 40
    def isSeed(n: Long) = n < offset && n % 10 == 0
    val ppr = Graph.queries("q_pagerank_personalized")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val global = Graph.queries("q_pagerank")(spark, sf)
      .as[(Long, Long)].collect().toMap
    // same node universe, exact determinism across runs
    assert(ppr.map(_._1).toSet == global.keySet)
    val again = Graph.queries("q_pagerank_personalized")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(again == ppr)
    // teleport lands only on seeds: seeds' MEAN rank dominates the
    // OTHER SUPPLIERS' (the like-for-like pool — suppliers as a class
    // outrank customers in the global walk too, since the supplier key
    // space is far smaller, so the vacuity guard compares suppliers
    // against suppliers)
    val sup = ppr.filter(_._1 < offset)
    val (seeds, rest) = sup.partition(r => isSeed(r._1))
    assert(seeds.nonEmpty && rest.nonEmpty)
    def mean(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    assert(mean(seeds.map(_._2)) > 2 * mean(rest.map(_._2)),
      "seed mass does not dominate — teleport leaked")
    val gSup = global.filter(_._1 < offset)
    val gSeeds = gSup.filter(kv => isSeed(kv._1)).values.toSeq
    val gRest = gSup.filterNot(kv => isSeed(kv._1)).values.toSeq
    assert(mean(gSeeds) < 2 * mean(gRest),
      "global walk already favors seeds — the pin would be vacuous")
    // total PPR mass stays below the global walk's (teleport is seeds-only)
    assert(ppr.map(_._2).sum < global.values.sum)
  }

  test("label propagation ≡ single-threaded reference; communities sane") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = Graph.labelPropagation(spark, sf)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // single-threaded reference: same synchronous min-tie-break LPA
    // over the collected edge list
    val rawEdges = {
      import org.apache.spark.sql.functions._
      graft.Tables.lineitem(spark, sf)
        .join(graft.Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("s"),
          (col("o_custkey") + (1L << 40)).cast("long").as("c"))
        .distinct().as[(Long, Long)].collect()
    }
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
      .withDefaultValue(Nil)
    rawEdges.foreach { case (s, c) =>
      adj(s) = c :: adj(s); adj(c) = s :: adj(c)
    }
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      labels = adj.keys.map { n =>
        val freq = adj(n).groupBy(labels).view.mapValues(_.size)
        n -> freq.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }.toMap
    }
    val want = labels.toSeq.sortBy(_._1)
    assert(got == want,
      s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // communities are real: fewer labels than nodes, more than one
    val nLabels = got.map(_._2).distinct.size
    assert(nLabels > 1 && nLabels < got.size,
      s"$nLabels communities over ${got.size} nodes")
  }

  test("co-purchase LPA ≡ reference; communities non-degenerate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = Graph.copurchaseCommunities(spark, sf)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // single-threaded reference over the same co-purchase edges
    val li = graft.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 30.0)
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").cast("long"),
        col("b.l_partkey").cast("long"))
      .distinct().as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
      .withDefaultValue(Nil)
    pairs.foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      labels = adj.keys.map { n =>
        val freq = adj(n).groupBy(labels).view.mapValues(_.size)
        n -> freq.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }.toMap
    }
    assert(got == labels.toSeq.sortBy(_._1))
    // the order-clique structure yields REAL communities at realistic
    // density — sf0.001's 200-node graph is still clique-soup and
    // collapses like the trade graph, so the non-degeneracy pin runs
    // at sf0.01 (68 communities over 2000 nodes when written)
    val big = Graph.copurchaseCommunities(spark, "/root/testdata/sf0.01")
      .select("label").distinct().count()
    assert(big >= 10, s"co-purchase communities degenerate at sf0.01: $big")
  }

  test("modularity ≡ single-threaded reference; regimes measured") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // single-threaded modularity over collected (edges, labels), exact
    // BigInt arithmetic mirroring the micro-unit DIV-shift
    def reference(edges: Seq[(Long, Long)], labels: Map[Long, Long])
        : Map[Long, (Long, Long, Long, Long)] = {
      val m2 = BigInt(edges.size)
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val byL = labels.groupBy(_._2)
      byL.map { case (l, members) =>
        val nodes = members.keys.toSet
        val degSum = nodes.toSeq.map(deg.getOrElse(_, 0L)).sum
        val in = edges.count(e =>
          labels(e._1) == l && labels(e._2) == l).toLong
        val num = BigInt(in) * m2 - BigInt(degSum) * degSum + m2 * m2
        val modU = (num * 1000000 / (m2 * m2) - 1000000).toLong
        l -> (nodes.size.toLong, degSum, in, modU)
      }
    }
    def check(gotDf: org.apache.spark.sql.DataFrame,
        edges: Seq[(Long, Long)], labels: Map[Long, Long]): Long = {
      val got = gotDf.as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
      val want = reference(edges, labels)
      assert(got == want, s"got=$got\nwant=$want")
      got.values.map(_._4).sum
    }
    // the dense trade graph: synchronous LPA 2-cycles onto the exact
    // BIPARTITION (suppliers vs customers) — zero intra edges, total
    // Q = −½, the theoretical minimum. The r14 honesty note is now a
    // measured number.
    val tradeEdges = {
      val raw = graft.Tables.lineitem(spark, sf)
        .join(graft.Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").cast("long"),
          (col("o_custkey") + (1L << 40)).cast("long"))
        .distinct().as[(Long, Long)].collect().toSeq
      raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    }
    val tradeLabels = Graph.labelPropagation(spark, sf)
      .as[(Long, Long)].collect().toMap
    val tradeQ = check(Graph.communitiesQuality(spark, sf),
      tradeEdges, tradeLabels)
    assert(tradeQ == -500000L,
      s"dense-regime bipartition should score Q = −½: $tradeQ")
    // the sparse co-purchase graph (sf0.01, where structure is real —
    // 68 communities): positive modularity, the other regime
    val sf01 = "/root/testdata/sf0.01"
    val cpEdges = {
      val li = graft.Tables.lineitem(spark, sf01)
        .filter(col("l_quantity") > 30.0)
        .select(col("l_orderkey"), col("l_partkey"))
      val p = li.as("a")
        .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").cast("long"),
          col("b.l_partkey").cast("long"))
        .distinct().as[(Long, Long)].collect().toSeq
      p.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    }
    val cpEdgesDf = cpEdges.toDF("src", "dst").localCheckpoint()
    val cpLabels = Graph.labelPropagationOn(cpEdgesDf, 4)
      .as[(Long, Long)].collect().toMap
    val cpQ = check(Graph.modularityOn(cpEdgesDf,
        cpLabels.toSeq.toDF("node", "label")),
      cpEdges, cpLabels)
    assert(cpQ > 0L && cpQ > tradeQ,
      s"sparse regime should beat the bipartition: cp=$cpQ trade=$tradeQ")
  }

  test("hop distance ≡ single-threaded BFS; bounded-hop contract") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // chain 1-2-3-4-5-6 (symmetrized) plus a component {10,11} the
    // seed can't reach, and a shortcut 1-4 that must win over the
    // 3-hop chain path — layers and unreachability both exercised
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L), (10L, 11L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.hopDistanceOn(edges, maxHops = 4,
      seed = col("node") === 1L)
      .as[(Long, Long)].collect().toMap
    // single-threaded BFS on the same adjacency
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var want = Map(1L -> 0L)
    var frontier = Set(1L)
    (1 to 4).foreach { h =>
      frontier = frontier.flatMap(adj.getOrElse(_, Nil))
        .filterNot(want.contains)
      want ++= frontier.map(_ -> h.toLong)
    }
    assert(got == want, s"got=$got\nwant=$want")
    // the shortcut won: 5 is 2 hops (1-4-5), not 4 via the chain
    assert(got(5L) == 2L && got(4L) == 1L)
    // unreachable component absent — the bounded-reachability contract
    assert(!got.contains(10L) && !got.contains(11L))
    // hop truncation: maxHops=1 keeps only the seed and its neighbors
    val near = Graph.hopDistanceOn(edges, maxHops = 1,
      seed = col("node") === 1L).as[(Long, Long)].collect().toMap
    assert(near == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("shortest cost ≡ single-threaded Bellman-Ford; cheap beats short") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // direct 1→4 costs 10; the 3-edge detour 1-2-3-4 costs 3 — the
    // min-plus relaxation must prefer the CHEAP path over the SHORT
    // one; {10,11} unreachable; symmetrized
    val und = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 4L, 1L), (10L, 11L, 5L))
    val edges = und.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .toDF("src", "dst", "cost_u")
    val got = Graph.shortestCostOn(edges, maxHops = 4,
      seed = col("node") === 1L)
      .as[(Long, Long)].collect().toMap
    // single-threaded Bellman-Ford, 4 relaxation rounds
    val dir = und.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
    var want = Map(1L -> 0L)
    (1 to 4).foreach { _ =>
      val relaxed = dir.flatMap { case (u, v, c) =>
        want.get(u).map(du => v -> (du + c)) }
      want = (want.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    assert(got == want, s"got=$got\nwant=$want")
    assert(got(4L) == 3L, "the cheap 3-edge path lost to the direct edge")
    assert(!got.contains(10L) && !got.contains(11L))
    // the Bellman-Ford invariant: after ONE round, only ≤1-edge paths
    val one = Graph.shortestCostOn(edges, maxHops = 1,
      seed = col("node") === 1L).as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
  }

  test("link prediction ≡ single-threaded reference; hub cap live") {
    import spark.implicits._
    // z=1 (deg 3) creates wedges among {2,3,4}; hub 100 (deg 5 > cap 3)
    // is EXCLUDED as an intermediary, so (5,6) — common neighbor = hub
    // only — must be absent, and cn/ra for {2,3,4} pairs count z=1 only.
    // (2,3) is an existing edge → excluded by non-adjacency.
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 100L), (3L, 100L), (4L, 100L), (5L, 100L), (6L, 100L))
    val cap = 3L
    val pairs = und.toDF("p1", "p2")
    val got = Graph.linkPredictionOn(pairs, cap, topK = 100)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // single-threaded reference over the same definition
    val adjAll = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adjAll.view.mapValues(_.size.toLong).toMap
    val existing = und.toSet
    val want = (for {
      (z, nbrs) <- adjAll.toSeq if deg(z) <= cap
      u <- nbrs; v <- nbrs if u < v
    } yield ((u, v), 1000000L / deg(z)))
      .groupBy(_._1).view
      .mapValues(ws => (ws.size.toLong, ws.map(_._2).sum)).toSeq
      .collect { case ((u, v), (cn, ra)) if !existing((u, v)) =>
        (u, v, cn, ra, cn * 1000000L / (deg(u) + deg(v) - cn)) }
      .sortBy { case (u, v, cn, ra, _) => (-ra, -cn, u, v) }
    assert(got == want, s"got=$got\nwant=$want")
    // the hub-only pair is absent; the adjacent pair is absent
    assert(!got.exists(r => r._1 == 5L && r._2 == 6L))
    assert(!got.exists(r => r._1 == 2L && r._2 == 3L))
    // spot-check the exact micro-unit arithmetic for (2,4):
    // cn=1 via z=1 (deg 3): ra = 333333; jac = 1e6 div (3+2-1) = 250000
    assert(got.find(r => r._1 == 2L && r._2 == 4L)
      .contains((2L, 4L, 1L, 333333L, 250000L)))
  }

  test("PPR teleport reaches an in-degree-0 seed (textbook semantics)") {
    import spark.implicits._
    // 1 → 2 → 3 → 2: seed node 1 has out-edges but NO in-edges — the
    // case the symmetrized trade graph cannot exhibit. Before the r14
    // fix the seed dropped out of next-round membership (defined by
    // the in-mass aggregation) and lost its teleport share.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val ranks = Graph.pageRankOn(edges, iters = 3, personalized = true,
      seed = org.apache.spark.sql.functions.col("node") === 1L)
      .as[(Long, Long)].collect().toMap
    // no in-mass ever: pr(seed) is exactly its teleport share
    assert(ranks.get(1L).contains(150000L),
      s"isolated seed lost its teleport mass: $ranks")
    // and the seed's mass flows downstream (node 2 receives it)
    assert(ranks(2L) > 150000L, s"seed mass did not propagate: $ranks")
  }

  test("LPA hub-split path ≡ plain path on a skewed graph (r19 gate)") {
    import spark.implicits._
    // hub node 1 touches every node 2..41 (degree 40); the rest is two
    // 5-cliques — a power-law-ish dst profile. With the gate thresholds
    // forced low the hub keys route through the broadcast branch; the
    // assignment must be IDENTICAL to the plain (ungated) loop.
    val clique = (a: Long) =>
      for (i <- a until a + 5; j <- a until a + 5 if i < j) yield (i, j)
    val und = (2L to 41L).map(n => (1L, n)) ++ clique(50L) ++ clique(60L)
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst").localCheckpoint()
    val plain = Graph.labelPropagationOn(edges, 4)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // floor 1, factor 1: every node above one average partition's
    // share of rows splits — on 4 shuffle partitions that is the hub
    val split = Graph.labelPropagationOn(edges, 4,
      hotDegFactor = 1L, hotDegFloor = 1L)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(split == plain,
      s"first diff: ${split.zip(plain).find(p => p._1 != p._2)}")
    // and the gate really was live: the hub's degree (40) exceeds the
    // cut the params force (sanity that the hot branch actually ran)
    val m = edges.count()
    assert(40L > math.max(1L, 1L * m / spark.conf
      .get("spark.sql.shuffle.partitions").toInt),
      "test graph no longer trips the forced gate")
  }
}
