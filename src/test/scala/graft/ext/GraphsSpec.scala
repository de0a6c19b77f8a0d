package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Scale = 1000000000L

  /** Ring: i -> (i+1) mod n. Out-degree 1 everywhere, in-degree 1
    * everywhere, so damped PR has the EXACT integer fixed point r = scale:
    * base (0.15*scale) + 85 * scale div 100 (0.85*scale) = scale, no
    * truncation loss anywhere. Pins both the recurrence constants and the
    * zero-loss arithmetic path. */
  test("ring graph is an exact integer fixed point at r = scale") {
    val n = 20
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val out = Graphs.pageRank(nodes, edges, iters = 5).collect()
    assert(out.length == n)
    assert(out.forall(_.getLong(1) == Scale))
  }

  test("checkpointed iteration is bit-identical to unchecked lineage") {
    val nodes = (0L until 60L).toDF("id")
    // irregular graph: md5-free but deterministic — i links to (i*7+1)%60
    // and (i*13+5)%60 (multi-edge collisions possible, kept)
    val edges = (0L until 60L)
      .flatMap(i => Seq((i, (i * 7 + 1) % 60), (i, (i * 13 + 5) % 60)))
      .toDF("src", "dst")
    val plain = Graphs.pageRank(nodes, edges, iters = 6)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ckpt = Graphs.pageRank(nodes, edges, iters = 6, checkpointEvery = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(plain.sameElements(ckpt))
  }

  test("mass is conserved up to deterministic truncation loss") {
    val n = 100L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n)
      .flatMap(i => Seq((i, (i * 3 + 1) % n), (i, (i * 11 + 2) % n), (i, (i * 17 + 7) % n)))
      .toDF("src", "dst")
    val total = Graphs.pageRank(nodes, edges, iters = 5)
      .agg(sum($"r")).collect().head.getLong(0)
    val exact = n * Scale
    // per iteration the integer divs lose < 1 unit per edge (3n) plus
    // < 1 unit per node from the damping div — bound 5 * 4n, plus slack
    assert(total <= exact)
    assert(exact - total < 5 * 4 * n * 2)
  }

  test("converged loop stops immediately at an exact fixed point") {
    val n = 20
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    // ring: iteration 1 reproduces r = scale exactly, so delta = 0
    val (ranks, iters) = Graphs.pageRankConverged(nodes, edges, maxIters = 30)
    assert(iters == 1)
    assert(ranks.collect().forall(_.getLong(1) == Scale))
  }

  test("converged ranks agree with a deep fixed-count run") {
    val nodes = (0L until 80L).toDF("id")
    val edges = (0L until 80L)
      .flatMap(i => Seq((i, (i * 7 + 1) % 80), (i, (i * 13 + 5) % 80), (i, 0L)))
      .toDF("src", "dst")
    val tol = 1000L
    val (conv, iters) = Graphs.pageRankConverged(nodes, edges,
      maxIters = 50, tolPerNode = tol)
    assert(iters > 1 && iters < 50) // genuinely iterated, genuinely stopped
    val deep = Graphs.pageRank(nodes, edges, iters = 60)
    val totalDiff = conv.as("c").join(deep.as("d"), $"c.id" === $"d.id")
      .agg(sum(abs($"c.r" - $"d.r"))).head().getLong(0)
    // damping contracts by 0.85/step: distance to fixpoint at stop is
    // <= 5.7x the stop delta (<= tol * n); allow that plus slack
    assert(totalDiff <= 10 * tol * 80)
  }

  test("warm start converges to the bit-identical fixed point") {
    val nodes = (0L until 80L).toDF("id")
    val edges = (0L until 80L)
      .flatMap(i => Seq((i, (i * 7 + 1) % 80), (i, (i * 13 + 5) % 80), (i, 0L)))
      .toDF("src", "dst")
    // converge on the base graph, then land a "micro-batch" of new edges
    // and re-converge cold vs warm. tolPerNode = 0 drives both loops to a
    // TRUE integer fixed point (delta == 0), where the contraction's
    // unique-fixed-point argument becomes a bit-equality obligation —
    // warm start may change the iteration count, never the answer.
    val (ranks0, _) = Graphs.pageRankConverged(nodes, edges,
      maxIters = 200, tolPerNode = 0L)
    val updated = edges.unionByName(
      (0L until 80L by 8L).map(i => (i, (i * 3 + 11) % 80)).toDF("src", "dst"))
    val (cold, coldIters) = Graphs.pageRankConverged(nodes, updated,
      maxIters = 200, tolPerNode = 0L)
    val (warm, warmIters) = Graphs.pageRankConverged(nodes, updated,
      maxIters = 200, tolPerNode = 0L, init = Some(ranks0))
    assert(coldIters < 200 && warmIters < 200) // both genuinely converged
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(cold) == rows(warm))
    // warm start from the neighboring fixed point must not be SLOWER
    assert(warmIters <= coldIters)
  }

  test("warm start: ids missing from init enter at uniform scale (cold prior)") {
    val n = 20
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    // ring fixed point is r = scale everywhere; an init covering only half
    // the ids must backfill the rest at `scale` — so iteration 1 sees the
    // exact fixed point and stops (any other backfill would perturb it)
    val half = (0L until n.toLong by 2L).map(i => (i, Scale)).toDF("id", "r")
    val (ranks, iters) = Graphs.pageRankConverged(nodes, edges,
      maxIters = 30, init = Some(half))
    assert(iters == 1)
    assert(ranks.collect().forall(_.getLong(1) == Scale))
  }

  test("k-out-regular limit cycle: detected, canonicalized, start-independent") {
    // The limit-cycle counterexample class from the GraphStream scaladoc
    // caveat (r13/r14 verdicts), reproduced here with the construction
    // that actually cycles on re-measurement: a 1500-node 1-OUT-regular
    // xxhash functional graph (seed 1) never reaches delta == 0 —
    // truncation noise circulates forever because every node has
    // identical out-degree and no hub absorbs it (detection fires at
    // iteration ~155; several 2-out seed pairs probed at this size turn
    // out to CONVERGE in 59-73 iterations, so the honest minimal trap is
    // the functional graph). pageRankCanonical must (a) detect the
    // repeat instead of spinning to maxIters, and (b) return the cycle's
    // canonical member as a pure function of the attractor — so a COLD
    // uniform start and a deliberately DIFFERENT warm start produce the
    // same bytes. This was the one caveat on GraphStream's cold ≡ warm
    // contract; this test turns it into a passing case.
    val n = 1500L
    val nodes = spark.range(n).toDF("id")
    def graph(sd: Int) = spark.range(n)
      .select($"id".as("src"), pmod(xxhash64($"id", lit(sd)), lit(n)).as("dst"))
    val edges = graph(1)

    val (cold, coldIters, coldStatus) =
      Graphs.pageRankCanonical(nodes, edges, maxIters = 300)
    assert(coldStatus == Graphs.StatusCycle,
      s"expected the counterexample to limit-cycle, got $coldStatus after $coldIters")

    // a genuinely different start: 10 fixed-count iterations on a
    // DIFFERENT functional graph — far from uniform, far from cold's
    // trajectory prefix
    val otherInit = Graphs.pageRank(nodes, graph(7), iters = 10)
    val (warm, _, warmStatus) =
      Graphs.pageRankCanonical(nodes, edges, maxIters = 300, init = Some(otherInit))
    assert(warmStatus == Graphs.StatusCycle)
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(cold) == rows(warm),
      "cold and warm canonical cycle states diverged")
  }

  test("bfsHops: path distances, multi-seed min, unreachable sentinel") {
    val nodes = (0L until 10L).toDF("id")
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val d1 = Graphs.bfsHops(nodes, edges, Seq(0L).toDF("id"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 to 4).forall(i => d1(i.toLong) == i.toLong))
    assert((5 to 9).forall(i => d1(i.toLong) == 999L)) // beyond the unroll
    // a second seed at 7 closes the tail; 5 and 6 stay unreachable from
    // BOTH seeds within 4 hops (directed chain, seed 0 is 5+ hops away)
    val d2 = Graphs.bfsHops(nodes, edges, Seq(0L, 7L).toDF("id"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2(7L) == 0L && d2(8L) == 1L && d2(9L) == 2L)
    assert(d2(4L) == 4L && d2(5L) == 999L && d2(6L) == 999L)
  }

  test("ssspWeighted: takes the cheaper multi-edge path, honors the unroll bound") {
    val nodes = (0L until 6L).toDF("id")
    // 0→1 (w=10) and 0→2→1 (w=1+1=2): the 2-hop path must win; 1→3 (w=5)
    // extends it; 4 unreachable; 5 reachable only by a 5-edge path —
    // beyond rounds=4, so it must hold the sentinel
    val edges = Seq(
      (0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 5L),
      (3L, 5L, 1L)).toDF("src", "dst", "w")
    val d = Graphs.ssspWeighted(nodes, edges, Seq(0L).toDF("id"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(0L) == 0L && d(2L) == 1L && d(1L) == 2L && d(3L) == 7L)
    assert(d(5L) == 8L) // 0→2→1→3→5 is 4 edges: inside the unroll
    assert(d(4L) == 999999L)
    // with a chain forcing 5 edges, the tail stays at the sentinel
    val chain = (0L until 5L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "w")
    val dc = Graphs.ssspWeighted(nodes, chain, Seq(0L).toDF("id"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dc(4L) == 4L && dc(5L) == 999999L)
  }

  test("ssspWeighted with unit weights equals bfsHops") {
    val nodes = (0L until 40L).toDF("id")
    val edges = (0L until 40L)
      .flatMap(i => Seq((i, (i * 7 + 1) % 40), (i, (i * 13 + 5) % 40)))
      .toDF("src", "dst")
    val seeds = Seq(0L, 17L).toDF("id")
    val bfs = Graphs.bfsHops(nodes, edges, seeds, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sssp = Graphs.ssspWeighted(nodes,
      edges.withColumn("w", org.apache.spark.sql.functions.lit(1L)),
      seeds, rounds = 4, inf = 999L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bfs == sssp)
  }

  test("kCorePeel: clique survives the 4-core, pendant chain peels away") {
    // 5-clique on 0..4 (degrees 4,4,4,4,5 with the chain) + chain 4-5-6
    val cl = for { i <- 0 until 5; j <- i + 1 until 5 } yield (i.toLong, j.toLong)
    val und = (cl ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val core = Graphs.kCorePeel(und, k = 4, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 drops 5 (deg 2) and 6 (deg 1); the clique's degrees are then
    // uniformly 4 and stable — the true 4-core, with chain edges gone
    assert(core.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(core.values.forall(_ == 4L))
    // rounds = 0 short-circuits to "degree >= k over the raw graph"
    val r0 = Graphs.kCorePeel(und, k = 4, rounds = 0).collect()
      .map(_.getLong(0)).toSet
    assert(r0 == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("composes with the near-dup graph: duplicated docs outrank isolated ones") {
    // the production composition: rank documents by centrality in the
    // MinHash duplicate graph (hub docs = heavily-cloned boilerplate).
    // Exact invariant: a node with NO inbound edges holds exactly the
    // base mass 0.15*scale after any >=1 iterations, so every doc outside
    // the dup graph pins to 150000000 and every doc inside exceeds it.
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 40)
    val cloned = base.unionByName(
      base.filter($"doc_id" < 10).select(($"doc_id" + 10000).as("doc_id"), $"text"))
    val pairs = graft.ext.MinHashDedup.candidatePairs(cloned, 32, 8)
      .filter($"est_jaccard" >= 0.9).select($"a", $"b")
    val edges = pairs.select($"a".as("src"), $"b".as("dst"))
      .unionByName(pairs.select($"b".as("src"), $"a".as("dst")))
    val nodes = cloned.select($"doc_id".as("id"))
    val ranks = Graphs.pageRank(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupIds = pairs.select($"a".as("id"))
      .unionByName(pairs.select($"b".as("id")))
      .distinct().as[Long].collect().toSet
    assert(dupIds.nonEmpty) // the planted clones must surface as pairs
    val isolated = ranks.filterNot { case (id, _) => dupIds(id) }
    assert(isolated.nonEmpty)
    assert(isolated.values.forall(_ == 150000000L))
    assert(dupIds.forall(id => ranks(id) > 150000000L))
  }

  test("personalized PageRank: unreachable nodes decay to exactly zero") {
    // two disjoint rings of 10; seeds live only in ring A. Ring B gets no
    // teleport mass and no inbound from A, so after >= enough iterations
    // its ranks shrink geometrically: r_{k+1} = 85 * r_k div 100. Ring A
    // holds all teleport mass: each seed's base is 15*scale*20/(100*5).
    val nodes = (0L until 20L).toDF("id")
    val ringA = (0L until 10L).map(i => (i, (i + 1) % 10))
    val ringB = (10L until 20L).map(i => (i, 10 + (i + 1) % 10))
    val edges = (ringA ++ ringB).toDF("src", "dst")
    val seeds = (0L until 5L).toDF("id")
    val ranks = Graphs.personalizedPageRank(nodes, edges, seeds, iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ring B: scale * 0.85^6 under integer truncation, identical for all
    val expB = (1 to 6).foldLeft(Scale)((r, _) => 85L * r / 100L)
    assert((10L until 20L).forall(ranks(_) == expB))
    // ring A carries strictly more than the decayed remnant everywhere
    assert((0L until 10L).forall(ranks(_) > expB))
    // teleport mass conservation on the seed side: each seed gets base
    // 15*scale*n_nodes/(100*n_seeds) = 0.6*scale every iteration
    val base = 15L * Scale * 20 / (100 * 5)
    assert(base == 600000000L)
    assert((0L until 5L).forall(ranks(_) >= base))
  }

  test("label propagation: disjoint cliques converge to their min id") {
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L).toDF("id")
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L)) ++ clique(Seq(10L, 11L, 12L)))
      .toDF("src", "dst")
    val labels = Graphs.labelPropagation(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L).forall(labels(_) == 0L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
  }

  test("label propagation: pairs converge (self-vote kills oscillation) and isolated nodes keep their label") {
    val nodes = (0L until 5L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val labels = Graphs.labelPropagation(nodes, edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(2L) == 2L && labels(3L) == 3L && labels(4L) == 4L)
    // without the self-vote the pair swaps labels every synchronous sweep
    // (period-2 oscillation); with it, node 1's tie {0, 1} breaks to 0 at
    // sweep 1 and the pair is stable thereafter
    assert(labels(0L) == 0L && labels(1L) == 0L)
  }

  test("orientByDegree: hot vertex gets zero out-edges; triangle count matches id orientation") {
    // planted skew: vertex h = n/2 touches every other vertex (star) PLUS
    // sparse background paths so triangles exist. In the id-oriented
    // wedge join (e1.v = e2.u) the hot MID-id vertex is the middle of
    // in(h) x out(h) ~ d^2/4 wedges; degree orientation ranks it LAST so
    // its out-degree is exactly 0 — the degeneracy bound this operator
    // exists for.
    val n = 40L
    val h = n / 2 // 20
    val star = (0L until n).filter(_ != h)
      .map(v => (math.min(v, h), math.max(v, h)))
    // paths among the leaves, away from h so no duplicate edges
    val back = ((1L until h - 1) ++ ((h + 1) until (n - 1)))
      .map(v => (v, v + 1))
    val und = (star ++ back).toDF("u", "v") // already u < v, simple
    val oriented = Graphs.orientByDegree(und)
    assert(oriented.filter($"src" === h).count() == 0L)
    assert(oriented.filter($"dst" === h).count() == n - 1)
    // each undirected edge appears exactly once, in exactly one direction
    assert(oriented.count() == und.count())
    // triangle totals agree between the two orientations: each path edge
    // (v, v+1) closes a triangle with h -> |back| triangles
    val wedges = Graphs.orientedWedges(oriented)
    val triDeg = wedges.join(oriented.as("e3"),
      $"b" === $"e3.src" && $"c" === $"e3.dst").count()
    val wId = und.as("e1").join(und.as("e2"), $"e1.v" === $"e2.u")
      .select($"e1.u".as("a"), $"e2.v".as("c"))
    val triId = wId.join(und.as("e3"),
      $"a" === $"e3.u" && $"c" === $"e3.v").count()
    assert(triDeg == back.size)
    assert(triDeg == triId)
    // the work bound: id orientation pays in(h)*out(h) = 20*19 = 380
    // wedges through the hot vertex alone; degree orientation's TOTAL
    // wedge count stays linear (out-degree <= 3 per leaf)
    val wedgeDeg = wedges.count()
    val wedgeId = wId.count()
    assert(wedgeId > 300)
    assert(wedgeDeg < 5 * n)
  }

  test("orientByDegree ties break by id (total order, deterministic)") {
    // 3-cycle: all degrees equal, so orientation must fall back to id
    // order — each edge points low id -> high id, one wedge, one triangle
    val und = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("u", "v")
    val o = Graphs.orientByDegree(und)
      .select($"src", $"dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(o.toSet == Set((0L, 1L), (1L, 2L), (0L, 2L)))
    val wedges = Graphs.orientedWedges(Graphs.orientByDegree(und))
    assert(wedges.count() == 1L)
  }

  test("converged label propagation reaches the fixed-count fixed point") {
    val nodes = Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 20L).toDF("id")
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    // two communities joined by one weak bridge + an isolated node
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)) ++
      Seq((3L, 10L), (10L, 3L))).toDF("src", "dst")
    val (conv, sweeps) = Graphs.labelPropagationConverged(nodes, edges,
      maxIters = 20)
    assert(sweeps >= 2 && sweeps < 20) // iterated, stopped on its own
    val convMap = conv.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // equality with the shared-step fixed-count form at the same depth
    val fixed = Graphs.labelPropagation(nodes, edges, iters = sweeps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(convMap == fixed)
    // and it IS a fixed point: one more sweep changes nothing
    val more = Graphs.labelPropagation(nodes, edges, iters = sweeps + 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(convMap == more)
    assert(convMap(20L) == 20L) // isolated node keeps its label
    assert(Seq(0L, 1L, 2L, 3L).forall(convMap(_) == 0L))
    assert(Seq(10L, 11L, 12L).forall(convMap(_) == 10L))
  }

  test("personalized PageRank checkpointing is bit-identical") {
    val nodes = (0L until 60L).toDF("id")
    val edges = (0L until 60L)
      .flatMap(i => Seq((i, (i * 7 + 1) % 60), (i, (i * 13 + 5) % 60)))
      .toDF("src", "dst")
    val seeds = (0L until 4L).toDF("id")
    val plain = Graphs.personalizedPageRank(nodes, edges, seeds, iters = 6)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ckpt = Graphs.personalizedPageRank(nodes, edges, seeds, iters = 6,
      checkpointEvery = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(plain.sameElements(ckpt))
  }

  test("sink-heavy node accumulates rank") {
    val n = 50L
    val nodes = (0L until n).toDF("id")
    // everyone links to node 0 and to a spread target
    val edges = (0L until n)
      .flatMap(i => Seq((i, 0L), (i, (i + 1) % n))).toDF("src", "dst")
    val ranks = Graphs.pageRank(nodes, edges, iters = 5)
      .orderBy($"r".desc, $"id").collect()
    assert(ranks.head.getLong(0) == 0L)
    assert(ranks.head.getLong(1) > 5 * Scale) // ~half of all mass each round
  }

  test("HITS on a bipartite fan: pure hubs hold zero authority and vice versa") {
    // hubs 0,1,2 each point at authorities 10,11; nothing points back.
    // Pure hubs must end with auth = 0, pure authorities with hub = 0,
    // and symmetry within each side must be exact (identical in/out sets).
    val nodes = Seq(0L, 1L, 2L, 10L, 11L).toDF("id")
    val edges = (for (h <- 0L to 2L; a <- Seq(10L, 11L)) yield (h, a))
      .toDF("src", "dst")
    val out = Graphs.hits(nodes, edges, iters = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = out.map(t => t._1 -> (t._2, t._3)).toMap
    assert(Seq(0L, 1L, 2L).map(byId).distinct.size == 1) // hubs identical
    assert(Seq(10L, 11L).map(byId).distinct.size == 1)   // auths identical
    assert(Seq(0L, 1L, 2L).forall(byId(_)._2 == 0L))     // pure hub: auth 0
    assert(Seq(10L, 11L).forall(byId(_)._1 == 0L))       // pure auth: hub 0
    assert(byId(0L)._1 > 0L && byId(10L)._2 > 0L)
  }

  test("HITS sum-normalization conserves total mass up to div truncation") {
    val n = 40L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n)
      .flatMap(i => Seq((i, (i * 7 + 3) % n), (i, (i * 11 + 1) % n)))
      .toDF("src", "dst")
    val sc = Graphs.MaxMass / n
    val agg = Graphs.hits(nodes, edges, iters = 3, scale = sc)
      .agg(sum($"hub"), sum($"auth")).collect().head
    val mass = n * sc
    // renormalize truncates < 1 unit per node per half-iteration
    for (tot <- Seq(agg.getLong(0), agg.getLong(1))) {
      assert(tot <= mass && tot > mass - 3 * n, s"total $tot vs mass $mass")
    }
  }

  test("HITS checkpointing is bit-identical; auto-scale matches explicit") {
    val n = 30L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n)
      .flatMap(i => Seq((i, (i * 13 + 5) % n), (i, (i * 3 + 2) % n)))
      .toDF("src", "dst")
    def run(scale: Long, ckpt: Int) =
      Graphs.hits(nodes, edges, iters = 4, scale = scale,
        checkpointEvery = ckpt)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val auto = run(0L, 0)
    assert(auto.sameElements(run(Graphs.MaxMass / n, 0))) // auto == explicit
    assert(auto.sameElements(run(0L, 2)))                 // ckpt == plain
  }

  test("HITS overflow guard fires loudly instead of wrapping") {
    val nodes = (0L until 4L).toDF("id")
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graphs.hits(nodes, edges, iters = 1, scale = Graphs.MaxMass)
    }
    assert(e.getMessage.contains("overflows"))
  }
}
