package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphAnnSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Ground truth: each node's true top-k neighbors by (cosine desc,
    * id), computed driver-side (500 vectors at this SF).
    */
  private def trueEdges(k: Int): Map[Long, Set[Long]] = {
    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    rows.map { case (id, v) =>
      id -> rows.filter(_._1 != id)
        .map { case (o, w) =>
          (BigDecimal(cos(v, w)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble, o) }
        .sortBy { case (s, o) => (-s, o) }
        .take(k).map(_._2).toSet
    }.toMap
  }

  private def edgeRecall(graph: org.apache.spark.sql.DataFrame,
      truth: Map[Long, Set[Long]], k: Int): Double = {
    val got = graph.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    truth.map { case (id, t) =>
      (got.getOrElse(id, Set.empty) & t).size.toDouble / t.size
    }.sum / truth.size
  }

  test("ringInit: k edges per node, no self edges, deterministic") {
    val g = GraphAnn.ringInit(emb, "id", 8)
    val n = emb.count()
    assert(g.count() == n * 8)
    assert(g.filter(col("id") === col("nbr")).count() == 0)
    assert(g.groupBy("id").count()
      .filter(col("count") =!= 8).count() == 0)
    val again = GraphAnn.ringInit(emb, "id", 8).collect().map(_.toString)
    assert(g.collect().map(_.toString).sorted
      .sameElements(again.sorted))
  }

  test("cellRingInit: multi-member-cell edges stay within the " +
    "assigned IVF cell, no self edges, at most k per node; a " +
    "singleton-cell node gets exactly ONE global-fallback edge (an " +
    "edgeless node could never re-enter — NN-descent candidates " +
    "derive only from existing edges)") {
    val cells = emb.orderBy(md5(col("id").cast("string")), col("id"))
      .limit(8).collect().zipWithIndex
      .map { case (r, i) =>
        (i, r.getSeq[Float](1).map(_.toDouble).toArray) }.toSeq
    val g = GraphAnn.cellRingInit(emb, "id", "vec", cells, 4)
      .localCheckpoint()
    assert(g.filter(col("id") === col("nbr")).count() == 0)
    assert(g.groupBy("id").count().filter(col("count") > 4).count() == 0)
    val asg = Similarity.ivfAssign(emb, "vec", cells)
      .select(col("id"), col("cell"))
    val cellSizes = asg.groupBy("cell").count()
    val multi = asg.join(cellSizes.filter(col("count") > 1), Seq("cell"))
      .select(col("id"), col("cell"))
    val crossCell = g
      .join(multi.toDF("id", "ca"), Seq("id"))
      .join(asg.toDF("nbr", "cb"), Seq("nbr"))
      .filter(col("ca") =!= col("cb")).count()
    assert(crossCell == 0, s"$crossCell multi-member-cell edges cross cells")
    // every node has degree >= 1 — including singleton-cell nodes
    val degreeless = emb.select(col("id"))
      .join(g.select(col("id")).distinct(), Seq("id"), "left_anti").count()
    assert(degreeless == 0, s"$degreeless nodes have no out-edge")
    // forced singleton: 5 near-identical vectors + 1 far outlier under
    // 2 centroids — the outlier's cell has exactly one member and its
    // one edge is the global min non-self id
    import spark.implicits._
    val six = ((0L until 5L).map(i =>
        (i, Seq.fill(64)(1.0f + i.toFloat / 100f))) :+
      (9L, (Seq.fill(32)(-1.0f) ++ Seq.fill(32)(1.0f)))).toDF("id", "vec")
    val twoCells = Seq(
      (0, Array.fill(64)(1.0)),
      (1, Array.fill(32)(-1.0) ++ Array.fill(32)(1.0)))
    val g6 = GraphAnn.cellRingInit(six, "id", "vec", twoCells, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val outlierEdges = g6.filter(_._1 == 9L)
    assert(outlierEdges.toSeq == Seq((9L, 0L)),
      s"singleton fallback edge wrong: ${outlierEdges.toSeq}")
  }

  test("stride-divides-ring-size fallback: a ring of exactly `stride` " +
    "members still gets min(k, n-1) distinct non-self edges (the " +
    "pre-fix collapse emitted ZERO edges and left those nodes " +
    "permanently unreachable)") {
    import spark.implicits._
    // 7 vectors, one cell (single centroid): ring size == stride
    val seven = (0L until 7L).map(i =>
      (i, Seq.fill(64)(i.toFloat / 10f + 0.1f))).toDF("id", "vec")
    val oneCell = Seq((0, Array.fill(64)(0.0)))
    val g = GraphAnn.cellRingInit(seven, "id", "vec", oneCell, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(g.length == 7 * 3, s"expected 21 edges, got ${g.length}")
    assert(g.forall { case (a, b) => a != b })
    assert(g.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 3))
    // same law on the global ring (n = 7 = stride)
    val r = GraphAnn.ringInit(seven, "id", 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.length == 7 * 3 && r.forall { case (a, b) => a != b })
    // a composite stride is refused loudly (coprimality is only a
    // cheap modulus for primes)
    val e = intercept[IllegalArgumentException] {
      GraphAnn.ringInit(seven, "id", 3, stride = 6)
    }
    assert(e.getMessage.contains("prime"))
  }

  test("scale pin: no corpus-scale unpartitioned window anywhere in " +
    "GraphAnn plans — ringInit densifies ids via the sharded global " +
    "ordinal, not a corpus-serializing row_number over an empty " +
    "partitionSpec (the round-22 bounded-offsets window above the " +
    "≤shards-row __pid aggregate is exempt, same rule as PlanSpec's)") {
    def unpartitioned(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty &&
            // bounded-offsets exemption (PlanSpec.isBoundedOffsetsWindow):
            // the window reading Ranking's per-shard size aggregate is a
            // ≤ shards ~ parallelism row frame by construction
            w.child.collect {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
                if a.groupingExpressions.exists(
                  _.references.exists(_.name == "__pid")) => a
            }.isEmpty => w
      }
    val shards = spark.sessionState.conf.numShufflePartitions
    assert(unpartitioned(GraphAnn.ringRanked(emb, "id", shards)).isEmpty,
      "ringInit's densification frame has an unpartitioned window")
    val cells = Seq(
      (0, Array.fill(64)(1.0)),
      (1, Array.fill(32)(-1.0) ++ Array.fill(32)(1.0)))
    assert(unpartitioned(
      GraphAnn.cellRingInit(emb, "id", "vec", cells, 4)).isEmpty)
    val init = GraphAnn.ringInit(emb, "id", 4)
    assert(unpartitioned(init).isEmpty)
    assert(unpartitioned(
      GraphAnn.nnDescentStep(init, emb, "id", "vec", 4)).isEmpty)
    val q = Seq((0L, Array.fill(64)(1.0)))
    assert(unpartitioned(GraphAnn.graphTopK(
      GraphAnn.ringInit(emb, "id", 4), emb, "id", "vec", q,
      k = 2, beam = 4, hops = 1)).isEmpty)
  }

  test("NN-descent: every refinement round keeps a node's CURRENT " +
    "edges among its candidates (per-node quality is monotone) and " +
    "true-edge recall rises from the ring init to a floor") {
    val k = 8
    val truth = trueEdges(k)
    val init = GraphAnn.ringInit(emb, "id", k)
    val s1 = GraphAnn.nnDescentStep(init, emb, "id", "vec", k)
      .localCheckpoint()
    val s2 = GraphAnn.nnDescentStep(
      s1.select("id", "nbr"), emb, "id", "vec", k).localCheckpoint()
    val s3 = GraphAnn.nnDescentStep(
      s2.select("id", "nbr"), emb, "id", "vec", k).localCheckpoint()
    def meanSim(g: org.apache.spark.sql.DataFrame): Double =
      g.agg(avg(col("sim"))).head().getDouble(0)
    val (m1, m2, m3) = (meanSim(s1), meanSim(s2), meanSim(s3))
    assert(m2 >= m1 - 1e-9 && m3 >= m2 - 1e-9,
      s"mean kept similarity degraded: $m1 -> $m2 -> $m3")
    val (r1, r2, r3) =
      (edgeRecall(s1, truth, k), edgeRecall(s2, truth, k),
        edgeRecall(s3, truth, k))
    info(s"NN-descent edge recall@$k: $r1 -> $r2 -> $r3 " +
      s"(mean sim $m1 -> $m2 -> $m3)")
    assert(r3 >= r1 - 1e-9, s"recall degraded across rounds: $r1 -> $r3")
    // 0.042 -> 0.079 -> 0.131 measured: on THIS quasi-orthogonal
    // corpus the neighbor-of-neighbor premise is weak, so convergence
    // is a slow ~0.055/round diffusion (0.51 by round 10 — the
    // graphann scale flow records the full curve); the floor pins the
    // deterministic measured point, the SEARCH test below pins that
    // beam expansion still recovers ≥0.8 query recall from an
    // only-partly-converged graph
    assert(r3 >= 0.12, s"round-3 edge recall below measured floor: $r3")
    // nnDescent(iters = 3) is exactly the three chained steps
    val full = GraphAnn.nnDescent(emb, "id", "vec", k, 3)
    assert(full.collect().map(_.toString).sorted.sameElements(
      s3.collect().map(_.toString).sorted))
  }

  test("graphTopK degenerate law: seeding every node with hops = 0 " +
    "and beam >= n IS brute force — and the beam path keeps a recall " +
    "floor at realistic dials") {
    val k = 8
    val graph = GraphAnn.nnDescent(emb, "id", "vec", k, 6)
    val queries = emb.filter(col("id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toSeq
    val n = emb.count().toInt
    // ground truth with graphTopK's own semantics (self-matches kept,
    // like adcTopK — a corpus query's best hit is itself), computed
    // driver-side at this SF
    val all = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    val exact = queries.map { case (qid, q) =>
      qid -> all.map { case (o, w) =>
          (BigDecimal(cos(q, w)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble, o) }
        .sortBy { case (s, o) => (-s, o) }
        .take(10).map(_._2).toSet
    }.toMap
    val degenerate = GraphAnn.graphTopK(graph, emb, "id", "vec",
        queries, k = 10, beam = n, hops = 0, sampleMod = 1)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    queries.foreach { case (qid, _) =>
      assert(degenerate(qid) == exact(qid),
        s"degenerate graph search != brute force for query $qid")
    }
    def beamRecall(beam: Int, hops: Int): Double = {
      val got = GraphAnn.graphTopK(graph, emb, "id", "vec",
          queries, k = 10, beam = beam, hops = hops)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      queries.map { case (qid, _) =>
        (got(qid) & exact(qid)).size / 10.0 }.sum / queries.size
    }
    val r33 = beamRecall(32, 3)
    val r35 = beamRecall(32, 5)
    info(s"graph beam search recall@10: beam32/hops3 $r33, " +
      s"beam32/hops5 $r35")
    // visited accumulates and the beam prunes only the FRONTIER, so
    // recall is monotone in hops — the duplicate-crowding bug this
    // operator shipped with (exceptAll before distinct) made hops=5
    // measure BELOW hops=3; this assertion is its regression guard
    assert(r35 >= r33 - 1e-9,
      s"recall not monotone in hops: $r33 -> $r35 (duplicate rows " +
        "are crowding the top-k window again?)")
    assert(r33 >= 0.6, s"beam search recall collapsed: $r33")
  }
}
