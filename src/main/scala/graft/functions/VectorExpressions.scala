package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native vector math for the ANN path. The zip_with/aggregate
  * formulation in Similarity.cosine is the executable spec but runs
  * interpreted; this expression is the hot loop of every similarity
  * query — one fused pass over both arrays, primitive double
  * accumulation, no per-element boxing — and participates in codegen via
  * a single static call.
  *
  * Accumulation order is ascending index, identical to the HOF spec and
  * to the SQL oracle's list_transform/list_sum fold, so scores stay
  * bit-deterministic across engines.
  */
object VectorMath {

  /** Cosine similarity of two numeric arrays (float or double elements),
    * accumulated in double, ascending index order. NaN propagates like
    * IEEE division. Returns null (boxed) when the lengths differ or any
    * element is null — matching the HOF spec, where zip_with null-pads
    * the shorter side and the fold collapses to NULL (and matching the
    * SQL oracles, whose out-of-range `vec[i]` probes are NULL).
    */
  def cosineOrNull(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }
}

/** cosine_sim(array<float|double>, array<float|double>): DoubleType.
  * Null on null input, mismatched lengths, or null elements (HOF-spec
  * parity — see VectorMath.cosineOrNull).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val lFloat = isFloat(left)
  @transient private lazy val rFloat = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorMath.cosineOrNull(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], lFloat, rFloat)
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cos")
      s"""java.lang.Double $tmp =
         |  graft.functions.VectorMath.cosineOrNull($a, $b, $lFloat, $rFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })

  override def prettyName: String = "cosine_sim"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** hyperplane_bucket(vec): LongType LSH bucket id — bit i is the sign of
  * dot(vec, planes(i)), doubles accumulated in ascending index order
  * (identical to the aggregate/zip_with spec in Similarity.lshBucketHof;
  * parity asserted in SimilaritySpec). One fused pass over the vector per
  * row instead of nPlanes interpreted lambda folds — the map-side cost of
  * every LSH ANN query, which is why it is native.
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  @transient private lazy val childFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Public for generated code: the plane family lives on this instance,
    * so codegen calls back through an object reference (the
    * MinHashSignature pattern).
    */
  def evalBucket(v: ArrayData): Long = {
    // HOF-spec parity on the edges: zip_with null-pads the SHORTER side
    // (vector or plane) and a null element nulls its product, so the
    // fold yields NULL and when(d >= 0) takes the otherwise-branch —
    // every bit 0. Mirror that: a vector whose length differs from the
    // plane dim, or containing a null element, lands in bucket 0
    // (asserted in SimilaritySpec).
    val dim = if (planeArr.isEmpty) 0 else planeArr(0).length
    if (v.numElements() != dim) return 0L
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planeArr.length) {
      val plane = planeArr(p)
      var d = 0.0
      var j = 0
      while (j < plane.length) {
        val x = if (childFloat) v.getFloat(j).toDouble else v.getDouble(j)
        d += x * plane(j)
        j += 1
      }
      if (d >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override def nullSafeEval(input: Any): Any =
    evalBucket(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBucket", this,
      classOf[HyperplaneBucket].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalBucket($c)")
  }

  override def prettyName: String = "hyperplane_bucket"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** nearest_centroid(vec): IntegerType cell id — the IVF assignment
  * argmin in ONE compiled pass over nlist x dim, with the centroid
  * matrix carried as instance data (ctx.addReferenceObj) instead of
  * nlist literal expression subtrees. The literal-argmin formulation
  * (least over per-centroid structs) is bit-identical but its plan and
  * generated-code size grow linearly with nlist — measured degrading
  * already at 64 cells (SCALE.md round-11 ivfrecall); this keeps the
  * corpus-sized assignment pass constant-size at any production nlist.
  *
  * Semantics replicate the declarative twin on its whole well-formed
  * domain (SimilaritySpec pins parity on real embeddings): squared-L2
  * accumulated in ascending index order as doubles (float inputs
  * widened per element), ties toward the smaller centroid id. One
  * DELIBERATE tightening, also pinned: a malformed vector (length !=
  * dim, or a null element) yields NULL here, where the least-over-
  * structs formulation accidentally assigns it to the smallest cid
  * (struct(null_dist, cid) compares null-first) — at 100 TB that
  * accident funnels every corrupt row into one cell and poisons its
  * probe results; null surfaces the corruption instead.
  */
case class NearestCentroid(child: Expression,
    centroids: Seq[(Int, Array[Double])])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "centroid set must be non-empty")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val dim: Int = centroids.head._2.length
  @transient private lazy val cids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val cvecs: Array[Array[Double]] =
    centroids.map(_._2).toArray
  @transient private lazy val childFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Public for generated code (object-reference call). Boxed Integer so
    * the mismatch/null-element case can yield SQL NULL.
    */
  def evalCell(v: ArrayData): Integer = {
    if (v.numElements() != dim) return null
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      j += 1
    }
    // Double.compare, not < / ==: primitive comparisons are always
    // false against NaN, which would leave the phantom initial bestC
    // in place for an all-NaN vector. Double.compare orders NaN above
    // every real and equal to itself — the same contract as Spark's
    // nanSafeCompareDoubles inside the declarative least(), so a
    // NaN-element vector ties every centroid and breaks to the
    // smallest cid in BOTH formulations (pinned in SimilaritySpec).
    var bestD = Double.NaN
    var bestC = Int.MaxValue
    var first = true
    var c = 0
    while (c < cvecs.length) {
      val cv = cvecs(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val x = (if (childFloat) v.getFloat(i).toDouble else v.getDouble(i)) - cv(i)
        d += x * x
        i += 1
      }
      val cmp = if (first) -1 else java.lang.Double.compare(d, bestD)
      if (cmp < 0 || (cmp == 0 && cids(c) < bestC)) {
        bestD = d
        bestC = cids(c)
      }
      first = false
      c += 1
    }
    Integer.valueOf(bestC)
  }

  override def nullSafeEval(input: Any): Any =
    evalCell(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Integer ${ev.value}Tmp = $ref.evalCell($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp.intValue(); }
    """)
  }

  override def prettyName: String = "nearest_centroid"
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** nearest_centroid_dist(vec): struct<cell:int, dist:double> — the
  * assignment argmin PLUS the winning squared distance, for consumers
  * that need both (kmeansStep's inertia). Same one-pass constant-plan-
  * size shape, same semantics (Double.compare NaN ordering, smaller-cid
  * ties, null on shape-malformed input) as NearestCentroid; the loop is
  * duplicated rather than shared because the int-only variant must stay
  * allocation-free on the corpus-sized assignment pass while this one
  * necessarily allocates its result row.
  */
case class NearestCentroidDist(child: Expression,
    centroids: Seq[(Int, Array[Double])])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "centroid set must be non-empty")
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  @transient private lazy val dim: Int = centroids.head._2.length
  @transient private lazy val cids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val cvecs: Array[Array[Double]] =
    centroids.map(_._2).toArray
  @transient private lazy val childFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Public for generated code (object-reference call). */
  def evalCellDist(v: ArrayData): Any = {
    if (v.numElements() != dim) return null
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      j += 1
    }
    var bestD = Double.NaN
    var bestC = Int.MaxValue
    var first = true
    var c = 0
    while (c < cvecs.length) {
      val cv = cvecs(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val x = (if (childFloat) v.getFloat(i).toDouble else v.getDouble(i)) - cv(i)
        d += x * x
        i += 1
      }
      val cmp = if (first) -1 else java.lang.Double.compare(d, bestD)
      if (cmp < 0 || (cmp == 0 && cids(c) < bestC)) {
        bestD = d
        bestC = cids(c)
      }
      first = false
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestC, bestD))
  }

  override def nullSafeEval(input: Any): Any =
    evalCellDist(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroidDist", this,
      classOf[NearestCentroidDist].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (InternalRow) $ref.evalCellDist($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override def prettyName: String = "nearest_centroid_dist"
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidDist =
    copy(child = newChild)
}

/** nearest_cells(vec): array<int> — the `k` nearest centroid ids,
  * nearest first, ties toward the smaller cid: exactly the
  * slice(array_sort(structs(dist, cid)), 1, k) contract of
  * Similarity.ivfProbeCells (parity-pinned in SimilaritySpec), with
  * the centroid matrix as instance data so plan and generated-code
  * size stay constant in nlist. The declarative probe was fine while
  * probes ran only over a small QUERY frame; corpus-wide self-kNN
  * (every row probes) put the O(nlist) interpreted struct sort on the
  * corpus path — the same promotion NearestCentroid earned for
  * assignment. Selection is one pass with a k-slot insertion (k is
  * nprobe-sized: <= 16 in every flow), no allocation beyond the
  * result. Null on malformed input (dim mismatch / null element),
  * matching NearestCentroid's documented tightening.
  */
case class NearestCells(child: Expression,
    centroids: Seq[(Int, Array[Double])], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "centroid set must be non-empty")
  require(k >= 1, s"k must be >= 1, got $k")
  // k past nlist CLAMPS, like the declarative slice: nprobe = all
  // cells degenerates to brute force (ivfTopK's documented contract),
  // and nlist can legitimately come out smaller than a configured
  // nprobe (the seed-pool lesson) — that must widen the probe, not
  // throw at plan time
  @transient private lazy val kk: Int = math.min(k, centroids.size)
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val dim: Int = centroids.head._2.length
  @transient private lazy val cids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val cvecs: Array[Array[Double]] =
    centroids.map(_._2).toArray
  @transient private lazy val childFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Public for generated code (object-reference call). */
  def evalCells(v: ArrayData): Any = {
    if (v.numElements() != dim) return null
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      j += 1
    }
    // k-slot insertion sort by (dist, cid) ascending — Double.compare
    // ordering so NaN sorts last, like the declarative struct sort
    val bd = new Array[Double](kk)
    val bc = new Array[Int](kk)
    var n = 0
    var c = 0
    while (c < cvecs.length) {
      val cv = cvecs(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val x = (if (childFloat) v.getFloat(i).toDouble else v.getDouble(i)) - cv(i)
        d += x * x
        i += 1
      }
      val cd = cids(c)
      // find insertion point among the current n kept slots
      var p = n
      while (p > 0 && {
        val cmp = java.lang.Double.compare(d, bd(p - 1))
        cmp < 0 || (cmp == 0 && cd < bc(p - 1))
      }) p -= 1
      if (p < kk) {
        val last = math.min(n, kk - 1)
        var m = last
        while (m > p) {
          bd(m) = bd(m - 1)
          bc(m) = bc(m - 1)
          m -= 1
        }
        bd(p) = d
        bc(p) = cd
        if (n < kk) n += 1
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(java.util.Arrays.copyOf(bc, n))
  }

  override def nullSafeEval(input: Any): Any =
    evalCells(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (ArrayData) $ref.evalCells($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override def prettyName: String = "nearest_cells"
  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** nearest_neighbor_cosine(vec, id): struct<nn_id, nn_label, sim> —
  * the row's best cosine neighbor within the broadcast `queries`
  * matrix, its own id excluded. The brute-force-ANN-done-right shape
  * for a SMALL query set against an arbitrarily large corpus: the eval
  * set rides as expression instance data (ids + LABELS + vectors +
  * PRECOMPUTED norms — the norms would otherwise recompute per pair,
  * and carrying the label kills the post-hoc label join whose inferred
  * isnotnull filter re-evaluated this pass below the exchange), each
  * corpus row makes one fused pass over the matrix, and no joined pair
  * row ever materializes. Measured at sf0.1 (2000×2000 self-square):
  * the BroadcastNestedLoopJoin + max_by formulation paid ~5 s mostly
  * in 4M joined-row copies; this expression runs the same arithmetic
  * inside one codegen'd map pass (see SCALE.md).
  *
  * Selection order replays the oracle contract (round(sim, 6) desc,
  * then id asc): candidates are compared on their HALF-UP 6-decimal
  * rounding — ties on the rounded grid fall to the smaller id — while
  * the emitted sim stays unrounded (the caller applies Spark's round,
  * so the output value is bit-identical to the per-pair formulation).
  * Null on malformed input (wrong dim, null element), and null when
  * every query is excluded (eval set of one).
  */
case class NearestNeighborCosine(left: Expression, right: Expression,
    queries: Seq[(Long, Int, Array[Double])]) extends BinaryExpression {
  require(queries.size >= 2,
    "query set needs >= 2 entries (1-NN with self excluded is undefined " +
      "on a singleton)")
  require(queries.forall(_._3.length == queries.head._3.length),
    "query vectors must share one dimension")
  require(queries.map(_._1).distinct.size == queries.size,
    "query ids must be distinct: self-exclusion removes EVERY entry " +
      "sharing the row's id, so a duplicated id could leave a row with " +
      "no candidate (an upstream data defect — surface it here)")
  override def dataType: DataType = StructType(Seq(
    StructField("nn_id", LongType, nullable = false),
    StructField("nn_label", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  @transient private lazy val dim: Int = queries.head._3.length
  @transient private lazy val qids: Array[Long] = queries.map(_._1).toArray
  @transient private lazy val qlabels: Array[Int] = queries.map(_._2).toArray
  @transient private lazy val qvecs: Array[Array[Double]] =
    queries.map(_._3).toArray
  @transient private lazy val qnorms: Array[Double] =
    qvecs.map(q => math.sqrt(q.map(x => x * x).sum))
  @transient private lazy val vecFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Half-up 6-decimal rounding for the SELECTION comparison only —
    * agrees with Spark/DuckDB round everywhere two candidates could
    * realistically collide (exactly equal sims round equal under any
    * scheme; distinct vectors sit far above the 1e-16 scale where the
    * grids differ).
    */
  private def r6(x: Double): Double =
    if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
    else -math.floor(-x * 1e6 + 0.5) / 1e6

  /** Public for generated code (object-reference call). Malformed input
    * THROWS rather than nulling: a wrong-dimension or null-element
    * vector in an eval set is a data defect to surface, and a null
    * result here would let a downstream isnotnull filter push this
    * whole quadratic pass below the parallelizing exchange (observed:
    * the join-based formulation evaluated the matrix scan twice, once
    * single-threaded on the scan — see Similarity.knnLabelAgreement).
    */
  def evalNeighbor(v: ArrayData, id: Long): Any = {
    require(v.numElements() == dim,
      s"nearest_neighbor_cosine: vector of ${v.numElements()} dims " +
        s"against a $dim-dim query set")
    // copy the row vector to a primitive array during the norm pass:
    // the dot loop below reads it m times, and per-element ArrayData
    // accessor calls (bounds + null checks) in the n·m hot loop is the
    // quadratic path's dominant constant
    val vv = new Array[Double](dim)
    var nv = 0.0
    var j = 0
    while (j < dim) {
      require(!v.isNullAt(j),
        s"nearest_neighbor_cosine: null element at index $j")
      val x = if (vecFloat) v.getFloat(j).toDouble else v.getDouble(j)
      vv(j) = x
      nv += x * x
      j += 1
    }
    val vnorm = math.sqrt(nv)
    var bestKey = Double.NegativeInfinity
    var bestSim = 0.0
    var bestQ = -1
    var q = 0
    while (q < qvecs.length) {
      if (qids(q) != id) {
        val qv = qvecs(q)
        var dot = 0.0
        var i = 0
        while (i < dim) {
          dot += vv(i) * qv(i)
          i += 1
        }
        // dot / vnorm / qnorm — division order matches cosineOrNull and
        // the SQL oracle, so the selected pair's value is bit-identical
        val sim = dot / vnorm / qnorms(q)
        val key = r6(sim)
        val cmp = java.lang.Double.compare(key, bestKey)
        if (bestQ < 0 || cmp > 0 || (cmp == 0 && qids(q) < qids(bestQ))) {
          bestKey = key
          bestSim = sim
          bestQ = q
        }
      }
      q += 1
    }
    // constructor-checked distinct ids + size >= 2 guarantee a
    // candidate for any id; fail loudly if that invariant ever breaks
    if (bestQ < 0) throw new IllegalStateException(
      s"nearest_neighbor_cosine: no candidate for id $id — every query " +
        "entry carries this id (duplicate-id eval set?)")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](qids(bestQ), qlabels(bestQ), bestSim))
  }

  override def nullSafeEval(v: Any, id: Any): Any =
    evalNeighbor(v.asInstanceOf[ArrayData], id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestNeighborCosine", this,
      classOf[NearestNeighborCosine].getName)
    nullSafeCodeGen(ctx, ev, (v, id) => s"""
      ${ev.value} = (InternalRow) $ref.evalNeighbor($v, $id);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override def prettyName: String = "nearest_neighbor_cosine"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestNeighborCosine =
    copy(left = newLeft, right = newRight)
}

/** dense_vec_norm2(pairs, dim): scatter sparse (bucket, weight) pairs
  * into a dense double vector and return struct<vec: array<double>,
  * n2: double> where n2 is the squared L2 norm folded over the DENSE
  * vector in ascending index order — bit-identical to the
  * map_from_entries + sequence/element_at + index-ordered-fold
  * declarative assembly it replaces (TfIdf.hashedVec), because
  * scattering is exact and adding 0.0 never changes a finite double.
  *
  * Why a native: the declarative assembly is O(dim²) per row —
  * `dim` element_at probes, each a linear scan of an
  * ArrayBasedMapData — and the O(dim) fold re-inlines into HOF
  * lambdas under a downstream Generate (the hashedVec lesson). This
  * is one O(dim + nnz) pass, and producing BOTH outputs as one
  * struct lets the consumer stage it as a single aggregate-output
  * attribute that no optimizer rule can re-inline.
  *
  * Input: array<struct<bucket:int, weight:long>> (field names
  * irrelevant — positional). Null input, null entries, or a bucket
  * outside [0, dim) yield null (the malformed-input posture of the
  * other vector natives). Duplicate buckets ADD — callers that
  * guarantee uniqueness (a groupBy on the bucket upstream) are
  * unaffected; anything else gets sum semantics, not
  * last-writer-wins nondeterminism.
  */
case class DenseVecNorm2(child: Expression, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  // the eval allocates one dim-length double array PER ROW; 65536
  // (512 KB) keeps that in young-gen territory — the same cap as
  // TfIdf.hashedVec, the consumer that motivates the expression
  require(dim >= 1 && dim <= 65536, s"dim out of range: $dim")
  override def dataType: DataType = StructType(Seq(
    StructField("vec", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("n2", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  /** Public for generated code (object-reference call). */
  def evalDense(pairs: ArrayData): Any = {
    val out = new Array[Double](dim)
    val n = pairs.numElements()
    var i = 0
    while (i < n) {
      if (pairs.isNullAt(i)) return null
      val row = pairs.getStruct(i, 2)
      // a null FIELD would read as 0 through the primitive getters —
      // check explicitly, same malformed-input posture as null entries
      if (row.isNullAt(0) || row.isNullAt(1)) return null
      val b = row.getInt(0)
      if (b < 0 || b >= dim) return null
      out(b) += row.getLong(1).toDouble
      i += 1
    }
    var n2 = 0.0
    var j = 0
    while (j < dim) { n2 += out(j) * out(j); j += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(out),
        n2))
  }

  override def nullSafeEval(input: Any): Any =
    evalDense(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("denseVecNorm2", this,
      classOf[DenseVecNorm2].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (InternalRow) $ref.evalDense($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override def prettyName: String = "dense_vec_norm2"
  override protected def withNewChildInternal(newChild: Expression): DenseVecNorm2 =
    copy(child = newChild)
}

/** mat_vec_project(vec): array<float> — the vector projected by a
  * literal matrix: out(j) = float(scale · Σ_i vec(i) · rows(j)(i)),
  * doubles accumulated in ascending index order, scale applied as one
  * double multiply and the float cast as one IEEE op — so the whole
  * output is bit-replayable by a SQL oracle folding the same order
  * (the x85 determinism class). The matrix rides as instance data
  * (ctx.addReferenceObj), so plan and generated-code size stay
  * constant in outDim — the same promotion NearestCentroid earned:
  * the declarative formulation is outDim interpreted lambda folds per
  * row (the x09 bucket-signature anti-pattern, measured 2.9 → 0.4 s).
  *
  * The motivating matrix is Similarity.randomProject's seeded
  * Rademacher ±1 family (Achlioptas 2001's database-friendly
  * Johnson–Lindenstrauss projection), but any literal matrix works.
  * Null on malformed input (length != rows' width, null element) —
  * the NearestCentroid posture.
  */
case class MatVecProject(child: Expression, rows: Seq[Seq[Double]],
    scale: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(rows.nonEmpty, "projection matrix must be non-empty")
  require(rows.forall(_.length == rows.head.length),
    "projection matrix rows must share one width")
  override def dataType: DataType =
    ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  // Restrict the child to array<float>/array<double> at ANALYSIS time
  // (ADVICE r20): evalProject reads elements via getFloat/getDouble, so
  // an array<int>/array<bigint> child would pass analysis and emit
  // silent garbage floats — the null posture only covers wrong length
  // and null elements, not a mistyped column.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mat_vec_project expects array<float> or array<double>, " +
            s"got ${other.catalogString}")
    }

  @transient private lazy val dim: Int = rows.head.length
  @transient private lazy val mat: Array[Array[Double]] =
    rows.map(_.toArray).toArray
  @transient private lazy val childFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Public for generated code (object-reference call). */
  def evalProject(v: ArrayData): Any = {
    if (v.numElements() != dim) return null
    val vv = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      vv(j) = if (childFloat) v.getFloat(j).toDouble else v.getDouble(j)
      j += 1
    }
    val out = new Array[Float](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      var d = 0.0
      var i = 0
      while (i < dim) { d += vv(i) * row(i); i += 1 }
      out(r) = (d * scale).toFloat
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any =
    evalProject(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVecProject", this,
      classOf[MatVecProject].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (ArrayData) $ref.evalProject($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override def prettyName: String = "mat_vec_project"
  override protected def withNewChildInternal(newChild: Expression): MatVecProject =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API: fused native cosine similarity. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.toColumn(CosineSimilarity(
      ColumnShim.toExpression(a), ColumnShim.toExpression(b)))

  /** Column API: the k nearest centroid ids, nearest first (constant
    * plan size in nlist).
    */
  def nearestCells(vec: Column, centroids: Seq[(Int, Array[Double])],
      k: Int): Column =
    ColumnShim.toColumn(NearestCells(ColumnShim.toExpression(vec),
      centroids, k))

  /** Column API: one-pass best-cosine-neighbor against a broadcast
    * (id, label, vector) query matrix — struct<nn_id, nn_label, sim>,
    * the row's own id excluded.
    */
  def nearestNeighborCosine(vec: Column, id: Column,
      queries: Seq[(Long, Int, Array[Double])]): Column =
    ColumnShim.toColumn(NearestNeighborCosine(ColumnShim.toExpression(vec),
      ColumnShim.toExpression(id), queries))

  /** Column API: one-pass IVF cell assignment (constant plan size in
    * nlist).
    */
  def nearestCentroid(vec: Column,
      centroids: Seq[(Int, Array[Double])]): Column =
    ColumnShim.toColumn(NearestCentroid(ColumnShim.toExpression(vec),
      centroids))

  /** Column API: assignment plus the winning squared distance
    * (struct<cell, dist>) — kmeansStep's shape.
    */
  def nearestCentroidDist(vec: Column,
      centroids: Seq[(Int, Array[Double])]): Column =
    ColumnShim.toColumn(NearestCentroidDist(ColumnShim.toExpression(vec),
      centroids))

  /** Column API: fused native hyperplane LSH bucket. */
  def hyperplaneBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    ColumnShim.toColumn(HyperplaneBucket(ColumnShim.toExpression(vec), planes))

  /** Column API: one-pass sparse-pairs → struct<dense vec, squared
    * norm> (O(dim + nnz); hashedVec's assembly).
    */
  def denseVecNorm2(pairs: Column, dim: Int): Column =
    ColumnShim.toColumn(DenseVecNorm2(ColumnShim.toExpression(pairs), dim))

  /** Column API: one-pass literal-matrix projection → array<float>
    * (constant plan size in outDim; randomProject's hot loop).
    */
  def matVecProject(vec: Column, rows: Seq[Seq[Double]],
      scale: Double): Column =
    ColumnShim.toColumn(MatVecProject(ColumnShim.toExpression(vec),
      rows, scale))
}
