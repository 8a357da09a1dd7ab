package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding search (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011): cut
  * each dim-D vector into `m` contiguous subvectors, learn a small
  * codebook per subspace, and store each vector as its `m` nearest-
  * codeword ids — one int (a byte at k <= 256) per subspace. At the
  * repo's 64-float embeddings with m=8, that is 256 bytes -> 8 bytes,
  * a 32x compression that is the difference between "the corpus's
  * vectors fit in executor memory" and "they don't" at 10^9+ rows.
  *
  * Search is asymmetric distance computation (ADC, the paper's §IV.A):
  * the QUERY stays exact — per query, precompute an m x k lookup table
  * of partial squared L2 distances to every codeword, then a corpus
  * vector's approximate distance is m table lookups summed. On Spark
  * that is: tiny LUT frame broadcast, one codegen'd projection over the
  * codes column, top-k per query via a query-partitioned rank window —
  * a map-only scan of 8-byte codes with NO corpus exchange, against
  * brute force's full-vector reads (x08). Fidelity dial: re-rank ADC's
  * top k' >> k candidates with exact vectors (a bounded id-join), the
  * same recover-fidelity-by-spending-candidates move as IVF's nprobe
  * (SCALE.md round-15 kNN sweep); composing with ivfAssign's cell
  * blocking gives IVF-PQ, the standard billion-scale layout — both are
  * compositions of operators this repo already grades, not new code.
  *
  * Training reuses Similarity.kmeans VERBATIM per subspace (m
  * independent small problems of dimension dim/m): the driver loop is
  * m x iters bounded jobs, each returning k x (dim/m + 1) rows — the
  * sanctioned kmeans collect class, growing with the index, not the
  * corpus. Production trains on a sample (the paper uses ~100k-1M
  * vectors regardless of corpus size) and encodes the full corpus with
  * the frozen codebooks; encode is one compiled map pass (m
  * NearestCentroid natives over slices — constant plan size).
  *
  * The graded query (x69/x70) freezes the codebook to the every-97th-id
  * seed pool (x36's deterministic pattern) so a DuckDB oracle replays
  * encode and ADC exactly; the kmeans-trained path is graded by
  * PqSpec's laws instead (training must beat the untrained codebook on
  * reconstruction error and recall — hash-free, engine-internal).
  */
object Pq {

  /** Per-subspace codebooks from seed vectors: subspace i's codebook is
    * the i-th slice of each seed, codes assigned in seed order 0..k-1.
    * The deterministic bootstrap (and the x69 oracle's replayable
    * form); kmeans refinement starts from exactly this.
    */
  def seedCodebooks(seeds: Seq[Array[Double]], dim: Int, m: Int)
      : Seq[Seq[(Int, Array[Double])]] = {
    require(m >= 1 && dim % m == 0, s"m must divide dim, got $dim/$m")
    require(seeds.nonEmpty, "need at least one seed vector")
    seeds.foreach(sd => require(sd.length == dim,
      s"seed length ${sd.length} != dim $dim"))
    val sub = dim / m
    (0 until m).map(i =>
      seeds.zipWithIndex.map { case (sd, c) =>
        (c, sd.slice(i * sub, (i + 1) * sub))
      })
  }

  /** Lloyd-refine each subspace's codebook for `iters` rounds —
    * Similarity.kmeans on the sliced corpus, m independent problems.
    */
  def trainCodebooks(
      corpus: DataFrame, vecCol: String, dim: Int,
      init: Seq[Seq[(Int, Array[Double])]], iters: Int)
      : Seq[Seq[(Int, Array[Double])]] = {
    val m = init.size
    require(m >= 1 && dim % m == 0, s"m must divide dim, got $dim/$m")
    val sub = dim / m
    init.zipWithIndex.map { case (cb, i) =>
      val sliced = corpus.select(
        slice(col(vecCol), i * sub + 1, sub).as("__sub"))
      Similarity.kmeans(sliced, "__sub", sub, cb, iters)._1
    }
  }

  private def codeExprs(vecCol: Column,
      codebooks: Seq[Seq[(Int, Array[Double])]], dim: Int): Seq[Column] = {
    val m = codebooks.size
    val sub = dim / m
    (0 until m).map(i => graft.functions.VectorFunctions
      .nearestCentroid(slice(vecCol, i * sub + 1, sub), codebooks(i)))
  }

  /** Encode the corpus: (idCol, codes array<int> of length m). One
    * compiled map pass; ties inside a subspace resolve to the smallest
    * code (NearestCentroid's contract), so encoding is deterministic.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, codebooks: Seq[Seq[(Int, Array[Double])]]): DataFrame = {
    require(codebooks.nonEmpty && dim % codebooks.size == 0,
      s"m must divide dim, got $dim/${codebooks.size}")
    corpus.select(col(idCol),
      array(codeExprs(col(vecCol), codebooks, dim): _*).as("codes"))
  }

  /** ADC top-k over an encoded corpus: for each query, approximate
    * squared L2 = sum over subspaces of LUT[sub][code], smallest k by
    * (distance, id). Output: (query_id, rank, id, adc_d2). The LUT
    * rides a broadcast crossJoin (|queries| rows — bounded by contract,
    * like bruteForceTopK's query set); the corpus side reads ONLY the
    * codes column. Distances compare raw and round for display only
    * (x06's boundary discipline).
    */
  def adcTopK(
      encoded: DataFrame, idCol: String, codesCol: String,
      queries: Seq[(Long, Array[Double])],
      codebooks: Seq[Seq[(Int, Array[Double])]], dim: Int,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val m = codebooks.size
    require(m >= 1 && dim % m == 0, s"m must divide dim, got $dim/$m")
    val sub = dim / m
    // per-query LUT: lut(i)(c) = ||q_i - codeword_c||^2, j ascending —
    // the oracle replays this exact summation order
    def lutFor(q: Array[Double]): Seq[Seq[Double]] = {
      require(q.length == dim, s"query length ${q.length} != dim $dim")
      (0 until m).map { i =>
        codebooks(i).sortBy(_._1).map { case (_, cw) =>
          var d2 = 0.0
          var j = 0
          while (j < sub) {
            val diff = q(i * sub + j) - cw(j)
            d2 += diff * diff
            j += 1
          }
          d2
        }
      }
    }
    val spark = encoded.sparkSession
    import spark.implicits._
    val luts = queries.map { case (qid, q) => (qid, lutFor(q)) }
      .toDF("query_id", "lut")
    // ascending-subspace sum of lookups, same association order as the
    // SQL twin's list_sum over m-ordered partials
    val adc = (0 until m).map(i =>
      element_at(element_at(col("lut"), i + 1),
        element_at(col(codesCol), i + 1) + 1))
      .reduce(_ + _)
    encoded.crossJoin(broadcast(luts))
      .select(col("query_id"), col(idCol), adc.as("__adc"))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("__adc"), col(idCol))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol),
        round(col("__adc"), 6).as("adc_d2"))
  }

  /** ADC top-kCand then EXACT re-rank to top-k — the paper's §V.C
    * two-stage search and the operator's fidelity dial: quantization
    * noise decides only which kCand candidates survive the cheap scan;
    * the final ordering is exact squared L2 over full vectors fetched
    * for the bounded |queries| x kCand candidate set (an equi-join on
    * id — narrow, never a corpus exchange). kCand is the same
    * spend-candidates-to-buy-fidelity knob as IVF's nprobe (SCALE.md
    * round-15 kNN sweep): on quasi-orthogonal corpora, where neighbor
    * gaps are small relative to quantization noise (PqSpec measures
    * ADC-alone recall collapsing exactly there), widening kCand is what
    * restores recall at the cost of kCand/corpus exact reads.
    */
  def adcTopKReranked(
      encoded: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, codesCol: String,
      queries: Seq[(Long, Array[Double])],
      codebooks: Seq[Seq[(Int, Array[Double])]], dim: Int,
      kCand: Int, k: Int): DataFrame = {
    require(kCand >= k, s"kCand ($kCand) must be >= k ($k)")
    val cand = adcTopK(encoded, idCol, codesCol, queries, codebooks,
      dim, kCand)
    val spark = encoded.sparkSession
    import spark.implicits._
    val qdf = queries.map { case (qid, q) => (qid, q.toSeq) }
      .toDF("query_id", "qvec")
    val d2 = aggregate(
      zip_with(col(vecCol), col("qvec"),
        (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
      lit(0.0), (acc, x) => acc + x)
    cand.select(col("query_id"), col(idCol))
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(qdf), Seq("query_id"))
      .select(col("query_id"), col(idCol), d2.as("__d2"))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("__d2"), col(idCol))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol),
        round(col("__d2"), 6).as("d2"))
  }

  /** Mean squared reconstruction error of a codebook over the corpus —
    * the training objective, used by PqSpec to assert Lloyd refinement
    * actually improves on the seed codebook (and by extension that
    * encode/codebook wiring is consistent: a code permutation bug would
    * show as a huge error).
    */
  def reconstructionError(
      corpus: DataFrame, vecCol: String, dim: Int,
      codebooks: Seq[Seq[(Int, Array[Double])]]): Double = {
    val m = codebooks.size
    require(m >= 1 && dim % m == 0, s"m must divide dim, got $dim/$m")
    val sub = dim / m
    val perSub = (0 until m).map { i =>
      graft.functions.VectorFunctions
        .nearestCentroidDist(slice(col(vecCol), i * sub + 1, sub),
          codebooks(i))
        .getField("dist")
    }
    corpus.select(perSub.reduce(_ + _).as("__d2"))
      .agg(avg(col("__d2"))).head().getDouble(0)
  }
}
