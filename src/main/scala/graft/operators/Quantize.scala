package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization for embedding columns — the
  * standard 4x memory/IO reduction for ANN indexes: scale = max|v|/127,
  * code_i = round(v_i/scale). Rounding is floor(x+0.5) explicitly so the
  * arithmetic is the same deterministic double math in any engine
  * (round() half-rule conventions differ across engines; floor doesn't).
  *
  * The scale is materialized as its own column before the per-element
  * lambda so it's computed once per row, not once per element
  * (CollapseProject keeps non-cheap aliases un-inlined).
  */
object Quantize {

  /** Adds `scaleCol` (double) and `codesCol` (array<int> in [-127,127])
    * for the given array<float|double> column. Zero vectors quantize to
    * all-zero codes with scale 0.
    */
  def withInt8(df: DataFrame, vecCol: String, scaleCol: String,
      codesCol: String): DataFrame = {
    val absMax = array_max(transform(col(vecCol),
      v => abs(v.cast(DoubleType))))
    df.withColumn(scaleCol, (absMax / 127.0).cast(DoubleType))
      .withColumn(codesCol,
        when(col(scaleCol) === 0.0,
          transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol),
            v => floor(v.cast(DoubleType) / col(scaleCol) + 0.5)
              .cast(IntegerType))))
  }

  /** Reconstruct doubles from codes: v_i ≈ code_i * scale. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast(DoubleType) * scale)
}
