package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for TWO-dimensional data skipping — the
  * write-time layout that makes min/max pruning work on BOTH of two query
  * dimensions at once. Linear clustering on column A gives parquet
  * footers/manifests tight A-bounds but full-domain B-bounds in every
  * file, so B-filters prune nothing; interleaving the bits of (A, B) into
  * one sort key gives every range-partitioned file a small RECTANGLE of
  * the (A, B) space, so point/range filters on either dimension skip most
  * files (Iceberg/Delta expose the same trick as `zorder by`; here it is
  * a pure expression + `repartitionByRange`, nothing engine-private).
  *
  * The interleave is integer shift/mask arithmetic only — deterministic,
  * codegen'd, and replayed bit-exactly by the DuckDB oracle
  * (`q_zorder`). ZOrderSpec proves the locality claim quantitatively:
  * per-partition bound widths on both dimensions, and files touched by a
  * B-filter, z-clustered vs linearly clustered.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative longs:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. `bits ≤ 31`
    * keeps the result in the positive BIGINT range. Inputs outside
    * `[0, 2^bits)` would alias (high bits dropped) — callers bucket or
    * clamp first, same precondition as every hash-bucket operator here.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** Range-cluster `df` into `numPartitions` z-contiguous partitions (one
    * output file each under a plain `write`): each partition covers a
    * compact rectangle of the (a, b) space. The z key is kept as `zCol`
    * so a writer can also record it as a manifest stats column.
    */
  def clusterByZ(df: DataFrame, a: Column, b: Column, bits: Int,
                 numPartitions: Int, zCol: String = "zval"): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be positive, got $numPartitions")
    df.withColumn(zCol, zValue(a, b, bits))
      .repartitionByRange(numPartitions, col(zCol))
  }
}
