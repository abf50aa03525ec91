package graft

import graft.table.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-order clustering claims, proven quantitatively: the interleave
  * matches a reference implementation, and z-clustered range partitions
  * carry tight min/max bounds on BOTH dimensions where linear clustering
  * leaves the second dimension unprunable. Value-exactness of the
  * interleave vs DuckDB is gated by the driver (`q_zorder`).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def refZ(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("interleave matches the reference bit-by-bit on randomized inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 500).map(_ => (rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 20).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) == refZ(a, b, 20), s"($a, $b)")
    }
    // z is a bijection on the grid: distinct inputs → distinct keys
    assert(got.values.toSet.size == got.size)
  }

  /** Per-range-partition (min, max) widths of each dimension after
    * clustering, plus how many partitions a band-filter on `b` touches.
    */
  private def boundsOf(clustered: org.apache.spark.sql.DataFrame,
                       bLo: Long, bHi: Long): (Double, Double, Int) = {
    val parts = clustered
      .groupBy(spark_partition_id().as("p"))
      .agg(min("a").as("a0"), max("a").as("a1"), min("b").as("b0"), max("b").as("b1"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val aw = parts.map(p => p._2 - p._1 + 1.0).sum / parts.length
    val bw = parts.map(p => p._4 - p._3 + 1.0).sum / parts.length
    val touched = parts.count(p => p._3 <= bHi && bLo <= p._4)
    (aw, bw, touched)
  }

  test("z-clustering bounds BOTH dimensions; linear clustering leaves b unprunable") {
    import spark.implicits._
    // full 64×64 grid, 16 range partitions (one "file" each)
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    val z = ZOrder.clusterByZ(grid, col("a"), col("b"), bits = 6, numPartitions = 16)
    val linear = grid.repartitionByRange(16, col("a"))
    val (zAw, zBw, zTouched) = boundsOf(z, 8L, 15L)
    val (lAw, lBw, lTouched) = boundsOf(linear, 8L, 15L)
    // a perfect 16-way z split of a 64×64 grid gives 16×16 rectangles
    assert(zAw <= 24 && zBw <= 24, s"z rectangles must be compact, got a=$zAw b=$zBw")
    assert(lAw <= 8, s"linear is tight on a, got $lAw")
    assert(lBw >= 60, s"linear leaves b at full domain, got $lBw")
    // the point of the exercise: an 8-wide b-band touches a fraction of
    // z files and EVERY linear file
    assert(lTouched == 16, s"b-filter prunes nothing under linear clustering: $lTouched")
    assert(zTouched <= 8, s"b-filter must skip most z files, touched $zTouched of 16")
  }
}
