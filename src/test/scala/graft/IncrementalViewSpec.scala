package graft

import java.nio.file.Files

import graft.table.{IncrementalView, SnapshotTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-view maintenance contract: every refresh folds exactly
  * the appended delta into the stored state (equal to a full recompute at
  * every step), refreshes are watermarked and idempotent, and delete-only
  * source commits don't disturb the view. End-state value-exactness vs
  * DuckDB is gated by the driver (`q_incr_view`).
  */
class IncrementalViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def fixture() = {
    val root = Files.createTempDirectory("graft-iview-spec").toString
    (new SnapshotTable(s"$root/src"),
      new IncrementalView(s"$root/src", s"$root/view", "g", "v"))
  }

  private def viewMap(view: IncrementalView) =
    view.read(spark).map(_.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap)
      .getOrElse(Map.empty)

  private def fullMap(src: SnapshotTable) =
    src.read(spark).map(_.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("long").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap)
      .getOrElse(Map.empty)

  test("each refresh equals a full recompute; groups merge across deltas") {
    val (src, view) = fixture()
    // crawl 1: groups a, b — crawl 2 overlaps a and adds c — crawl 3 only a
    src.append(Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("g", "v"), "c1")
    assert(view.refresh(spark).contains(1))
    assert(viewMap(view) == Map("a" -> ((2L, 3L)), "b" -> ((1L, 10L))))
    src.append(Seq(("a", 4L), ("c", 100L)).toDF("g", "v"), "c2")
    assert(view.refresh(spark).contains(2))
    assert(viewMap(view) == fullMap(src))
    assert(viewMap(view)("a") == ((3L, 7L)), "overlapping group must merge, not replace")
    src.append(Seq(("a", 8L)).toDF("g", "v"), "c3")
    assert(view.refresh(spark).contains(3))
    assert(viewMap(view) == fullMap(src))
  }

  test("refresh is watermarked: nothing new → None, state untouched") {
    val (src, view) = fixture()
    src.append(Seq(("a", 1L)).toDF("g", "v"), "c1")
    assert(view.refresh(spark).contains(1))
    val before = viewMap(view)
    assert(view.refresh(spark).isEmpty, "no new source version → no-op")
    assert(view.refresh(spark).isEmpty)
    assert(viewMap(view) == before)
    assert(view.coveredVersion == 1)
  }

  test("a skipped refresh catches up over several source versions at once") {
    val (src, view) = fixture()
    src.append(Seq(("a", 1L)).toDF("g", "v"), "c1")
    src.append(Seq(("a", 2L), ("b", 3L)).toDF("g", "v"), "c2")
    src.append(Seq(("b", 4L)).toDF("g", "v"), "c3")
    // one refresh covers all three pending versions
    assert(view.refresh(spark).contains(3))
    assert(viewMap(view) == Map("a" -> ((2L, 3L)), "b" -> ((2L, 7L))))
    assert(view.coveredVersion == 3)
  }
}
