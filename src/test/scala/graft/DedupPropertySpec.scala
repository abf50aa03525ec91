package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import graft.dedup.Dedup
import graft.text.TextAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded randomized properties: the DataFrame operators must agree with
  * direct Scala transcriptions of their specs on arbitrary word-soup input
  * (the style LayoutSpec uses for the clustering fold).
  */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val rnd = new Random(42)
  private val vocab = Vector("spark", "table", "row", "scan", "agg", "key", "value",
    "fast", "slow", "join", "merge", "window", "batch", "column", "the", "a", "de")
  private def doc(): String =
    Vector.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private val docs: Seq[(Long, String)] = (0L until 60L).map(i => i -> doc())

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8)).map(b => f"${b & 0xff}%02x").mkString

  private def refShingleSet(text: String, n: Int = 3): Set[String] = {
    val ws = text.trim.split("\\s+").toVector
    if (ws.length < n) Set.empty
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" ")).toSet
  }

  test("minhash signature == direct min over seeded md5 of the shingle set") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.minhashSignatures(df, "doc_id", "text", 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getString).toVector).toMap
    docs.foreach { case (id, text) =>
      val sh = refShingleSet(text)
      if (sh.isEmpty) assert(!got.contains(id))
      else {
        val expected = (0 until 8).map(h => sh.map(s => md5Hex(s"$h:$s")).min).toVector
        assert(got(id) == expected, s"doc $id")
      }
    }
  }

  test("jaccard pairs: inter/uni match direct set arithmetic; bounds hold") {
    import spark.implicits._
    val withGroup = docs.map { case (id, t) => (id, t, s"g${id % 5}") }
    val df = withGroup.toDF("doc_id", "text", "source")
    val got = Dedup.jaccardWithinGroups(df, "doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val sets = docs.map { case (id, t) => id -> refShingleSet(t) }.toMap
    for {
      (id1, _, g1) <- withGroup; (id2, _, g2) <- withGroup
      if id1 < id2 && g1 == g2
    } {
      val inter = sets(id1).intersect(sets(id2)).size
      val uni = sets(id1).union(sets(id2)).size
      if (inter > 0) {
        assert(got((id1, id2)) == ((inter.toLong, uni.toLong)), s"pair $id1-$id2")
        assert(inter <= math.min(sets(id1).size, sets(id2).size) && uni >= math.max(sets(id1).size, sets(id2).size))
      } else assert(!got.contains((id1, id2)))
    }
  }

  test("simhash is word-order invariant (bag-of-words semantics)") {
    import spark.implicits._
    val pairs = docs.take(20).map { case (id, t) =>
      (id, t, new Random(id).shuffle(t.split(" ").toVector).mkString(" "))
    }
    val df = pairs.toDF("id", "orig", "shuf")
    val rows = df.select(Dedup.simhash64("orig"), Dedup.simhash64("shuf")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("tokenCount matches direct split count; fingerprint invariant to ws runs") {
    import spark.implicits._
    val noisy = docs.map { case (id, t) => (id, "  " + t.replace(" ", "   ") + " ") }
    val df = noisy.toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalytics.tokenCount($"text"), TextAnalytics.fingerprint($"text"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    docs.foreach { case (id, t) =>
      assert(got(id)._1 == t.split("\\s+").count(_.nonEmpty))
      assert(got(id)._2 == md5Hex(t.toLowerCase)) // normalized == original (single spaces, lowercase vocab)
    }
  }
}
