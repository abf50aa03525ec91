package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair (the load-bearing subset of ftfy's `fix_encoding`):
  * undo UTF-8 text that was mis-decoded as Windows-1252 — the single most
  * common encoding corruption in crawled web text ("â€™" for "'",
  * "Ã©" for "é"), produced whenever a UTF-8 page is served without (or
  * with a wrong) charset declaration and re-encoded downstream.
  *
  * Repair rule, spec-pinned: map every char back to the Windows-1252 byte
  * it decodes from (the 0x80–0x9F row uses the cp1252 table, with the
  * five undefined slots passed through as their C1 control code points —
  * exactly the JDK decoder's information-preserving behavior, which makes
  * corrupt→repair a true bijection); if EVERY char maps AND the byte
  * string is strictly valid UTF-8 AND decoding changes something, accept
  * the repair, else return the input untouched. Iterated to a fixpoint
  * (≤ 3 rounds) so double-encoded text ("Ã¢â‚¬â„¢") also recovers.
  * The all-or-nothing validity condition is the safety heuristic: genuine
  * Latin-1-range prose (`"Â chose"`) almost never forms valid multi-byte
  * UTF-8 when byte-mapped, so false repairs need an adversarial string,
  * not a real page — same trade ftfy documents.
  *
  * [[Mojibake.corrupt]] is the inverse transform (UTF-8 bytes decoded as
  * cp1252) — shipped because round-trip corruption is how the repair is
  * honestly gated (`t_mojibake`: md5(repair(corrupt(text))) must equal
  * md5(text) straight off the documents table) and how fixture corpora
  * for encoding tests are built.
  *
  * Both are native codegen'd expressions (`graft_fix_mojibake`,
  * `graft_mojibake`): single static call inside the generated stage, no
  * UDF boxing, ASCII fast path returns the input object unchanged.
  */
object Mojibake {

  /** Windows-1252 byte → char for 0x80–0x9F (elsewhere: Latin-1
    * identity). The five undefined bytes (0x81 8D 8F 90 9D) map to their
    * C1 controls, matching the JDK decoder.
    */
  private val C1: Array[Char] = Array(
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178
  ).map(_.toChar)

  /** char → cp1252 byte (unsigned int), or -1 when the char is not in the
    * cp1252 image. */
  private val inv: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer](64)
    C1.zipWithIndex.foreach { case (c, i) => m.put(c, 0x80 + i) }
    m
  }

  private def charToByte(c: Char): Int =
    if (c < 0x80) c.toInt
    else if (c >= 0xA0 && c <= 0xFF) c.toInt
    else {
      val v = inv.get(c)
      if (v == null) -1 else v.intValue()
    }

  /** UTF-8 bytes of the input decoded as Windows-1252 — the corruption
    * this module repairs. Pure ASCII is a fixed point (returns the input
    * object).
    */
  def corrupt(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s
    val b = s.getBytes
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val u = b(i) & 0xff
      sb.append(if (u < 0x80 || u >= 0xA0) u.toChar else C1(u - 0x80))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** One repair round: null when the string is not repairable (a char
    * outside the cp1252 image, bytes not valid UTF-8, or nothing would
    * change).
    */
  private def repairOnce(str: String): String = {
    val n = str.length
    val bytes = new Array[Byte](n)
    var suspicious = false
    var i = 0
    while (i < n) {
      val b = charToByte(str.charAt(i))
      if (b < 0) return null
      if (b >= 0x80) suspicious = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!suspicious) return null
    val dec = UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val out = dec.decode(ByteBuffer.wrap(bytes)).toString
      if (out == str) null else out
    } catch { case _: CharacterCodingException => null }
  }

  def repair(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s // ASCII: nothing to repair
    val orig = s.toString
    var cur = orig
    var rounds = 0
    var next = repairOnce(cur)
    while (next != null && rounds < 3) {
      cur = next
      rounds += 1
      next = repairOnce(cur)
    }
    if (cur == orig) s else UTF8String.fromString(cur)
  }
}

/** `graft_fix_mojibake(string)` — repair cp1252-mojibake, identity on
  * everything else. */
case class FixMojibakeExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.FixMojibakeName
  override protected def nullSafeEval(s: Any): Any =
    Mojibake.repair(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mojibake.repair($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_mojibake(string)` — the inverse corruption (UTF-8 bytes decoded
  * as cp1252); fixture synthesis + round-trip gating. */
case class CorruptMojibakeExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.MojibakeName
  override protected def nullSafeEval(s: Any): Any =
    Mojibake.corrupt(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mojibake.corrupt($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
