package graft.util

/** Locale-safe JSON number formatting shared by the JSON-emitting mains
  * (Bench, ExtractMain): a comma-decimal default locale would make the
  * machine-readable output line unparseable, and NaN/Infinity are not
  * valid JSON tokens (emitted as null).
  */
object JsonFmt {
  def d(v: Double, dec: Int): String =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) "null"
    else String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
}
