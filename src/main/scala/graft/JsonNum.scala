package graft

/** Locale-stable numeric formatting for the hand-assembled JSON records
  * the bench/probe mains emit (and the analysis scripts `json.load`).
  * Scala's `f"$v%.3f"` compiles to a default-locale `String.format`, so
  * on a comma-decimal JVM (de/fr) it writes `0,360` — invalid JSON that
  * breaks every downstream consumer. All JSON number emission goes
  * through here instead. */
object JsonNum {
  def fmt(v: Double, digits: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
}
