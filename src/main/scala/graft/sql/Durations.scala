package graft.sql

import java.time.Duration

/** Dialect duration literal parsing (reference utils.go:446-504):
  * Go-style compound forms (`72h3m0.5s`) plus `N unit` with
  * units (seconds|minutes|hours|days|weeks|years|s|m|h|d|w|y);
  * **year = 52 weeks exactly** (reference utils.go:460-465); months
  * unsupported. Values map to Spark's DayTimeIntervalType via
  * java.time.Duration.
  */
object Durations {
  private val unitSeconds: Map[String, Long] = {
    val base = Map(
      "s" -> 1L, "m" -> 60L, "h" -> 3600L, "d" -> 86400L,
      "w" -> 7L * 86400L, "y" -> 52L * 7L * 86400L)
    base ++ Map(
      "second" -> base("s"), "seconds" -> base("s"),
      "minute" -> base("m"), "minutes" -> base("m"),
      "hour" -> base("h"), "hours" -> base("h"),
      "day" -> base("d"), "days" -> base("d"),
      "week" -> base("w"), "weeks" -> base("w"),
      "year" -> base("y"), "years" -> base("y"))
  }

  private val numUnit = """^\s*(-?\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*$""".r
  // ms|us|µs|ns BEFORE m/s — leftmost-first alternation would otherwise
  // match "100ms" as "100m" + dangling "s" (Go ParseDuration accepts
  // both "us" and "µs" spellings; String() emits "µs")
  private val goPart = """(\d+(?:\.\d+)?)(ms|us|µs|ns|h|m|s)""".r

  /** Parse a dialect duration; None if the string isn't one. */
  def parse(s: String): Option[Duration] = s.trim match {
    case numUnit(n, u) if unitSeconds.contains(u.toLowerCase) =>
      Some(secondsToDuration(n.toDouble * unitSeconds(u.toLowerCase)))
    case t0 =>
      // Go compound form: the sign applies to the WHOLE value
      // (-1h30m = -(1h30m)), not the first component
      val neg = t0.startsWith("-")
      val t = if (neg) t0.drop(1) else t0
      if (t.nonEmpty && goPart.findFirstIn(t).isDefined &&
          goPart.replaceAllIn(t, "").isEmpty) {
        val total = goPart.findAllMatchIn(t).foldLeft(0.0) { (acc, m) =>
          val v = m.group(1).toDouble
          acc + (m.group(2) match {
            case "h" => v * 3600; case "m" => v * 60; case "s" => v
            case "ms" => v / 1e3; case "us" | "µs" => v / 1e6; case "ns" => v / 1e9
          })
        }
        Some(secondsToDuration(if (neg) -total else total))
      } else None
  }

  private def secondsToDuration(secs: Double): Duration =
    Duration.ofNanos(math.round(secs * 1e9))

  /** Go `Duration.String()` formatting (reference value.go:497):
    * every unit below the leading one is printed — "72h3m0.5s",
    * "1h30m0s", "1m30s", "0s" — and sub-second values use ns/µs/ms
    * forms with stripped fractions ("100ms", "1.5µs"), exactly like
    * Go. Sinks.formatDuration is the distributed column-algebra mirror
    * of this function (DurationsSpec cross-checks the two). */
  def format(d: Duration): String = {
    val totalNanos = d.toNanos
    if (totalNanos == 0) return "0s"
    val neg = totalNanos < 0
    var n = math.abs(totalNanos)
    val sb = new StringBuilder(if (neg) "-" else "")
    def frac(whole: Long, part: Long, width: Int): String =
      if (part == 0) whole.toString
      else whole.toString + "." +
        s"%0${width}d".format(part).reverse.dropWhile(_ == '0').reverse
    if (n < 1000L) sb.append(n).append("ns")
    else if (n < 1000000L) sb.append(frac(n / 1000L, n % 1000L, 3)).append("µs")
    else if (n < 1000000000L) sb.append(frac(n / 1000000L, n % 1000000L, 6)).append("ms")
    else {
      val h = n / 3600000000000L; n %= 3600000000000L
      val m = n / 60000000000L; n %= 60000000000L
      val secStr = frac(n / 1000000000L, n % 1000000000L, 9)
      if (h > 0) sb.append(h).append("h").append(m).append("m").append(secStr).append("s")
      else if (m > 0) sb.append(m).append("m").append(secStr).append("s")
      else sb.append(secStr).append("s")
    }
    sb.toString
  }
}
