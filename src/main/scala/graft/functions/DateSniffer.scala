package graft.functions

import java.time.LocalDate
import scala.util.matching.Regex

/** Date sniffing for string columns.
  *
  * Port of the reference's `isdate` (utils.py:44-129, itself from
  * nl4dv): 8 anchored regexes over the formats M*D*Y, Y*M*D, D*M*Y,
  * D*Mon(*Y), Mon*D(*Y), and bare year 1800-2029, with python strptime's
  * two-digit-year pivot (00-68 → 20xx, 69-99 → 19xx).
  *
  * Used driver-side on sampled values during profiling; full-column
  * parsing happens distributed via a `coalesce(to_date(...))` chain
  * built from the matched format.
  */
object DateSniffer {

  private val MONTHS = "January|February|March|April|May|June|July|August|September|October|November|December|Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"
  private val monthNum: Map[String, Int] =
    List("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec")
      .zipWithIndex.map { case (m, i) => m -> (i + 1) }.toMap

  private val D = "([1|2][0-9]|[3][0|1]|[0]?[1-9])"
  private val M = "([1][0-2]|[0]?[1-9])"
  private val Y = "([1-9][0-9]{3}|[0-9]{2})"
  private val SEP = "[-,.\\/]+"
  private val SEPS = "[-,.\\/\\s]+"

  /** (regex, field order) in reference priority order (utils.py:50-113).
    * b = month name; lowercase y allows 2-digit years. */
  private val patterns: Seq[(Regex, String)] = Seq(
    (s"$M$SEP$D$SEP$Y".r, "mdy"),
    (s"$Y$SEP$M$SEP$D".r, "ymd"),
    (s"$D$SEP$M$SEP$Y".r, "dmy"),
    (s"$D$SEPS($MONTHS)$SEPS$Y".r, "dby"),
    (s"$D$SEPS($MONTHS)".r, "db"),
    (s"($MONTHS)$SEPS$D$SEPS$Y".r, "bdy"),
    (s"($MONTHS)$SEPS$D".r, "bd"),
    ("(1[8-9][0-9][0-9]|20[0-2][0-9])".r, "y4")
  )

  private def year(s: String): Int =
    if (s.length == 2) { val y = s.toInt; if (y <= 68) 2000 + y else 1900 + y }
    else s.toInt

  private def month(s: String): Int = monthNum(s.toLowerCase.take(3))

  /** @return Some(parsed date) if the value looks like a date (regex
    *         match anchored at the start, like python re.match). */
  def sniff(value: String): Option[LocalDate] = {
    if (value == null) return None
    val v = value.trim
    patterns.collectFirst(Function.unlift { case (re, order) =>
      re.findPrefixMatchOf(v).flatMap { m =>
        val g = m.subgroups
        try {
          val d = order match {
            case "mdy" => LocalDate.of(year(g(2)), g(0).toInt, g(1).toInt)
            case "ymd" => LocalDate.of(year(g(0)), g(1).toInt, g(2).toInt)
            case "dmy" => LocalDate.of(year(g(2)), g(1).toInt, g(0).toInt)
            case "dby" => LocalDate.of(year(g(2)), month(g(1)), g(0).toInt)
            case "db"  => LocalDate.of(1900, month(g(1)), g(0).toInt)
            case "bdy" => LocalDate.of(year(g(2)), month(g(0)), g(1).toInt)
            case "bd"  => LocalDate.of(1900, month(g(0)), g(1).toInt)
            case "y4"  => LocalDate.of(g(0).toInt, 1, 1)
          }
          Some(d)
        } catch { case _: Exception => None }
      }
    })
  }

  def isDate(value: String): Boolean = sniff(value).isDefined

  /** Spark datetime pattern for a sampled value's detected format —
    * the bridge from driver-side sniffing to a distributed
    * `to_date(col, fmt)` parse of the whole column. */
  def sparkFormat(value: String): Option[String] = {
    if (value == null) return None
    val v = value.trim
    patterns.collectFirst(Function.unlift { case (re, order) =>
      re.findPrefixMatchOf(v).flatMap { m =>
        val g = m.subgroups
        val sep = if (v.contains("/")) "/" else if (v.contains("-")) "-" else if (v.contains(".")) "." else " "
        def yr(s: String) = if (s.length == 2) "yy" else "yyyy"
        order match {
          case "mdy" => Some(s"M${sep}d$sep${yr(g(2))}")
          case "ymd" => Some(s"${yr(g(0))}${sep}M${sep}d")
          case "dmy" => Some(s"d${sep}M$sep${yr(g(2))}")
          case "dby" => Some(s"d${sep}MMM$sep${yr(g(2))}")
          case "bdy" => Some(s"MMM${sep}d$sep${yr(g(2))}")
          case "y4"  => Some("yyyy")
          case _     => None
        }
      }
    })
  }
}
