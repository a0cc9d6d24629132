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
    * `to_date(col, fmt)` parse of the whole column.
    *
    * The pattern is built from the MATCHED SPANS: each regex group is
    * replaced by its field token and the literal text between groups
    * (the actual separators — '/', '-', ', ', …) is kept verbatim.
    * The previous single-separator guess could emit a format the
    * sniffed value itself doesn't parse under ("Mar 5, 2020" sniffed
    * as a date but got "MMM d yyyy", which to_date then nulls —
    * classifying a column as dates and failing to parse it). Month
    * names longer than 3 chars emit "MMMM" (DateTimeFormatter's "MMM"
    * accepts abbreviations only). */
  def sparkFormat(value: String): Option[String] = {
    if (value == null) return None
    val v = value.trim
    patterns.collectFirst(Function.unlift { case (re, order) =>
      re.findPrefixMatchOf(v).flatMap { m =>
        def yr(s: String) = if (s.length == 2) "yy" else "yyyy"
        def mon(s: String) = if (s.length > 3) "MMMM" else "MMM"
        // field token per 1-based regex group, in group order
        val toks: Option[Seq[String]] = order match {
          case "mdy" => Some(Seq("M", "d", yr(m.group(3))))
          case "ymd" => Some(Seq(yr(m.group(1)), "M", "d"))
          case "dmy" => Some(Seq("d", "M", yr(m.group(3))))
          case "dby" => Some(Seq("d", mon(m.group(2)), yr(m.group(3))))
          case "bdy" => Some(Seq(mon(m.group(1)), "d", yr(m.group(3))))
          case "y4"  => Some(Seq("yyyy"))
          case _     => None
        }
        toks.map { ts =>
          val sb = new StringBuilder
          var pos = m.start
          var gi = 1
          while (gi <= ts.length) {
            sb.append(v.substring(pos, m.start(gi))) // literal separators
            sb.append(ts(gi - 1))
            pos = m.end(gi)
            gi += 1
          }
          sb.toString
        }
      }
    })
  }

  /** Distributed `to_date` with the PYTHON two-digit-year pivot.
    * [[sniff]] classifies per strptime (69-99 → 19xx), but Spark's
    * reduced "yy" field bases at 2000 (69-99 → 20xx) — without the
    * correction the driver-side classification and the full-column
    * parse disagree by a century on 69-99 years. Exact: every
    * correctable year is 2069-2099, and −1200 months maps leap years
    * onto leap years (2072↔1972, …; no century boundary in range). */
  def parseDate(c: org.apache.spark.sql.Column, fmt: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.{functions => F}
    val d = F.to_date(c, fmt)
    if (fmt.contains("yy") && !fmt.contains("yyyy"))
      F.when(F.year(d) >= 2069, F.add_months(d, -1200)).otherwise(d)
    else d
  }
}
