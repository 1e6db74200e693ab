package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time scalar surface of the reference engine (SURVEY.md §2.7).
  *
  * All pure built-in `Column` expressions — they stay inside whole-stage
  * codegen and never leave the JVM hot loop. Reference semantics:
  *   - toTs   (util/DateTimeUtil.java:17-20): "yyyy-MM-dd HH:mm:ss" → epoch ms
  *   - toYMDhms (util/DateTimeUtil.java:12-15): timestamp → formatted string
  *   - age-from-birthday (dwm/OrderWideApp.java:109-114): floor(days/365)
  *   - date/hour split (dwm/OrderWideApp.java:59-61)
  */
object TimeFns {
  private val Fmt = "yyyy-MM-dd HH:mm:ss"

  /** F2: "yyyy-MM-dd HH:mm:ss" string → epoch millis (session TZ). */
  def toTs(c: Column): Column = unix_timestamp(c, Fmt) * lit(1000L)

  /** F3/F7: timestamp → "yyyy-MM-dd HH:mm:ss". */
  def toYmdHms(c: Column): Column = date_format(c, Fmt)

  /** F4/P6: derived calendar columns from a timestamp. */
  def createDate(c: Column): Column = date_format(c, "yyyy-MM-dd")
  def createHour(c: Column): Column = date_format(c, "HH")

  /** F5: age in whole years, reference keeps /365 (not months_between). */
  def ageYears(birthday: Column, asOf: Column): Column =
    floor(datediff(asOf, birthday) / lit(365))

  /** F13: ClickHouse toYYYYMMDD equivalent. */
  def toYyyymmdd(c: Column): Column = date_format(c, "yyyyMMdd")

  /** Tumbling-window start floored to `seconds`, as epoch seconds.
    * Equivalent to Spark's window(c, "Ns").start but usable where a plain
    * grouping column is preferred (keeps the agg a single hash-agg). */
  def windowStartEpoch(c: Column, seconds: Int): Column =
    (unix_timestamp(c) / lit(seconds)).cast("long") * lit(seconds)

  /** Window start as a formatted string (the reference's stt column). */
  def stt(c: Column, seconds: Int): Column =
    date_format(timestamp_seconds(windowStartEpoch(c, seconds)), Fmt)

  /** Window end (exclusive start + size) as formatted string (edt). */
  def edt(c: Column, seconds: Int): Column =
    date_format(timestamp_seconds(windowStartEpoch(c, seconds) + lit(seconds)), Fmt)
}
