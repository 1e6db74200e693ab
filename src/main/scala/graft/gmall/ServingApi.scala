package graft.gmall

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ADS serving layer — the gmall-publisher REST API re-expressed as
  * engine-native queries (SURVEY.md §3.3). The reference's Spring Boot /
  * MyBatis / ClickHouse JDBC stack collapses to spark.sql over the
  * engine-written stats tables; the HTTP veneer is out of engine scope.
  */
object ServingApi {

  /** GMV for one yyyyMMdd day (mapper/ProductStatsMapper.java:10-11:
    * select sum(order_amount) from product_stats where toYYYYMMDD(stt)=?). */
  def gmv(productStats: DataFrame, date: Int): java.math.BigDecimal = {
    val r = productStats
      .filter(date_format(to_timestamp(col("stt")), "yyyyMMdd") === date.toString)
      .agg(sum(col("order_amount")).as("gmv"))
      .head()
    Option(r.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
  }

  /** The same query via SQL over a registered stats table (the exact
    * serving path: one filter + sum through Catalyst). */
  def gmvSql(spark: SparkSession, statsView: String, date: Int): DataFrame =
    spark.sql(
      s"""SELECT sum(order_amount) AS order_amount
         |FROM $statsView
         |WHERE date_format(to_timestamp(stt), 'yyyyMMdd') = '$date'""".stripMargin)
}
