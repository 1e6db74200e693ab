package graft.gmall

import org.apache.spark.sql.types._

/** Declared schemas for the reference's data model (SURVEY.md §1.2):
  * Spark streaming cannot infer JSON schemas, so the log envelope and the
  * per-table CDC payloads are declared here.
  *
  * Log envelope: gmall-realtime dwd/BaseLogApp.java:52-131 — nested
  * `common`/`page`/`start` objects, `displays` array, epoch-ms `ts`.
  * CDC payloads: the MySQL tables routed by dwd/BaseDBApp.java via
  * table_process config; field sets from bean/OrderInfo.java,
  * bean/OrderDetail.java, bean/PaymentInfo.java and the dim tables read in
  * dwm/OrderWideApp.java:100-195.
  */
object Schemas {

  val common: StructType = StructType(Seq(
    StructField("ar", StringType),      // area/province id
    StructField("ba", StringType),      // brand
    StructField("ch", StringType),      // channel
    StructField("is_new", StringType),  // "1"/"0", rewritten by T1
    StructField("md", StringType),      // model
    StructField("mid", StringType),     // device id (the key of T1/T2/T3)
    StructField("os", StringType),
    StructField("uid", StringType),
    StructField("vc", StringType)))     // version code

  val page: StructType = StructType(Seq(
    StructField("during_time", LongType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("last_page_id", StringType),
    StructField("page_id", StringType),
    StructField("source_type", StringType)))

  val display: StructType = StructType(Seq(
    StructField("display_type", StringType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("order", LongType),
    StructField("pos_id", LongType)))

  val start: StructType = StructType(Seq(
    StructField("entry", StringType),
    StructField("loading_time", LongType),
    StructField("open_ad_id", LongType),
    StructField("open_ad_ms", LongType),
    StructField("open_ad_skip_ms", LongType)))

  /** The full app-log line. */
  val log: StructType = StructType(Seq(
    StructField("common", common),
    StructField("page", page),
    StructField("displays", ArrayType(display)),
    StructField("start", start),
    StructField("ts", LongType)))

  /** OrderInfo fact (bean/OrderInfo.java). Money is decimal end-to-end. */
  val orderInfo: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("province_id", LongType),
    StructField("order_status", StringType),
    StructField("user_id", LongType),
    StructField("total_amount", DecimalType(16, 2)),
    StructField("activity_reduce_amount", DecimalType(16, 2)),
    StructField("coupon_reduce_amount", DecimalType(16, 2)),
    StructField("original_total_amount", DecimalType(16, 2)),
    StructField("feight_fee", DecimalType(16, 2)),
    StructField("expire_time", StringType),
    StructField("create_time", StringType)))   // "yyyy-MM-dd HH:mm:ss"

  /** OrderDetail fact (bean/OrderDetail.java). */
  val orderDetail: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("order_id", LongType),
    StructField("sku_id", LongType),
    StructField("order_price", DecimalType(16, 2)),
    StructField("sku_num", LongType),
    StructField("sku_name", StringType),
    StructField("create_time", StringType),
    StructField("split_total_amount", DecimalType(16, 2)),
    StructField("split_activity_amount", DecimalType(16, 2)),
    StructField("split_coupon_amount", DecimalType(16, 2))))

  /** PaymentInfo fact (bean/PaymentInfo.java). */
  val paymentInfo: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("order_id", LongType),
    StructField("user_id", LongType),
    StructField("payment_type", StringType),
    StructField("total_amount", DecimalType(16, 2)),
    StructField("callback_time", StringType),
    StructField("create_time", StringType)))

  /** Dim: user_info (age from birthday, OrderWideApp.java:109-114). */
  val userInfo: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("birthday", DateType),
    StructField("gender", StringType)))

  val baseProvince: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("area_code", StringType),
    StructField("iso_code", StringType),
    StructField("iso_3166_2", StringType)))

  val skuInfo: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("spu_id", LongType),
    StructField("tm_id", LongType),
    StructField("category3_id", LongType),
    StructField("sku_name", StringType)))

  val spuInfo: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("spu_name", StringType)))

  val baseTrademark: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("tm_name", StringType)))

  val baseCategory3: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  /** table_process config row (bean/TableProcess.java): drives J5 routing. */
  val tableProcess: StructType = StructType(Seq(
    StructField("source_table", StringType),
    StructField("operate_type", StringType),
    StructField("sink_type", StringType),     // kafka | hbase
    StructField("sink_table", StringType),
    StructField("sink_columns", StringType),  // CSV allowlist
    StructField("sink_pk", StringType),
    StructField("sink_extend", StringType)))
}
