package graft.gmall

import graft.streaming.Sinks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DWD db layer — the BaseDBApp job (dwd/BaseDBApp.java): dynamic,
  * config-driven routing of CDC changelogs.
  *
  * The reference connects the data stream with a broadcast config stream
  * (table_process rows) and, per record, looks up `sourceTable-operateType`
  * to decide sink topic/table + column allowlist. Spark has no broadcast
  * *stream*; the equivalent observable behavior — config changes take
  * effect on subsequent records — comes from re-reading the small config
  * table every micro-batch inside foreachBatch and broadcast-joining it.
  */
object DbRouter {

  /** P3 + J5 (BaseDBApp.java:55-84, TableProcessFunction.java:48-69):
    * drop deletes, join the envelope stream against the config table,
    * keep the routing metadata. Unmatched records are dropped exactly like
    * the reference's "no config" branch. */
  def route(envelopes: DataFrame, config: DataFrame): DataFrame =
    envelopes
      .filter(col("type") =!= "delete")
      .join(broadcast(config),
        envelopes("tableName") === config("source_table") &&
          envelopes("type") === config("operate_type"))

  /** P5 (TableProcessFunction.java:71-77): per-route column pruning of the
    * JSON `after` payload down to the configured allowlist. Pure expression
    * — builds a pruned JSON object from the allowed keys. */
  def pruneAfter(routed: DataFrame): DataFrame =
    routed.withColumn(
      "after",
      to_json(map_filter(
        from_json(col("after"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)),
        (k, _) => array_contains(split(col("sink_columns"), ","), k))))

  /** K2/K4 fan-out (BaseDBApp.java:87-98): kafka-typed routes get a per-row
    * `topic` column (the dynamic-topic producer); hbase-typed routes upsert
    * into their dim table. Batch-callable; wrap in foreachBatch for
    * streaming. `dimRoot` is the dim store root path. */
  def writeBatch(routed: DataFrame, dimRoot: String): DataFrame = {
    val spark = routed.sparkSession
    import spark.implicits._
    val pruned = pruneAfter(routed)
    val dimRoutes = pruned.filter(col("sink_type") === "hbase")
    // only the tiny (table, pk) route list reaches the driver; payload rows
    // stay distributed through read.json -> upsert
    dimRoutes.select(col("sink_table"), col("sink_pk")).distinct().collect()
      .foreach { r =>
        val table = r.getString(0)
        val pk = Option(r.getString(1)).filter(_.nonEmpty).getOrElse("id")
        val payload = dimRoutes.filter(col("sink_table") === table)
          .select(col("after")).as[String]
        Sinks.upsertBatch(spark.read.json(payload), s"$dimRoot/$table", pk)
      }
    // kafka routes: rows shaped for the dynamic-topic producer
    pruned.filter(col("sink_type") === "kafka")
      .select(col("sink_table").as("topic"), col("after").as("value"))
  }
}
