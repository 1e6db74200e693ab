package graft

import graft.operators.Versioned
import org.apache.spark.sql.functions._

/** Throwaway probe (r19, not part of the driver contract): price the
  * driver-local manifest decode against the distributed read, and a
  * full store open through each path, to attribute the k-family A/B
  * regression to decode cost vs plan-embedding cost. */
object ProfManifest {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tuned("local[32]", "32")
    import spark.implicits._
    val dir = s"/dev/shm/graft-profman-${System.nanoTime()}"
    val base = spark.range(0, 200000)
      .select(col("id").as("k"), (col("id") % 8).as("bucket"),
        (col("id") * 3).cast("long").as("x"))
    Versioned.init(spark, dir, "bucket", base, statsCol = Some("k"),
      statsCols = Seq("x"))
    Versioned.deleteKeysDv(spark, dir, "bucket", "k",
      base.filter(col("k") % 97 === 0).select(col("k"), col("bucket")))
    val v = Versioned.latest(dir)
    val md = Versioned.manifestDir(dir, v)
    val sch = org.apache.spark.sql.types.DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(md, "_manifest_schema.json").toPath),
        java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    def time[A](label: String, reps: Int)(f: => A): Unit = {
      f // warm
      val t0 = System.nanoTime()
      for (_ <- 1 to reps) f
      println(f"[profman] $label%-34s ${(System.nanoTime() - t0) / 1e6 / reps}%9.2f ms/op")
    }
    val rows = graft.operators.ManifestLocal.readRows(md, sch).get
    println(s"[profman] manifest rows=${rows.length} " +
      s"bytes=${new java.io.File(md).listFiles().map(_.length).sum}")
    time("local decode (readRows)", 20) {
      graft.operators.ManifestLocal.readRows(md, sch).get
    }
    time("createDataFrame(local rows)", 20) {
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), sch)
    }
    time("local rows -> select(f,dv).collect", 20) {
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), sch)
        .select(col("file"), col("dv")).collect()
    }
    time("spark.read manifest collect", 10) {
      spark.read.schema(sch).parquet(md)
        .select(col("file"), col("dv")).collect()
    }
    sys.props("graft.manifest.nolocal") = "1"
    time("Versioned.read().count NOLOCAL", 5) {
      Versioned.read(spark, dir).count()
    }
    time("readPoint NOLOCAL", 5) {
      Versioned.readPoint(spark, dir, "k", 321L).collect()
    }
    sys.props.remove("graft.manifest.nolocal")
    time("Versioned.read().count LOCAL", 5) {
      Versioned.read(spark, dir).count()
    }
    time("readPoint LOCAL", 5) {
      Versioned.readPoint(spark, dir, "k", 321L).collect()
    }
    spark.stop()
  }
}
