package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profile, Snapshot}

/** Snapshot.diff (snapshot → changelog) and Profile.profile (one-scan
  * column stats): semantics the gates' table-scale oracles can't isolate
  * — null transitions, no-op suppression, and the single-scan plan. */
class SnapshotProfileSpec extends SparkSpec {
  import spark.implicits._

  test("diff emits insert/update/delete, suppresses no-ops, and treats " +
      "null transitions exactly (value→null = update, null→null = no-op)") {
    val old = Seq(
      (1L, Some("a"), Some(10.0)), // unchanged → no row
      (2L, Some("b"), Some(20.0)), // value change → update
      (3L, Some("c"), Some(30.0)), // value → null → update
      (4L, None, None),            // null → null → no row
      (5L, Some("e"), Some(50.0))  // deleted
    ).toDF("k", "s", "v")
    val nw = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(21.0)),
      (3L, Some("c"), None),
      (4L, None, None),
      (6L, Some("f"), Some(60.0))  // inserted
    ).toDF("k", "s", "v")
    val got = Snapshot.diff(old, nw, "k", Seq("s", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got === Seq((2L, "update"), (3L, "update"), (5L, "delete"),
      (6L, "insert")).sorted)
    // the emitted payload is the NEW image; deletes carry nulls
    val del = Snapshot.diff(old, nw, "k", Seq("s", "v"))
      .filter(col("change_type") === "delete").head()
    assert(del.isNullAt(2) && del.isNullAt(3))
  }

  test("diff of identical snapshots is empty; diff against empty is all " +
      "inserts / all deletes") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    val none = a.filter(lit(false))
    assert(Snapshot.diff(a, a, "k", Seq("s")).count() === 0)
    assert(Snapshot.diff(none, a, "k", Seq("s"))
      .select(col("change_type")).distinct().as[String].collect().toSeq
      === Seq("insert"))
    assert(Snapshot.diff(a, none, "k", Seq("s"))
      .select(col("change_type")).distinct().as[String].collect().toSeq
      === Seq("delete"))
  }

  test("profile: exact counts/nulls/ndv/ranges per column; verdict true " +
      "at spec scale; one scan (single Aggregate over one relation)") {
    val df = Seq(
      (1L, Some(2.0), "b"), (2L, None, "a"), (3L, Some(2.0), "c"),
      (4L, Some(9.0), "a"), (5L, None, "c")).toDF("id", "v", "s")
    val p = Profile.profile(df, numeric = Seq("id", "v"), strings = Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) === 5L && id.getLong(2) === 0L && id.getLong(3) === 5L)
    assert(id.getDouble(5) === 1.0 && id.getDouble(6) === 5.0)
    val v = p("v")
    assert(v.getLong(2) === 2L && v.getLong(3) === 2L)
    assert(v.getDouble(5) === 2.0 && v.getDouble(6) === 9.0)
    val s = p("s")
    assert(s.getLong(3) === 3L && s.getString(7) === "a" && s.getString(8) === "c")
    assert(p.values.forall(_.getInt(4) === 1), "ndv verdicts")
    // single scan: exactly one base relation in the optimized plan
    val plan = Profile.profile(df, Seq("id", "v"), Seq("s"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union") && !plan.contains("Join"), plan.take(800))
  }
}
