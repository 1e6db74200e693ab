package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the structural invariants of the split gate registry (round 13):
  * the six family maps are pairwise key-disjoint (a duplicate key would
  * silently shadow a gate through `++`), every query has an oracle and
  * vice versa within each family, and the union SparkEntry exposes is
  * exactly the sum of the families.
  */
class RegistrySpec extends AnyFunSuite {

  private val families: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
      ("Batch", GatesBatch.queries, GatesBatch.oracleSql),
      ("Joins", GatesJoins.queries, GatesJoins.oracleSql),
      ("Gmall", GatesGmall.queries, GatesGmall.oracleSql),
      ("Pipeline", GatesPipeline.queries, GatesPipeline.oracleSql),
      ("Maintenance", GatesMaintenance.queries, GatesMaintenance.oracleSql),
      ("Streaming", GatesStreaming.queries, GatesStreaming.oracleSql))

  test("every family pairs queries with oracles key-for-key") {
    families.foreach { case (name, qs, os) =>
      assert(qs.keySet == os.keySet,
        s"family $name: queries/oracleSql key mismatch: " +
          s"${(qs.keySet diff os.keySet) ++ (os.keySet diff qs.keySet)}")
    }
  }

  test("family key sets are pairwise disjoint") {
    families.combinations(2).foreach {
      case Seq((na, qa, _), (nb, qb, _)) =>
        val overlap = qa.keySet intersect qb.keySet
        assert(overlap.isEmpty, s"$na and $nb both define: $overlap")
      case _ => ()
    }
  }

  test("SparkEntry union is exactly the family sum") {
    val expected = families.iterator.map(_._2.keySet).reduce(_ ++ _)
    assert(SparkEntry.queries.keySet == expected)
    assert(SparkEntry.oracleSql.keySet == expected)
    assert(SparkEntry.queries.size ==
      families.iterator.map(_._2.size).sum)
  }
}
