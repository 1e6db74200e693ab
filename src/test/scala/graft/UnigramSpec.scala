package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer contracts the gate oracle cannot isolate:
  * Viterbi GLOBALITY (a locally-longest piece loses to a better whole
  * segmentation — the case greedy munch gets wrong by construction),
  * the exact-product tie-break (smallest start = longest last piece),
  * the alphabet floor in vocabUnits, loud unreachability, and the
  * codegen path compiling for real (no silent interpreted fallback). */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def encode(unit: String, vocab: Seq[(String, Long)]): Seq[String] =
    Unigram.encodeUnits(Seq(unit).toDF("unit"), vocab)
      .select(col("toks")).as[Seq[String]].head()

  test("viterbi is global: the greedy-longest prefix loses to the " +
    "higher-probability whole segmentation") {
    // p(ab)·p(c) = (2/13)(1/13) = 2/169; p(a)·p(bc) = (3/13)(6/13) =
    // 18/169 — greedy munch takes 'ab' first and is stuck with 2/169;
    // Viterbi must pick a|bc
    val vocab = Seq("a" -> 3L, "b" -> 1L, "c" -> 1L, "ab" -> 2L, "bc" -> 6L)
    assert(encode("abc", vocab) === Seq("a", "bc"))
    // sanity: when the fused piece IS likelier, it wins
    assert(encode("abc", Seq("a" -> 1L, "b" -> 1L, "c" -> 1L,
      "ab" -> 8L, "bc" -> 2L)) === Seq("ab", "c"))
  }

  test("exact-product ties break to the smallest start position " +
    "(longest last piece), matching the oracle's (score DESC, j ASC)") {
    // total 16: p(ab) = 1/16 exactly equals p(a)·p(b) = (4/16)(4/16) —
    // bit-identical doubles, so the tie-break decides: j=0 ('ab' as one
    // piece) wins over j=1 (last piece 'b')
    val vocab = Seq("a" -> 4L, "b" -> 4L, "ab" -> 1L, "c" -> 7L)
    assert(encode("ab", vocab) === Seq("ab"))
  }

  test("vocabUnits keeps the alphabet: single chars outside the top-k " +
    "ride along, so every unit stays reachable") {
    // 'z' appears once in one rare unit — far outside any top-k, but it
    // must survive as a single-char piece
    val units = (Seq.fill(50)("abab") :+ "zb").toDF("unit")
    val v = Unigram.vocabUnits(units, k = 4, maxPieceLen = 3)
      .as[(String, Long)].collect().toMap
    assert(v.contains("z"), s"alphabet floor lost 'z': ${v.keys.toSeq.sorted}")
    assert(v.contains("a") && v.contains("b"))
    // and the derived vocab round-trips through the encoder
    val toks = Unigram.encodeUnits(units, v.toSeq.sortBy(_._1))
      .select(col("unit"), col("toks")).as[(String, Seq[String])]
      .collect().toMap
    assert(toks("zb").nonEmpty && toks("zb").mkString === "zb")
  }

  test("an unreachable unit fails loudly instead of emitting a partial " +
    "segmentation") {
    val ex = intercept[Exception] {
      encode("xyz", Seq("x" -> 1L, "y" -> 1L)) // no 'z' anywhere
    }
    assert(ex.getMessage != null || ex.getCause != null)
  }

  test("trainUnits: hard-EM rounds conserve tokens (recount total == " +
    "segmentation-length total) and the vocabulary only ever shrinks") {
    val units = (Seq.fill(30)("abcabc") ++ Seq.fill(20)("bcabca") ++
      Seq.fill(5)("cab") :+ "zq").toDF("unit")
    val led = Unigram.trainUnits(units, k = 12, maxPieceLen = 3, rounds = 4)
      .orderBy(col("round"))
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    assert(led.map(_._1) === Seq(1L, 2L, 3L, 4L))
    // token conservation: the recount and the segmentation lengths are
    // computed independently and must agree every round
    led.foreach { case (r, _, totalCt, corpusToks, _, _) =>
      assert(totalCt === corpusToks, s"round $r leaked tokens")
    }
    // a piece absent from round r's vocab cannot appear in round r's
    // segmentations, so vocabularies are nested: n_pieces never grows
    led.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 <= a._2,
        s"vocab grew ${a._2} -> ${b._2} between rounds ${a._1}->${b._1}")
      case _ =>
    }
    // every unit's characters survive somewhere: the rare 'zq' unit
    // still segments (loud unreachability would have thrown above)
    assert(led.last._5.nonEmpty && led.last._6.nonEmpty)
  }

  test("generated code COMPILES with a non-nullable child (Janino, no " +
    "interpreted fallback) and agrees with interpreted eval") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val pieces = Seq("a", "b", "c", "ab", "bc")
    val counts = Seq(3L, 1L, 1L, 2L, 6L)
    val expr = graft.expressions.UnigramEncode(
      BoundReference(0, StringType, nullable = false), pieces, counts)
    val proj = GenerateMutableProjection.generate(Seq(expr))
    val out = proj(InternalRow(UTF8String.fromString("abc")))
      .getArray(0)
    assert((0 until out.numElements())
      .map(i => out.getUTF8String(i).toString) === Seq("a", "bc"))
    // interpreted path agrees
    val interp = expr.eval(InternalRow(UTF8String.fromString("abc")))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until interp.numElements())
      .map(i => interp.getUTF8String(i).toString) === Seq("a", "bc"))
  }
}
