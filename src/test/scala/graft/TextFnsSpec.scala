package graft

import graft.functions.TextFns._
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("tokensWs splits on whitespace runs, drops empties, lowercases") {
    val r = Seq("  The  QUICK\tbrown\n fox ").toDF("t")
      .select(tokensWs(col("t"))).as[Seq[String]].head()
    assert(r === Seq("the", "quick", "brown", "fox"))
  }

  test("shingles: sliding 3-grams; short docs collapse to one shingle") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(shingles(tokensWs(col("t")), 3).as("s"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) === Seq("a b c", "b c d"))
    assert(rows(1) === Seq("a b"))
  }

  test("langId picks marker-dominant language, und for no markers") {
    val r = Seq(
      "the cat and the dog is with you",
      "el gato que los perros con una casa",
      "der hund und die katze ist nicht ein",
      "zzz qqq xxx").toDF("t")
      .select(langId(col("t"))).as[String].collect()
    assert(r === Array("en", "es", "de", "und"))
  }

  test("fingerprint is whitespace-normalization invariant, content sensitive") {
    val fps = Seq("a b c", "  a\t b\nc ", "a b d").toDF("t")
      .select(fingerprint(col("t"))).as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("quality score sits in [0,1] and rewards clean prose over noise") {
    val r = Seq(
      "the cat sat on the mat and it was a good day in the park with friends " * 5,
      "!!! ### $$$ %%% ^^^ &&&").toDF("t")
      .select(qualityScore(col("t"))).as[Double].collect()
    assert(r.forall(x => x >= 0.0 && x <= 1.0))
    assert(r(0) > r(1))
  }

  test("truncate6 floors to 6 decimals") {
    val r = Seq(0.7512624999999999, 1.0).toDF("x")
      .select(truncate6(col("x"))).as[Double].collect()
    assert(r(0) === 0.751262)
    assert(r(1) === 1.0)
  }

  test("hashingTrickEmbed: dim-length vector whose buckets partition the " +
    "token count; identical text embeds identically") {
    val r = Seq("the cat sat on the mat", "the cat sat on the mat", "")
      .toDF("t")
      .select(hashingTrickEmbed(tokensWs(col("t")), 8).as("v"))
      .as[Seq[Double]].collect()
    assert(r.forall(_.length === 8))
    assert(r(0).sum === 6.0) // every token lands in exactly one bucket
    assert(r(0) === r(1))    // deterministic featurizer
    assert(r(2).sum === 0.0) // empty text -> zero vector
    // "the" appears twice -> its bucket holds at least 2
    assert(r(0).max >= 2.0)
  }

  test("classifierScore: sigmoid in (0,1), ranks stopword-rich prose over " +
    "punctuation soup, and weights change the ranking (the model is live)") {
    graft.expressions.GraftExtensions.ensureRegistered(spark)
    val m = QualityModel(wTokens = 0.5, wMeanTokLen = 0.3,
      wStopword = 8.0, wPunct = -6.0, bias = -4.0)
    val docs = Seq(
      "the cat sat on the mat and it was a fine day in the garden",
      "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( ))) ~~~ ```").toDF("t")
    val r = docs.select(classifierScore(col("t"), m)).as[Double].collect()
    assert(r.forall(x => x > 0.0 && x < 1.0))
    assert(r(0) > r(1))
    // flip the stopword weight: the ranking must follow the model
    val flipped = m.copy(wStopword = -8.0, wPunct = 6.0)
    val r2 = docs.select(classifierScore(col("t"), flipped)).as[Double].collect()
    assert(r2(0) < r2(1))
  }
}
