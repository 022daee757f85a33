package graft.functions

import graft.SparkSuite
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSuite {
  import spark.implicits._

  private def signals(text: String): (Double, Double, Double) =
    Seq(text).toDF("text")
      .select(dupTokenFraction(col("text")),
        dupNgramFraction(col("text"), 2),
        topNgramFraction(col("text"), 2))
      .as[(Double, Double, Double)].head()

  test("all-distinct text has zero repetition") {
    // 2-grams: "a b","b c","c d" — all distinct, top share 1/3
    assert(signals("a b c d") == ((0.0, 0.0, 0.333333)))
  }

  test("a repeated phrase drives all three signals") {
    // tokens: x y x y → dup_token 2/4; 2-grams: "x y","y x","x y" →
    // dup 1/3, top 2/3
    assert(signals("x y x y") == ((0.5, 0.333333, 0.666667)))
  }

  test("fully repeated text maxes out") {
    // tokens: a a a → dup 2/3; 2-grams: "a a","a a" → dup 1/2, top 1
    assert(signals("a a a") == ((0.666667, 0.5, 1.0)))
  }

  test("docs shorter than k yield 0 n-gram signals, not errors") {
    assert(signals("solo") == ((0.0, 0.0, 0.0)))
  }

  test("top-gram fold matches an explode-and-count over a corpus slice") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50)
    val fold = docs.select(col("doc_id"),
      topNgramFraction(col("text"), 3).as("f"))
    val exploded = docs
      .select(col("doc_id"), explode(ngramsAll(col("text"), 3)).as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(max("count").as("top"), sum("count").as("total"))
      .select(col("doc_id"),
        round(col("top").cast("double") / col("total"), 6).as("f"))
    assert(fold.exceptAll(exploded).isEmpty && exploded.exceptAll(fold).isEmpty)
  }
}
