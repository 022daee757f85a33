package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkewExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("saltedSumCount matches plain groupBy on a skewed key distribution") {
    val rows = (1 to 5000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble))
    val df = rows.toDF("key", "v")
    val salted = Skew.saltedSumCount(df, Seq("key"), "v", saltBuckets = 8)
      .as[(String, Double, Long)].collect().map { case (k, s, c) => k -> ((s, c)) }.toMap
    val plain = df.groupBy("key")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .as[(String, Double, Long)].collect().map { case (k, s, c) => k -> ((s, c)) }.toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, c)) =>
      assert(salted(k)._2 == c)
      assert(math.abs(salted(k)._1 - s) < 1e-6)
    }
  }

  test("saltedJoin equals plain join") {
    val left = (1 to 500).map(i => (s"k${i % 3}", i)).toDF("lk", "lv")
    val right = Seq(("k0", "zero"), ("k1", "one"), ("k2", "two"))
      .toDF("rk", "rv")
    val salted = Skew.saltedJoin(left, right, "lk", "rk", 4)
      .select("lk", "lv", "rv").as[(String, Int, String)].collect().toSet
    val plain = left.join(right, col("lk") === col("rk"))
      .select("lk", "lv", "rv").as[(String, Int, String)].collect().toSet
    assert(salted == plain)
  }

  test("native expressions are usable from SQL") {
    // extensions inject at session build (withExtensions); an existing
    // session registers through the function registry — same builders.
    new graft.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      args => graft.functions.SortedLongIntersectCount(args(0), args(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      args => graft.functions.MinHashSignature(args(0),
        args(1).eval().asInstanceOf[Int]),
      "scala_udf")
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L,2L,5L), array(2L,3L,5L)) AS n")
      .as[Int].head()
    assert(n == 2)
    val sig = spark.sql(
      "SELECT minhash_signature(array('a b c','b c d'), 4) AS s")
      .as[Seq[String]].head()
    assert(sig.length == 4 && sig.forall(_.length == 32))
  }
}
