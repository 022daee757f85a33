package graft.tools

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[ScaleUp]] methodology guards: the scale-validation data must preserve
  * FK integrity and per-copy duplicate structure, and must NOT create
  * cross-copy near-duplicates — otherwise BENCH_SCALE's ratios measure
  * data artifacts instead of plan shape. */
class ScaleUpSpec extends SparkSuite {

  private val src = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = Files.createTempDirectory("scaleup-spec").toString
    ScaleUp.run(spark, src, dir, factor = 3, embFactor = 2)
    dir
  }
  private def t(name: String) = spark.read.parquet(s"$out/$name.parquet")
  private def s(name: String) = spark.read.parquet(s"$src/$name.parquet")

  test("facts scale by factor, dims pass through, embeddings by embFactor") {
    assert(t("lineitem").count() == 3 * s("lineitem").count())
    assert(t("orders").count() == 3 * s("orders").count())
    assert(t("documents").count() == 3 * s("documents").count())
    assert(t("embeddings").count() == 2 * s("embeddings").count())
    assert(t("nation").count() == s("nation").count())
    assert(t("region").count() == s("region").count())
  }

  test("every FK resolves: no orphans anywhere in the scaled schema") {
    def orphans(fact: String, fk: String, dim: String, pk: String) = {
      val f = t(fact); val d = t(dim)
      f.join(d, f(fk) === d(pk), "left_anti").count()
    }
    assert(orphans("orders", "o_custkey", "customer", "c_custkey") == 0)
    assert(orphans("lineitem", "l_orderkey", "orders", "o_orderkey") == 0)
    assert(orphans("lineitem", "l_partkey", "part", "p_partkey") == 0)
    assert(orphans("lineitem", "l_suppkey", "supplier", "s_suppkey") == 0)
    assert(orphans("customer", "c_nationkey", "nation", "n_nationkey") == 0)
  }

  test("copy 0 is verbatim; n_chars stays consistent everywhere") {
    val stride = s("documents").agg(max(col("doc_id"))).head.getLong(0) + 1
    val copy0 = t("documents").where(col("doc_id") < stride)
      .select("doc_id", "text").orderBy("doc_id").collect().toSeq
    val orig = s("documents")
      .select("doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(copy0 == orig)
    assert(t("documents")
      .where(col("n_chars") =!= length(col("text")).cast("long"))
      .count() == 0)
  }

  test("per-copy exact-dup structure preserved; no cross-copy text dups") {
    val stride = s("documents").agg(max(col("doc_id"))).head.getLong(0) + 1
    // group-size multiset per copy == original's (word-suffixing is
    // injective), so within-copy dedup workloads are shape-identical
    def groupSizes(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(md5(col("text"))).count()
        .groupBy(col("count")).count()
        .orderBy(col("count")).collect().toSeq
    val origSizes = groupSizes(s("documents"))
    (0L until 3L).foreach { c =>
      val copy = t("documents")
        .where(col("doc_id") >= c * stride && col("doc_id") < (c + 1) * stride)
      assert(groupSizes(copy) == origSizes, s"copy $c dup structure drifted")
    }
    // cross-copy: total distinct = 3 × per-copy distinct (suffixed vocab
    // cannot collide with another copy's) — modulo all-empty texts
    val perCopyDistinct = s("documents").where(col("text") =!= "")
      .select("text").distinct().count()
    val totalDistinct = t("documents").where(col("text") =!= "")
      .select("text").distinct().count()
    assert(totalDistinct == 3 * perCopyDistinct,
      "a cross-copy text collision would merge dup clusters at scale")
  }
}
