package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[ParamLong]] / [[LongSetContains]]: value semantics must match
  * `lit` / `isin`, under both codegen modes (the twin-path discipline),
  * and — the reason they exist — plans differing ONLY in the parameter
  * must reuse the cached generated classes instead of recompiling. */
class ParamExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def df = (1L to 20L).toDF("x")

  test("paramLong ≡ lit and inLongSet ≡ isin, compiled and interpreted") {
    val modes = Seq(("true", "FALLBACK"), ("false", "NO_CODEGEN"))
    val results = modes.map { case (ws, fm) =>
      val ws0 = spark.conf.get("spark.sql.codegen.wholeStage")
      val fm0 = spark.conf.get("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
      try {
        val p = df.select(col("x"), Params.paramLong(7L).as("p"))
          .where(col("x") < Params.paramLong(5L))
          .as[(Long, Long)].collect().toSet
        val s = df.where(Params.inLongSet(col("x") * 2, Set(4L, 10L, 99L)))
          .as[Long].collect().toSet
        (p, s)
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws0)
        spark.conf.set("spark.sql.codegen.factoryMode", fm0)
      }
    }
    assert(results(0) == results(1))
    assert(results(0)._1 == Set((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L)))
    assert(results(0)._2 == Set(2L, 5L))
    // isin null semantics: null input → null (filtered out), not false-match
    val withNull = Seq(Some(2L), None).toDF("x")
    assert(withNull.where(Params.inLongSet(col("x"), Set(2L)))
      .count() == 1)
    assert(withNull.select(Params.inLongSet(col("x"), Set(2L)).as("m"))
      .where(col("m").isNull).count() == 1)
  }

  test("plans differing only in the parameter share generated classes") {
    val cm = org.apache.spark.metrics.source.CodegenMetrics
    def runOnce(ord: Long, keys: Set[Long]): Long =
      df.where(Params.inLongSet(col("x"), keys))
        .withColumn("ord", Params.paramLong(ord))
        .agg(sum(col("ord"))).as[Long].collect().head
    // warm: compile whatever this shape needs
    assert(runOnce(100L, Set(1L, 2L)) == 200L)
    val c0 = cm.METRIC_COMPILATION_TIME.getCount
    // different ord, different set, same shape → zero new compiles
    assert(runOnce(999L, Set(3L, 4L, 5L)) == 2997L)
    val newCompiles = cm.METRIC_COMPILATION_TIME.getCount - c0
    assert(newCompiles == 0,
      s"re-parameterized plan recompiled $newCompiles generated classes — " +
        "the literal leaked into the generated source")
    // control: the inlined-literal form DOES recompile on value change
    // (this is the per-batch constant the params exist to remove)
    df.where(col("x").isin(1L, 2L)).count()
    val c1 = cm.METRIC_COMPILATION_TIME.getCount
    df.where(col("x").isin(3L, 4L)).count()
    assert(cm.METRIC_COMPILATION_TIME.getCount > c1,
      "control failed: literal isin did not recompile, so the zero-compile " +
        "assertion above proves nothing on this Spark version")
  }
}
