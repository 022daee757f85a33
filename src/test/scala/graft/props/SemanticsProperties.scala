package graft.props

import graft.SparkSuite
import graft.ops.{Compaction, Dedup}
import graft.schema.SchemaCompat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the operator semantics the reference defines
  * imperatively (TwoPhaseCompactor / MessageDeduplication / schema rules):
  * the distributed implementation must agree with a trivial single-threaded
  * reference model on arbitrary generated inputs (fixed seeds → reproducible). */
class SemanticsProperties extends SparkSuite {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val msgGen = Gen.listOfN(60,
    for {
      key <- Gen.oneOf("a", "b", "c", "d")
      value <- Gen.option(Gen.alphaStr.map(_.take(5)))
    } yield (key, value))

  test("compaction equals the sequential latestForKey model") {
    samples(msgGen, 10).filter(_.nonEmpty).foreach { msgs =>
      val rows = msgs.zipWithIndex.map { case ((k, v), i) =>
        (k, v.orNull, i.toLong)
      }
      // reference model: replay in offset order, keep latest, drop
      // tombstone-final keys (TwoPhaseCompactor semantics)
      val model = rows.foldLeft(Map.empty[String, (String, Long)]) {
        case (m, (k, v, o)) => m.updated(k, (v, o))
      }.collect { case (k, (v, o)) if v != null => (k, v, o) }.toSet

      val df = rows.toDF("key", "value", "offset")
      val got = Compaction
        .compactWithTombstones(df, Seq("key"), col("offset"), "value")
        .as[(String, String, Long)].collect().toSet
      assert(got == model, s"input: $rows")
    }
  }

  private val seqGen = Gen.listOfN(50,
    for {
      p <- Gen.oneOf("p1", "p2")
      s <- Gen.choose(0L, 15L)
    } yield (p, s))

  test("producer-seq dedup yields exactly the distinct id set") {
    samples(seqGen, 10).filter(_.nonEmpty).foreach { msgs =>
      val df = msgs.zipWithIndex
        .map { case ((p, s), i) => (p, s, i.toLong) }
        .toDF("producer_name", "sequence_id", "offset")
      val got = Dedup.byProducerSeq(df, "producer_name", "sequence_id",
        col("offset") * -1)
        .select("producer_name", "sequence_id")
        .as[(String, Long)].collect()
      assert(got.length == msgs.distinct.length)
      assert(got.toSet == msgs.toSet)
    }
  }

  private val asofGen = for {
    lefts <- Gen.listOfN(25, for {
      k <- Gen.oneOf("a", "b"); t <- Gen.choose(0L, 30L)
    } yield (k, t))
    rights <- Gen.listOfN(25, for {
      k <- Gen.oneOf("a", "b"); t <- Gen.choose(0L, 30L)
    } yield (k, t))
  } yield (lefts, rights)

  test("asOf join equals the per-row latest-at-or-before reference model") {
    import graft.ops.AsOfJoin
    samples(asofGen, 8).foreach { case (lefts, rights) =>
      val l = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val r = rights.zipWithIndex.map { case ((k, t), i) =>
        (1000L + i, k, t, s"r$i")
      }
      // reference model: most recent right at-or-before, max rid on time ties
      val model = l.flatMap { case (id, k, t) =>
        val cand = r.filter(x => x._2 == k && x._3 <= t)
        if (cand.isEmpty) None
        else Some(id -> cand.maxBy(x => (x._3, x._1))._4)
      }.toMap

      val got = AsOfJoin.asOf(
        l.toDF("lid", "k", "t"), Seq("k"), "t",
        r.toDF("rid", "rk", "rt", "payload"), Seq("rk"), "rt",
        rightTieBreak = Seq("rid"), joinType = "inner")
        .select("lid", "payload").as[(Long, String)].collect().toMap
      assert(got == model, s"lefts=$l rights=$r")
    }
  }

  private val schemaGen: Gen[StructType] = Gen.listOfN(4,
    for {
      n <- Gen.oneOf("a", "b", "c", "d", "e")
      t <- Gen.oneOf[DataType](IntegerType, LongType, StringType, DoubleType)
      nl <- Gen.oneOf(true, false)
    } yield StructField(n, t, nl)).map(fs =>
    StructType(fs.groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)))

  test("schema compatibility: reflexive, and FULL implies both directions") {
    val pairs = samples(schemaGen, 30).grouped(2).collect {
      case Seq(a, b) => (a, b)
    }
    pairs.foreach { case (s1, s2) =>
      assert(SchemaCompat.canRead(s1, s1)) // every schema reads itself
      val full = SchemaCompat.isCompatible(s1, s2, SchemaCompat.Full)
      assert(full == (SchemaCompat.isCompatible(s1, s2, SchemaCompat.Backward)
        && SchemaCompat.isCompatible(s1, s2, SchemaCompat.Forward)))
    }
  }
}
