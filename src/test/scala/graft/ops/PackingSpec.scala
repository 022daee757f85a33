package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("token ranges tile each shard's stream exactly and split across cuts") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 200L).map(i =>
      (i, s"s${i % 3}", 1L + rnd.nextInt(900))).toDF("id", "shard", "n")
    val packed = Packing.packChunks(docs, Seq("shard"), col("id"),
      col("n"), 512L)
      .select(col("id"), col("shard"), col("n"), col("start_tok"),
        col("seq_first"), col("seq_last"))
      .as[(Long, String, Long, Long, Long, Long)].collect()

    // per shard: ranges are disjoint, contiguous from 0, in hash order
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._3 == b._4, s"gap after $a")
        case _ =>
      }
    }
    // seq ids are the integer cut positions of the range
    packed.foreach { case (_, _, n, start, sf, sl) =>
      assert(sf == start / 512)
      assert(sl == (start + n - 1) / 512)
      assert(sl >= sf)
    }
    // some doc must straddle a cut for the test to mean anything
    assert(packed.exists { case (_, _, _, _, sf, sl) => sl > sf })
  }

  test("assignment is invariant under input partitioning") {
    val docs = (1L to 100L).map(i => (i, 1L + i % 7)).toDF("id", "n")
    val a = Packing.packChunks(docs.repartition(1), Nil, col("id"),
      col("n"), 64L)
    val b = Packing.packChunks(docs.repartition(13), Nil, col("id"),
      col("n"), 64L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
  test("salted packing equals per-stream unsalted packing, with namespaced " +
    "sequence ids and one window shuffle") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 300L).map(i =>
      (i, s"s${i % 2}", 1L + rnd.nextInt(400))).toDF("id", "shard", "n")
    val span = 100000L
    val salted = Packing.packChunksSalted(docs, Seq("shard"), col("id"),
      col("n"), 256L, salts = 4, seqSpan = span)
      .select(col("id"), col("salt"), col("start_tok"), col("seq_first"),
        col("seq_last"))
      .as[(Long, Int, Long, Long, Long)].collect()

    // every salt stream independently matches packChunks run on just that
    // stream's rows (same boundaries, same stream-local start_tok), and
    // namespacing is exactly + salt * seqSpan
    val bySalt = salted.groupBy(_._2)
    assert(bySalt.size > 1, "salt must actually split the corpus")
    bySalt.foreach { case (s, rows) =>
      val ids = rows.map(_._1).toSet
      val solo = Packing.packChunks(
        docs.where(Packing.saltedShard(col("id"), 4) === s),
        Seq("shard"), col("id"), col("n"), 256L)
        .select(col("id"), col("start_tok"), col("seq_first"),
          col("seq_last"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(solo.keySet == ids)
      rows.foreach { case (id, _, start, sf, sl) =>
        val (s0, f0, l0) = solo(id)
        assert(start == s0 && sf == f0 + s * span && sl == l0 + s * span,
          s"stream $s doc $id diverged from solo packing")
      }
    }
    // sequence ids never collide across salt streams
    val bands = salted.map(r => r._4 / span).toSet
    assert(bands == bySalt.keySet.map(_.toLong))

    // plan shape: the salt adds no extra shuffle — still ONE hash exchange
    val plan = Packing.packChunksSalted(docs, Seq("shard"), col("id"),
      col("n"), 256L, salts = 4).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("packIds re-cuts the concatenated id stream exactly, dropping the tail") {
    val recs = (1 to 9).map { i =>
      (i.toLong, "s", (1 to (i * 3)).map(j => (i * 100 + j).toLong))
    }.toDF("id", "shard", "input_ids")
    val ctx = 16L
    val out = Packing.packIds(recs, Seq("shard"), col("id"), "input_ids", ctx)
      .as[(String, Long, Seq[Long])].collect().sortBy(_._2)
    // every record is exactly ctx ids; chunk ids are dense from 0
    assert(out.forall(_._3.length == ctx))
    assert(out.map(_._2).toSeq == out.indices.map(_.toLong))
    // flattening the records reproduces the md5-ordered stream's prefix
    val stream = recs
      .orderBy(md5(col("id").cast("string")), col("id"))
      .select("input_ids").as[Seq[Long]].collect().flatten.toSeq
    assert(out.flatMap(_._3).toSeq == stream.take(out.length * ctx.toInt))
    // total = floor(streamLen / ctx) full records
    assert(out.length == stream.length / ctx.toInt)
    // deterministic under repartitioning
    val again = Packing.packIds(recs.repartition(7), Seq("shard"), col("id"),
      "input_ids", ctx).as[(String, Long, Seq[Long])].collect().sortBy(_._2)
    assert(again.toSeq == out.toSeq)
  }

  test("packSegments tiles every full chunk and reconstructs packIds exactly") {
    val recs = (1 to 9).map { i =>
      (i.toLong, "s", (1 to (i * 3)).map(j => (i * 100 + j).toLong))
    }.toDF("id", "shard", "input_ids")
    val ctx = 16L
    val chunks = Packing.packIds(recs, Seq("shard"), col("id"),
        "input_ids", ctx)
      .as[(String, Long, Seq[Long])].collect().map(r => r._2 -> r._3).toMap
    val segs = Packing.packSegments(recs, Seq("shard"), "id",
        "input_ids", ctx)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._2, r._3, r._4, r._5)).toSeq // (chunk, id, start, len)
    // per chunk the segments tile [0, ctx) exactly
    segs.groupBy(_._1).foreach { case (ck, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.map(_._4).sum == ctx, s"chunk $ck seg lens")
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Seq((_, _, s1, l1), (_, _, s2, _)) => assert(s1 + l1 == s2)
        case _ =>
      }
      assert(chunks.contains(ck), s"chunk $ck must be a full packIds chunk")
    }
    assert(segs.map(_._1).distinct.size == chunks.size,
      "every full chunk has segments; the dropped tail has none")
    // reconstruction: slicing each doc's ids by its segments reproduces
    // the packed chunk streams
    val ids = recs.as[(Long, String, Seq[Long])].collect()
      .map(r => r._1 -> r._3).toMap
    // a doc's segment consumes its ids in order across its chunks
    val consumed = scala.collection.mutable.Map.empty[Long, Int]
      .withDefaultValue(0)
    segs.sortBy(s => (s._1, s._3)).foreach { case (ck, id, st, ln) =>
      val off = consumed(id)
      val slice = ids(id).slice(off, off + ln.toInt)
      consumed(id) = off + ln.toInt
      val expect = chunks(ck).slice(st.toInt, (st + ln).toInt)
      assert(slice == expect, s"chunk $ck doc $id slice mismatch")
    }
  }
}
