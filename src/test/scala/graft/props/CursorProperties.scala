package graft.props

import java.io.File
import java.nio.file.Files

import graft.SparkSuite
import graft.sources.v2.{TopicInputPartition, TopicMicroBatchStream, TopicOffset}
import org.apache.spark.sql.connector.read.streaming.ReadLimit

/** Randomized model check of the frontier stream cursor: under arbitrary
  * interleavings of segment creation (multiple partitions, multiple monotone
  * name families, out-of-order cross-family arrival) and admission calls with
  * random pacing limits, every segment must be delivered EXACTLY once and the
  * serialized offset must stay bounded — the two contracts that replaced the
  * unbounded consumed-segment set. */
class CursorProperties extends SparkSuite {

  test("every segment delivers exactly once under random interleavings; offset stays bounded") {
    val rnd = new scala.util.Random(20260812L)
    (0 until 5).foreach { run =>
      val dir = Files.createTempDirectory(s"cursor-prop$run").toFile.getAbsolutePath
      val families = Seq("e", "b", "ezz") // distinct monotone sequences
      val partitions = 3
      val counters = scala.collection.mutable.Map.empty[(Int, String), Int]
      val created = scala.collection.mutable.Set.empty[String]
      val delivered = scala.collection.mutable.ArrayBuffer.empty[String]

      def createSegment(): Unit = {
        val pid = rnd.nextInt(partitions)
        val fam = families(rnd.nextInt(families.size))
        val c = counters.getOrElse((pid, fam), 0) + 1
        counters((pid, fam)) = c
        val pdir = new File(dir, f"partition-$pid%03d"); pdir.mkdirs()
        val name = f"segment-$fam$c%010d-p00000.jsonl"
        Files.write(new File(pdir, name).toPath,
          s"""{"topic":"t","partition":$pid,"offset":$c,"key":"k","value":"v","event_time_ms":0,"publish_time_ms":0,"producer_name":"p","sequence_id":$c}"""
            .getBytes("UTF-8"))
        created += s"$pid/$name"
      }

      val stream = new TopicMicroBatchStream(dir)
      var off: org.apache.spark.sql.connector.read.streaming.Offset =
        TopicOffset.empty
      var maxOffsetJson = 0

      def admit(limit: Option[Int]): Unit = {
        val capped = new TopicMicroBatchStream(dir, maxSegmentsPerTrigger = limit)
        val next = capped.latestOffset(off, ReadLimit.allAvailable())
        delivered ++= stream.planInputPartitions(off, next).map { p =>
          val f = new File(p.asInstanceOf[TopicInputPartition].file)
          s"${f.getParentFile.getName.stripPrefix("partition-").toInt}/${f.getName}"
        }
        // serialize → deserialize round-trip, as the checkpoint would
        off = stream.deserializeOffset(next.asInstanceOf[TopicOffset].json())
        maxOffsetJson = math.max(maxOffsetJson, next.asInstanceOf[TopicOffset].json().length)
      }

      (0 until 300).foreach { _ =>
        if (rnd.nextDouble() < 0.7) createSegment()
        else admit(if (rnd.nextBoolean()) Some(1 + rnd.nextInt(3)) else None)
      }
      admit(None); admit(None) // final full drains

      assert(delivered.size == delivered.distinct.size,
        s"run $run delivered duplicates")
      assert(delivered.toSet == created.toSet,
        s"run $run lost ${(created -- delivered.toSet).take(5)}")
      // bound: partitions × families × frontier entries (+ transient pending)
      assert(maxOffsetJson < 2500, s"run $run offset grew to $maxOffsetJson")
    }
  }
}
