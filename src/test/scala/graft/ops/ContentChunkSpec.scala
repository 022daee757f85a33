package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[ContentChunk]] — content-defined token chunking. */
class ContentChunkSpec extends SparkSuite {
  import spark.implicits._

  private def hashes(text: String): Seq[String] =
    ContentChunk.chunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", div = 8)
      .orderBy("chunk_idx").select("chunk_hash").as[String].collect().toSeq

  test("an early insertion shifts only its own chunk; later chunks realign") {
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(400)(s"w${rnd.nextInt(5000)}")
    val base = hashes(words.mkString(" "))
    val edited = hashes((words.take(3) ++ Seq("INSERTED") ++
      words.drop(3)).mkString(" "))
    assert(base.size > 20, s"expected many chunks, got ${base.size}")
    // all but the first few chunks keep their hashes — fixed windows
    // would shift every downstream chunk
    val sharedTail = base.toSet.intersect(edited.toSet).size
    assert(sharedTail >= base.size - 3,
      s"only $sharedTail of ${base.size} chunk hashes survived the edit")
    assert(base != edited, "the edited chunk itself must change")
  }

  test("boundaries are deterministic and chunks partition the token stream") {
    val text = (1 to 100).map(i => s"tok$i").mkString(" ")
    val out = ContentChunk.chunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", div = 8)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_toks")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._3).sum == 100, "chunks cover every token once")
    // consecutive chunks abut: start + len = next start
    out.sliding(2).foreach {
      case Seq((_, s1, n1), (_, s2, _)) => assert(s1 + n1 == s2)
      case _ =>
    }
    assert(out.head._2 == 0L)
    // repartitioning must not change anything (window is per-doc)
    val again = ContentChunk.chunks(
        Seq((1L, text)).toDF("doc_id", "text").repartition(5),
        "doc_id", "text", div = 8)
      .orderBy("chunk_idx").select("chunk_idx", "start_tok", "n_toks")
      .as[(Long, Long, Long)].collect().toSeq
    assert(again == out)
  }
}
