package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 16-bit token-weighted fingerprints,
  * candidate pairs via the pigeonhole block trick (hamming ≤ k ⇒ two docs
  * share at least one of k+1 fingerprint blocks), exact hamming verify with
  * bit_count(xor).
  *
  * Scale shape mirrors [[MinHashLsh]]: one shuffle on (block, value), pair
  * expansion inside bucket groups, no self-join — the fingerprint subtree is
  * computed exactly once.
  */
object SimHashDedup {

  /** 16-bit SimHash per document: md5-nibble token hashes vote ±1 per bit;
    * the sign of each bit's vote sum forms the fingerprint (reproducible in
    * SQL — see the q_simhash oracle). */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Par.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .withColumn("__h", hash16(col("__tok")))
    val votes = (0 until 16).map(j => sum(simhashVote(col("__h"), j)).as(s"__v$j"))
    toks.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        simhashFromVotes((0 until 16).map(j => col(s"__v$j"))).as("simhash"))
  }

  /** Near-duplicate pairs (a < b) with hamming(simhash) ≤ maxHamming.
    * maxHamming+1 blocks of 16/(maxHamming+1) bits each guarantee every
    * qualifying pair shares a block — candidates never go all-pairs.
    *
    * Like [[MinHashLsh.candidatePairs]], a bucket larger than `maxBucket`
    * (boilerplate collapsing to one fingerprint) expands as a star around
    * its smallest member instead of all-pairs, keeping every task linear
    * while preserving cluster connectivity. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 1, maxBucket: Int = 1024): DataFrame = {
    val blocks = maxHamming + 1
    require(16 % blocks == 0, s"16 bits must split evenly into $blocks blocks")
    val width = 16 / blocks
    val mask = (1 << width) - 1
    val sh = simhash16(docs, idCol, textCol)
    val melted = sh.select(col(idCol), col("simhash"),
      explode(array((0 until blocks).map(i => struct(
        lit(i).as("blk"),
        shiftright(col("simhash"), i * width).bitwiseAND(mask).as("v")
      )): _*)).as("b"))
      .select(col(idCol), col("simhash"), col("b.blk"), col("b.v"))
    val grouped = melted.groupBy(col("blk"), col("v"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col("simhash").as("sh")))).as("ds"))
      .where(size(col("ds")) > 1)
    def pairOf(x: Column, y: Column) =
      struct(x.getField("id").as("doc_a"), y.getField("id").as("doc_b"),
        bit_count(x.getField("sh").bitwiseXOR(y.getField("sh"))).as("hamming"))
    val pairsAll = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + lit(2), size(col("ds"))),
        y => pairOf(x, y))))
    val pairsStar = transform(slice(col("ds"), lit(2), size(col("ds"))),
      y => pairOf(element_at(col("ds"), 1), y))
    grouped.select(explode(when(size(col("ds")) <= maxBucket, pairsAll)
      .otherwise(pairsStar)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
