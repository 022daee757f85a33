package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide unit-level (paragraph or line) exact deduplication — the
  * C4/RefinedWeb discipline: a unit of text that recurs across the corpus
  * (boilerplate headers, navigation chrome, license blocks) is kept ONCE,
  * at its corpus-wide first occurrence, and excised everywhere else.
  * Document-level dedup cannot see it (each host document is unique) and
  * span dedup ([[SpanDedup]]) finds it only pairwise; here the unit
  * boundary is structural (a separator), which makes the decision a plain
  * hash aggregate instead of an alignment problem.
  *
  * Scale design: one scan explodes (id, pos, unit); ONE shuffle groups
  * unit hashes (the shuffle key is the 32-char md5, never the unit body);
  * the duplicated set is corpus-boilerplate-sized — tiny relative to the
  * corpus — so the occurrence join AQE-broadcasts; and only documents that
  * actually lose a unit are rebuilt (everything else passes through
  * untouched, no corpus-wide regroup). The keeper is the lexicographic
  * (id, pos) minimum: deterministic under any partitioning, no window
  * sort.
  *
  * Reference analog: broker-side compaction keeps last-value-per-key
  * (pulsar-broker/.../compaction/TwoPhaseCompactor.java) — same
  * keep-one-representative contract, applied here to repeated text units
  * inside payloads rather than whole messages.
  */
object ParagraphDedup {

  /** One row per non-blank unit: (id, pos, para), `pos` the 0-based index
    * in the ORIGINAL split (blank units keep their slot numbered but never
    * participate), so excision can rebuild residual order exactly. */
  def explodeUnits(docs: DataFrame, idCol: String, textCol: String,
                   sep: String = "\n\n"): DataFrame =
    docs
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF(idCol, "pos", "para")
      .where(trim(col("para")) =!= "")
      .select(col(idCol), col("pos").cast("long").as("pos"), col("para"))

  /** Units appearing ≥ `minCopies` times corpus-wide:
    * (ph, n_docs, n_copies, keeper_id, keeper_pos). Grouped by md5 so the
    * shuffle carries a fixed-width key; the keeper is the corpus-wide
    * first occurrence — `min(struct(id, pos))` is a map-side-combinable
    * aggregate, not a window. */
  def duplicated(units: DataFrame, idCol: String,
                 minCopies: Int = 2): DataFrame =
    units
      .groupBy(md5(col("para")).as("ph"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_copies"),
        min(struct(col(idCol), col("pos"))).as("k"))
      .where(col("n_copies") >= minCopies)
      .select(col("ph"), col("n_docs"), col("n_copies"),
        col("k")(idCol).as("keeper_id"), col("k")("pos").as("keeper_pos"))

  /** The corpus with every duplicated unit removed except its corpus-wide
    * first occurrence. Documents that lose no unit keep their ORIGINAL
    * text verbatim (no rebuild, no renormalization); affected documents
    * are rebuilt from their surviving units in original order — a doc
    * whose every unit was excised comes back as the empty string, not a
    * dropped row. */
  def excise(docs: DataFrame, idCol: String, textCol: String,
             sep: String = "\n\n", minCopies: Int = 2): DataFrame = {
    val u = explodeUnits(docs, idCol, textCol, sep)
      .withColumn("ph", md5(col("para")))
    val dup = duplicated(u, idCol, minCopies)

    // Non-keeper occurrences of duplicated units. `dup` is
    // boilerplate-sized; AQE turns this into a broadcast join.
    val drops = u
      .join(dup.select("ph", "keeper_id", "keeper_pos"), Seq("ph"))
      .where(!(col(idCol) === col("keeper_id") &&
        col("pos") === col("keeper_pos")))
      .select(col(idCol), col("pos"))

    exciseByDrops(docs, idCol, textCol, sep, u, drops)
  }

  /** The shared rebuild: given the exploded units and the (id, pos) drop
    * set, rebuild ONLY documents that lose a unit; everything else passes
    * through verbatim. Fully-excised docs survive as empty rows
    * (collect_list skips the null marker, array_join of [] is ""). */
  private[ops] def exciseByDrops(docs: DataFrame, idCol: String,
                                 textCol: String, sep: String,
                                 units: DataFrame,
                                 drops: DataFrame): DataFrame = {
    val affected = drops.select(idCol).distinct()
    val kept = units
      .join(affected, Seq(idCol), "left_semi")
      .join(drops, Seq(idCol, "pos"), "left_anti")
    val rebuilt = affected
      .join(kept, Seq(idCol), "left")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(
            when(col("pos").isNotNull, struct(col("pos"), col("para"))))),
          x => x.getField("para")),
        sep).as(textCol))

    docs.select(col(idCol), col(textCol))
      .join(affected, Seq(idCol), "left_anti")
      .unionByName(rebuilt)
  }
}
