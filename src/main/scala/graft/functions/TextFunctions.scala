package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis functions for large-scale document pipelines: tokenization,
  * quality scoring, language ID, fingerprinting, shingling, MinHash, SimHash.
  *
  * All are built from codegen'd `org.apache.spark.sql.functions` (no UDFs), so
  * they stay inside whole-stage codegen and scale linearly with the scan. The
  * hash primitives are md5-based so a SQL oracle (DuckDB) can reproduce them
  * bit-for-bit.
  *
  * Reference analog: the reference has no scalar-function library — Functions
  * bodies do ad-hoc string work (e.g. word split,
  * reference: pulsar-functions/java-examples/.../WordCountFunction.java:34);
  * this module is the declarative, optimizable replacement.
  */
object TextFunctions {

  /** Space-separated token count, computed arithmetically (len − len(without
    * spaces) + 1) so any SQL engine reproduces it exactly. */
  def tokenCount(text: Column): Column =
    (length(text) - length(translate(text, " ", "")) + 1).cast(LongType)

  /** Word tokens (single-space separated corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Exact occurrence count of `word` as a whole token. (The
    * pad-and-replace formulation undercounts ADJACENT repeats — each
    * " word " match consumes the delimiter space the next one needs.) */
  def wordOccurrences(text: Column, word: String): Column =
    size(filter(tokens(text), t => t === word)).cast(LongType)

  /** Heuristic quality score in [0,1]: rewards mid-length docs, plausible
    * average word length, and a sane stopword ratio. Deterministic arithmetic
    * only — reproducible in SQL. */
  def qualityScore(text: Column): Column = {
    val chars = length(text).cast(DoubleType)
    val toks = tokenCount(text).cast(DoubleType)
    val avgWordLen = (chars - (toks - 1)) / toks
    val stopRatio = wordOccurrences(text, "the").cast(DoubleType) / toks
    val lenScore = least(chars / lit(500.0), lit(1.0))
    val wordLenScore = lit(1.0) - least(abs(avgWordLen - lit(5.0)) / lit(5.0), lit(1.0))
    val stopScore = least(stopRatio * lit(10.0), lit(1.0))
    round(lit(0.4) * lenScore + lit(0.3) * wordLenScore + lit(0.3) * stopScore, 6)
  }

  /** Stopword marker sets for the n-gram/stopword language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Language ID: score each candidate language by whole-token stopword hits;
    * argmax with deterministic alphabetical tie-break, 'und' (undetermined)
    * when nothing matches. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    // argmax as ONE greatest() over (score, reverse-alphabetical rank)
    // structs, so each language's score subtree appears in the plan exactly
    // once. The earlier when/otherwise fold copied every not-yet-compared
    // score into BOTH branches of each comparison — the expression tree
    // grew combinatorially (split(text) appeared ~90× per row, and the
    // higher-order filters are CodegenFallback, so nothing de-duplicated
    // them at runtime: measured 2.4 s of the 2.35 s q_langid_confusion scan
    // was this expression). Rank = reverse LIST-order position (the list
    // is alphabetical today), so score ties pick the EARLIEST-listed
    // language — identical semantics to the fold (which only replaced on
    // strictly-greater). If langMarkers ever stops being sorted, the
    // tie-break follows list order, exactly like the fold did.
    val ranked = langMarkers.zipWithIndex.map { case ((lang, words), i) =>
      val markerArr = array(words.map(lit): _*)
      val sc = size(filter(toks, t => array_contains(markerArr, t)))
      struct(sc.as("s"), lit(langMarkers.size - 1 - i).as("r"),
        lit(lang).as("l"))
    }
    val best = greatest(ranked: _*)
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * cross-engine-reproducible document identity. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** ALL k-word shingles, duplicates preserved — the domain of the
    * repetition signals below. Empty array for docs shorter than k words
    * (guards Spark's descending `sequence` on negative ranges). */
  def ngramsAll(text: Column, k: Int): Column = {
    val w = tokens(text)
    when(size(w) < k, array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(0), size(w) - k),
        i => array_join(slice(w, i + 1, lit(k)), " ")))
  }

  /** Distinct k-word shingles (the MinHash/Jaccard domain). */
  def shingles(text: Column, k: Int): Column =
    array_distinct(ngramsAll(text, k))

  /** Fraction of token occurrences that are repeats of an earlier token —
    * the 1-gram repetition signal of MassiveText-style quality filtering. */
  def dupTokenFraction(text: Column): Column = {
    val w = tokens(text)
    round(lit(1.0) -
      size(array_distinct(w)).cast(DoubleType) / size(w).cast(DoubleType), 6)
  }

  /** Fraction of k-gram occurrences that are repeats; 0 for docs shorter
    * than k words. */
  def dupNgramFraction(text: Column, k: Int): Column = {
    val g = ngramsAll(text, k)
    when(size(g) === 0, lit(0.0)).otherwise(
      round(lit(1.0) -
        size(array_distinct(g)).cast(DoubleType) / size(g).cast(DoubleType),
        6))
  }

  /** Share of k-gram occurrences held by the single most frequent k-gram —
    * the "top n-gram" repetition signal. Computed as the longest equal run
    * of the SORTED n-gram array via one `aggregate` fold over the array, so
    * there is no explode (no row blow-up) and the whole signal stays a
    * scalar expression in the scan stage. */
  def topNgramFraction(text: Column, k: Int): Column = {
    val g = sort_array(ngramsAll(text, k))
    val best = aggregate(
      g,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(g) === 0, lit(0.0))
      .otherwise(round(best.cast(DoubleType) / size(g).cast(DoubleType), 6))
  }

  /** BPE-ish subword token count: the GPT-2-style pre-tokenizer pattern
    * (contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs, whitespace runs) restricted to the lookaround-free
    * regex subset. Whitespace is the EXPLICIT class [ \t\n\f\r], not \s —
    * Java's \s additionally matches vertical tab where RE2's does not, so
    * \s would silently desynchronize Spark from the SQL oracle on the
    * first document containing one. A single literal space directly before
    * a token is absorbed into it (the ' ?' prefixes); every other
    * whitespace occurrence — tabs/newlines, multi-space runs, a trailing
    * space — forms a separator fragment of its own. */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0))).cast(LongType)

  /** Winnowing fingerprint (rolling-hash document fingerprinting, as in
    * MOSS): hash every k-gram, slide a window of `w` hashes, keep each
    * window's minimum — guaranteeing any shared run of w+k−1 tokens between
    * two documents contributes a shared fingerprint hash. The selected set
    * (distinct, sorted) is digested to one md5. Hashes are md5 strings so
    * the oracle reproduces the selection bit-for-bit; everything is one
    * scalar expression chain (no explode). Documents shorter than k+w−1
    * tokens fingerprint their (possibly empty) full hash set. */
  def winnowFingerprint(text: Column, k: Int = 3, w: Int = 4): Column =
    md5(array_join(winnowSelected(text, k, w), "|"))

  /** The selected window-minimum hashes behind [[winnowFingerprint]],
    * distinct and sorted — exposed so tests can assert the containment
    * guarantee (shared runs ⇒ shared hashes) on the sets themselves. */
  def winnowSelected(text: Column, k: Int = 3, w: Int = 4): Column = {
    val hs = transform(ngramsAll(text, k), g => md5(g))
    val mins = when(size(hs) < w, hs).otherwise(
      transform(sequence(lit(0), size(hs) - w),
        i => array_min(slice(hs, i + 1, lit(w)))))
    array_sort(array_distinct(mins))
  }

  /** One MinHash value: min over shingles of md5(seed ‖ ':' ‖ shingle).
    * md5-keyed so DuckDB reproduces it exactly. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(s"$seed:"), s))))

  /** Full signature as `numHashes` columns worth of values in an array. */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map(s => minhash(shingleArr, s)): _*)

  /** 16-bit token hash from the first 4 hex nibbles of md5 — ascii arithmetic
    * only, so a SQL oracle matches bit-for-bit. */
  def hash16(token: Column): Column = {
    val h = md5(token)
    def nib(i: Int): Column = {
      val a = ascii(substring(h, i, 1))
      when(a <= 57, a - 48).otherwise(a - 87) // '0'-'9' → 0-9, 'a'-'f' → 10-15
    }
    nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
  }

  /** SimHash-16: per token, hash16 bits vote ±1; sign of each per-bit vote sum
    * forms the fingerprint. Callers aggregate sum([[simhashVote]](h, j)) per
    * document for each bit j, then finish with [[simhashFromVotes]]. */
  def bitOf(h: Column, j: Int): Column =
    pmod((h / lit(1 << j)).cast(IntegerType), lit(2))

  def simhashVote(h: Column, j: Int): Column = bitOf(h, j) * 2 - 1

  def simhashFromVotes(votes: Seq[Column]): Column =
    votes.zipWithIndex.map { case (v, j) =>
      when(v >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
