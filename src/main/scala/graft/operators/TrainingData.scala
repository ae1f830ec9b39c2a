package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Large-scale training-data pipeline operators over a documents table
 * (doc_id, text, ...): deduplication (exact, MinHash-LSH, SimHash,
 * n-gram Jaccard), text analysis (language id, quality, tokens,
 * fingerprint). All hashing is seed-stable (xxhash64 with literal
 * seeds) — deterministic across runs and cluster sizes.
 *
 * Scale notes: every op is expressed as explode → partial-agg →
 * shuffle-on-key, so map-side combine keeps shuffle volume at
 * O(#docs · #hashes), never O(#tokens). Pair generation always goes
 * through a bucket equi-join (LSH band or bucket key), never a cross
 * join.
 */
object TrainingData {

  // ------------------------------------------------------------ dedup

  /** Exact duplicates: md5 over the raw text. Returns one row per
    * duplicate-group member with the group's canonical (min) key. */
  def exactDupGroups(docs: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val hashed = docs.select(col(keyCol), md5(col(textCol).cast("binary")).as("text_md5"))
    val w = Window.partitionBy(col("text_md5"))
    hashed
      .withColumn("canonical", min(col(keyCol)).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .filter(col("group_size") > 1)
  }

  /** Deduplicated view: keep the min-key representative of each exact
    * text group (hash-groupBy; map-side combine applies). */
  def exactDedup(docs: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol).cast("binary"))).orderBy(col(keyCol))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Normalized word shingles of size n (lowercase, whitespace split).
    *
    * PERF: the word array must be a BOUND column, not an inline
    * `split(...)` expression — a subexpression inside a `transform`
    * lambda is re-evaluated per element, turning shingling into
    * O(words²) per document (measured 11 s for 260 k shingles before
    * the split was materialized). [[shingles]] therefore expands to a
    * two-step projection internally at every call site via
    * [[shinglesOfWords]].
    */
  def shinglesOfWords(words: Column, n: Int): Column =
    filter(
      transform(sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => when(i + n <= size(words), concat_ws(" ", slice(words, i + 1, lit(n))))),
      s => s.isNotNull)

  def wordsOf(textCol: Column): Column = split(lower(textCol), "\\s+")

  /** Kept for API compatibility; prefer the wordsOf/shinglesOfWords
    * two-step at call sites (see the PERF note above). */
  def shingles(textCol: Column, n: Int): Column = shinglesOfWords(wordsOf(textCol), n)

  /**
   * MinHash signatures: numHashes independent min-hashes over word
   * shingles. One explode + one groupBy with numHashes `min` partial
   * aggregates (map-side combined — shuffle is O(docs·hashes)).
   *
   * One-hash scheme: the (arbitrarily long) shingle string is hashed
   * exactly ONCE; the numHashes signature components re-hash only that
   * 8-byte value (`xxhash64(i, h)`), so per-shingle cost is one string
   * hash + numHashes constant-time long hashes instead of numHashes
   * full string hashes — the standard one-permutation/double-hash
   * MinHash construction.
   */
  def minhashSignatures(docs: DataFrame, keyCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64): DataFrame = {
    val sh = docs.select(col(keyCol), wordsOf(col(textCol)).as("__w"))
      .select(col(keyCol), explode(shinglesOfWords(col("__w"), shingleSize)).as("__sh"))
      .withColumn("__h", xxhash64(col("__sh")))
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), col("__h"))).as(s"h$i"))
    sh.groupBy(col(keyCol)).agg(mins.head, mins.tail: _*)
      .select(col(keyCol), array((0 until numHashes).map(i => col(s"h$i")): _*).as("signature"))
  }

  /**
   * MinHash-LSH near-duplicate pairs: signature → bands → band-hash
   * buckets → pairs within a bucket → verified by estimated Jaccard
   * (fraction of matching signature components) ≥ threshold.
   * Pairs are produced by an equi-join on (band, bandHash) — the only
   * shuffle keys — so no cross join ever materializes.
   */
  def minhashLshPairs(docs: DataFrame, keyCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignatures(docs, keyCol, textCol, shingleSize, numHashes)
    val banded = sig.select(col(keyCol), col("signature"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(concat_ws(",",
            slice(col("signature"), b * rows + 1, lit(rows)))).as("bucket")))).as("bb"))
      .select(col(keyCol), col("signature"), col("bb.band"), col("bb.bucket"))
    val l = banded.select(col(keyCol).as("a"), col("signature").as("sig_a"), col("band"), col("bucket"))
    val r = banded.select(col(keyCol).as("b"), col("signature").as("sig_b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / size(col("sig_a")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("a"), col("b"), col("est_jaccard"))
  }

  /**
   * MinHash-LSH pairs with EXACT verification: LSH generates candidate
   * pairs (band/bucket equi-join — never a cross join), then each
   * candidate is re-ranked by its TRUE shingle-set Jaccard (join back
   * to the distinct-shingle sets, `array_intersect` / union sizes).
   * Output is signature-independent (up to LSH recall, ≥ 1-4e-8 at
   * J=0.9 with 16 bands × 4 rows) — the production dedup shape: cheap
   * probabilistic candidate generation, exact filter.
   */
  def minhashLshPairsExact(docs: DataFrame, keyCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignatures(docs, keyCol, textCol, shingleSize, numHashes)
    val banded = sig.select(col(keyCol),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(concat_ws(",",
            slice(col("signature"), b * rows + 1, lit(rows)))).as("bucket")))).as("bb"))
      .select(col(keyCol), col("bb.band"), col("bb.bucket"))
    val l = banded.select(col(keyCol).as("a"), col("band"), col("bucket"))
    val r = banded.select(col(keyCol).as("b"), col("band"), col("bucket"))
    val cand = l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").dropDuplicates("a", "b")
    // The verify stage joins each candidate's DISTINCT shingle set back
    // on both sides. Shingles are hashed to int64 BEFORE that join:
    // Jaccard over the hashed sets equals Jaccard over the string sets
    // (xxhash64 is injective up to ~2^-32 collision odds at 10^6
    // shingles/doc), and the set-join shuffle ships 8 bytes per shingle
    // instead of the full n-gram string — several-fold less volume on
    // the bench's heaviest exchange.
    val sets = docs.select(col(keyCol).as("__k"), wordsOf(col(textCol)).as("__w"))
      .select(col("__k"),
        array_distinct(transform(shinglesOfWords(col("__w"), shingleSize),
          s => xxhash64(s))).as("__ss"))
    cand
      .join(sets.select(col("__k").as("a"), col("__ss").as("__ssa")), Seq("a"))
      .join(sets.select(col("__k").as("b"), col("__ss").as("__ssb")), Seq("b"))
      .withColumn("__ni", size(array_intersect(col("__ssa"), col("__ssb"))))
      .withColumn("jaccard", col("__ni").cast("double") /
        (size(col("__ssa")) + size(col("__ssb")) - col("__ni")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** LSH band table of a corpus — (key, band, bucket) — the half of a
    * persistent dedup INDEX that generates candidates. Write this and
    * [[shingleSets]] to storage once; every future crawl snapshot
    * dedups against them via [[dedupIncremental]] without re-reading
    * the old corpus text. */
  def minhashBands(docs: DataFrame, keyCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    minhashSignatures(docs, keyCol, textCol, shingleSize, numHashes)
      .select(col(keyCol).as("key"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(concat_ws(",",
            slice(col("signature"), b * rows + 1, lit(rows)))).as("bucket")))).as("bb"))
      .select(col("key"), col("bb.band"), col("bb.bucket"))
  }

  /** Distinct int64-hashed shingle sets — (key, sset) — the exact
    * re-rank half of the dedup index (Jaccard over the hashed sets
    * equals Jaccard over the strings up to ~2^-32 collision odds, and
    * the stored set is 8 bytes per shingle instead of the n-gram). */
  def shingleSets(docs: DataFrame, keyCol: String, textCol: String,
      shingleSize: Int = 3): DataFrame =
    docs.select(col(keyCol).as("key"), wordsOf(col(textCol)).as("__w"))
      .select(col("key"),
        array_distinct(transform(shinglesOfWords(col("__w"), shingleSize),
          s => xxhash64(s))).as("sset"))

  /**
   * Incremental crawl dedup: flag every NEW document that is a
   * near-duplicate (true shingle Jaccard >= threshold) of a document
   * already in the index — the per-snapshot dedup a rolling corpus
   * pipeline runs (each snapshot dedups against all previous ones
   * without touching their text). Candidates come from the band
   * equi-join new×index (8-byte bucket keys, never a cross join);
   * each candidate re-ranks by exact Jaccard against the index's
   * stored shingle sets. Output: one row per new document with
   * `dup_of` = the best-matching index key (highest Jaccard, ties to
   * the smallest key — deterministic) and its `jaccard`, both null
   * for fresh documents.
   */
  def dedupIncremental(newDocs: DataFrame, keyCol: String, textCol: String,
      indexBands: DataFrame, indexSets: DataFrame,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.9): DataFrame = {
    val newBands = minhashBands(newDocs, keyCol, textCol, shingleSize, numHashes, bands)
      .withColumnRenamed("key", "__nk")
    val cand = newBands
      .join(indexBands.withColumnRenamed("key", "__ok"), Seq("band", "bucket"))
      .select(col("__nk"), col("__ok")).dropDuplicates("__nk", "__ok")
    val newSets = shingleSets(newDocs, keyCol, textCol, shingleSize)
    val scored = cand
      .join(newSets.select(col("key").as("__nk"), col("sset").as("__sn")), Seq("__nk"))
      .join(indexSets.select(col("key").as("__ok"), col("sset").as("__so")), Seq("__ok"))
      .withColumn("__ni", size(array_intersect(col("__sn"), col("__so"))))
      .withColumn("__j", col("__ni").cast("double") /
        (size(col("__sn")) + size(col("__so")) - col("__ni")).cast("double"))
      .filter(col("__j") >= threshold)
    val w = Window.partitionBy(col("__nk")).orderBy(col("__j").desc, col("__ok").asc)
    val best = scored.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("__nk"), col("__ok").as("dup_of"), col("__j").as("jaccard"))
    newDocs.join(best, newDocs(keyCol) === best("__nk"), "left_outer")
      .drop("__nk")
  }

  /** 64-bit SimHash over words: per-bit majority of word-hash bits. */
  def simhash(docs: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(keyCol),
      explode(filter(split(lower(col(textCol)), "\\s+"), w => length(w) > 0)).as("__w"))
      .withColumn("__h", xxhash64(col("__w")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    words.groupBy(col(keyCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(keyCol),
        (0 until 64).map(b => when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxDist, candidate
    * generation by 4×16-bit band buckets (any pair within distance 3
    * shares at least one exact 16-bit band). */
  def simhashPairs(docs: DataFrame, keyCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val sh = simhash(docs, keyCol, textCol)
    val banded = sh.select(col(keyCol), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("bucket"))): _*)).as("bb"))
      .select(col(keyCol), col("simhash"), col("bb.band"), col("bb.bucket"))
    val l = banded.select(col(keyCol).as("a"), col("simhash").as("sh_a"), col("band"), col("bucket"))
    val r = banded.select(col(keyCol).as("b"), col("simhash").as("sh_b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("a"), col("b"), col("hamming"))
  }

  /**
   * EXACT word-set Jaccard pairs at scale via prefix filtering
   * (Bayardo/AllPairs): order tokens globally by (document frequency,
   * token) — rarest first — and explode only each doc's PREFIX of
   * length |A| − ⌈t·|A|⌉ + 1. Any pair with true Jaccard ≥ t must
   * share a prefix token (overlap ≥ ⌈t·|A|⌉ for both sides), so the
   * rare-token equi-join finds every qualifying pair with NO cross
   * join; candidates are then verified by exact set intersection.
   * Shuffle volume is O(Σ prefix lengths), concentrated on rare
   * tokens, so hot-token skew is structurally avoided.
   */
  def wordJaccardPairs(docs: DataFrame, keyCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    // hash each distinct word to int64 up front: every downstream
    // shuffle (document frequencies, prefix candidates, and above all
    // the exact-verify set join) ships 8-byte longs instead of full
    // string arrays — the same de-fanging applied to the minhash
    // exact re-rank. Jaccard over hashed sets equals word Jaccard
    // modulo 64-bit collisions (~n²/2⁶⁵ for vocab n — negligible).
    val sets = docs.select(col(keyCol).as("k"),
      array_distinct(transform(
        filter(split(lower(col(textCol)), "\\s+"), w => length(w) > 0),
        w => xxhash64(w))).as("ws"))
    val toks = sets.select(col("k"), explode(col("ws")).as("w"))
    val df = toks.groupBy("w").agg(count(lit(1)).as("__df"))
    val n = sets.select(col("k"), size(col("ws")).as("__n"))
    val ordered = toks.join(df, Seq("w")).join(n, Seq("k"))
    val w8 = Window.partitionBy(col("k")).orderBy(col("__df").asc, col("w").asc)
    val prefix = ordered
      .withColumn("__rn", row_number().over(w8))
      .filter(col("__rn") <= col("__n") - ceil(col("__n") * threshold) + 1)
      .select(col("k"), col("w"), col("__n"))
    // AllPairs LENGTH filter at candidate time: J >= t forces
    // t·max(|A|,|B|) <= min(|A|,|B|); carrying the set sizes through
    // the prefix join kills size-mismatched candidates before the
    // expensive set-verify join (measured 1.77M -> 567k candidates at
    // t=0.9 on the sf0.1 template corpus, identical output)
    val cand = prefix.select(col("k").as("a"), col("w"), col("__n").as("__na"))
      .join(prefix.select(col("k").as("b"), col("w"), col("__n").as("__nb")), Seq("w"))
      .filter(col("a") < col("b"))
      .filter(col("__na") >= ceil(col("__nb") * threshold) &&
        col("__nb") >= ceil(col("__na") * threshold))
      .select("a", "b", "__na", "__nb").dropDuplicates("a", "b")
    cand
      .join(sets.select(col("k").as("a"), col("ws").as("ws_a")), Seq("a"))
      .join(sets.select(col("k").as("b"), col("ws").as("ws_b")), Seq("b"))
      .withColumn("inter", size(array_intersect(col("ws_a"), col("ws_b"))))
      // |A ∪ B| = |A| + |B| − |A ∩ B| — saves the array_union pass
      .withColumn("jaccard",
        col("inter").cast("double") / (col("__na") + col("__nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  // ----------------------------------------------------- text analysis

  private val StopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "des", "un", "une", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "las", "es", "de", "un", "una", "por", "para"))

  /** N-gram/stopword heuristic language id: the language whose
    * stopword list covers the most tokens wins; "und" (undetermined)
    * when nothing matches. */
  def languageId(docs: DataFrame, textCol: String): DataFrame = {
    val words = split(lower(col(textCol)), "\\s+")
    val scores = StopwordsByLang.toSeq.sortBy(_._1).map { case (lang, sw) =>
      val hits = size(filter(words, w => w.isin(sw.map(s => s): _*)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    docs.withColumn("__scores", array(scores: _*))
      .withColumn("__best", array_max(col("__scores")))
      .withColumn("lang_pred",
        when(col("__best.hits") > 0, col("__best.lang")).otherwise(lit("und")))
      .drop("__scores", "__best")
  }

  /** Heuristic quality scoring: length, punctuation ratio, mean word
    * length, uppercase ratio — the usual web-text filters. */
  def qualityScore(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("double")
    val nSpaces = (length(t) - length(regexp_replace(t, " ", ""))).cast("double")
    val nPunct = (length(t) - length(regexp_replace(t, "[.,;:!?]", ""))).cast("double")
    val nUpper = (length(t) - length(regexp_replace(t, "[A-Z]", ""))).cast("double")
    val nWords = nSpaces + 1.0
    docs
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len", (nChars - nSpaces) / nWords)
      .withColumn("punct_ratio", nPunct / nChars)
      .withColumn("upper_ratio", nUpper / nChars)
      .withColumn("quality",
        when(nChars < 10, 0.0).otherwise(
          greatest(lit(0.0), lit(1.0)
            - abs(col("mean_word_len") - 5.0) / 10.0
            - col("punct_ratio")
            - col("upper_ratio") / 2.0)))
  }

  /** Whitespace token count + a BPE-ish subword estimate
    * (chars/4 heuristic, the common LLM rule of thumb). */
  def tokenStats(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("ws_tokens", size(filter(split(t, "\\s+"), w => length(w) > 0)))
      .withColumn("subword_est", ceil(length(t) / 4.0).cast("long"))
  }

  /**
   * Winnowing (MOSS) near-duplicate / containment pairs: each doc's
   * rolling-hash fingerprint sketch (guarantee: any shared substring
   * of length ≥ w+k−1 shares a fingerprint), pairs generated by an
   * equi-join on fingerprint hash — shuffle keys are hashes, never
   * pairs — scored by the fraction of the SMALLER sketch that is
   * shared (containment-style, robust to length asymmetry).
   */
  def winnowingPairs(docs: DataFrame, keyCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minShared: Double = 0.5): DataFrame = {
    // sketch size rides along the exploded fingerprints, so the
    // rolling-hash scan runs once per join side (two total) instead of
    // three times, and the two post-aggregation size joins disappear
    val ex = docs.select(col(keyCol).as("__k"),
      array_distinct(graft.sql.functions.st_winnow(col(textCol), lit(k), lit(w))).as("__fp"))
      .filter(size(col("__fp")) > 0)
      .select(col("__k"), size(col("__fp")).as("__n"), explode(col("__fp")).as("__h"))
    ex.select(col("__k").as("a"), col("__n").as("__na"), col("__h"))
      .join(ex.select(col("__k").as("b"), col("__n").as("__nb"), col("__h")), Seq("__h"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("__shared"),
        min(col("__na")).as("__na"), min(col("__nb")).as("__nb"))
      .withColumn("containment",
        col("__shared").cast("double") / least(col("__na"), col("__nb")).cast("double"))
      .filter(col("containment") >= minShared)
      .select(col("a"), col("b"), col("containment"))
  }

  /** Deterministic document fingerprint: xxhash64 of the
    * whitespace-normalized lowercase text (rolling-hash analogue). */
  def fingerprint(docs: DataFrame, keyCol: String, textCol: String): DataFrame =
    docs.select(col(keyCol),
      xxhash64(regexp_replace(lower(col(textCol)), "\\s+", " ")).as("fingerprint"))

  /**
   * Gopher-style repetition signals (Rae et al. 2021, appendix A1.1):
   * documents dominated by repeated n-grams are low-quality training
   * data. Per document: distinct-word counts and the most-frequent
   * word-bigram occupancy, as exact integers plus the derived ratios
   * (`distinct_word_ratio` = distinct/total words, `top_bigram_frac` =
   * max-bigram occurrences / all bigram occurrences).
   *
   * Shape: explode bigrams → count keyed by (doc, bigram) → max/sum
   * keyed by doc. Both aggregations are map-side combinable, shuffle
   * volume is O(#docs · #distinct bigrams) — never O(pairs) — and keys
   * are (doc, bigram), so hot documents cannot skew a single reducer.
   * Documents with fewer than two words have no bigram and drop out
   * (inner join), matching the SQL-oracle semantics.
   */
  def repetitionSignals(docs: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val ws = filter(split(col(textCol), " "), w => length(w) > 0)
    val words = docs.select(col(keyCol), ws.as("__ws"))
    val base = words.select(col(keyCol),
      size(array_distinct(col("__ws"))).as("distinct_words"),
      size(col("__ws")).as("total_words"))
    // slice length must be ≥ 0: an empty/one-word doc has no bigram
    val nb = greatest(lit(0), size(col("__ws")) - 1)
    val bigrams = words.select(col(keyCol),
      explode(zip_with(
        slice(col("__ws"), lit(1), nb),
        slice(col("__ws"), lit(2), nb),
        (a, b) => concat_ws(" ", a, b))).as("__bg"))
    val perBigram = bigrams.groupBy(col(keyCol), col("__bg")).agg(count(lit(1)).as("__n"))
    val perDoc = perBigram.groupBy(col(keyCol))
      .agg(max(col("__n")).as("top_bigram_n"), sum(col("__n")).as("bigram_total"))
    base.join(perDoc, Seq(keyCol))
      .select(col(keyCol),
        col("distinct_words"), col("total_words"),
        col("top_bigram_n"), col("bigram_total"),
        (col("distinct_words").cast("double") / col("total_words").cast("double"))
          .as("distinct_word_ratio"),
        (col("top_bigram_n").cast("double") / col("bigram_total").cast("double"))
          .as("top_bigram_frac"))
  }

  // ------------------------------------------------- web-corpus hygiene

  /** Email pattern shared by redaction and telemetry (RE2-compatible:
    * the DuckDB oracle runs the SAME pattern). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII redaction for training corpora, as pure codegen'd column
    * expressions (regexp_replace chains — no UDF): emails, then IPv4
    * literals, then international-ish phone numbers become fixed
    * placeholder tokens. Order matters and is part of the contract:
    * emails first (their local part can look like a phone), IPs
    * before phones — an IP with 3-digit middle octets (192.168.101.1)
    * DOES satisfy the dot-separated phone shape, so the more specific
    * pattern must claim it first (placeholders contain no digits, so
    * the later pass cannot re-match).
    * Boundaries are CAPTURED context characters restored by `$n`
    * backreferences — not lookarounds — so the patterns run unchanged
    * on RE2 engines (DuckDB) that have no lookbehind. Consequence: two
    * PII spans separated by a single boundary character redact only
    * the first (the boundary is consumed); conservative by design —
    * a training pipeline prefers missing an exotic format over
    * deleting maths. Placeholders contain no digits, so redaction is
    * idempotent. */
  // trailing context: a sentence-final dot counts as a boundary
  // (dot-then-nondigit or dot-at-end), but a dot leading into MORE
  // digits does not — that's what keeps "1.2.3.4.5" (five octets)
  // and version strings intact without lookahead
  private val Trail = "(\\.[^0-9]|\\.$|[^0-9A-Za-z._]|$)"
  val PhonePattern =
    s"(^|[^0-9A-Za-z._+])(\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{1,4})?)$Trail"
  val IpPattern =
    s"(^|[^0-9A-Za-z._])([0-9]{1,3}(\\.[0-9]{1,3}){3})$Trail"
  val HostPattern = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        IpPattern, "$1<IP>$4"),
      PhonePattern, "$1<PHONE>$4")

  /** Redact PII across a corpus: (key, clean text, email hit count
    * for pipeline telemetry). Scale-free column work. */
  def redactPiiDocs(docs: DataFrame, keyCol: String, textCol: String): DataFrame =
    docs.select(col(keyCol),
      redactPii(col(textCol)).as("clean_text"),
      regexp_count(col(textCol), lit(EmailPattern)).cast("int").as("n_emails"))

  /**
   * Canonical URL form for web-corpus dedup, as a pure codegen'd
   * column expression (no UDF): lowercase the scheme+authority, strip
   * the default port (`:443` for https, `:80` for http), drop the
   * fragment, drop `utm_*` tracking params (and the `?` when nothing
   * is left), and strip a trailing slash from the path. Path and
   * non-tracking query case are preserved — paths are case-sensitive.
   */
  def normalizeUrl(url: Column): Column = {
    val head = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val rest = url.substr(length(head) + 1, length(url))
    val lowerHead = regexp_replace(
      regexp_replace(lower(head), "^(https://[^/:]*):443$", "$1"),
      "^(http://[^/:]*):80$", "$1")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_replace(substring_index(noFrag, "?", 1), "/$", "")
    val query = when(instr(noFrag, "?") > 0, substring_index(noFrag, "?", -1))
      .otherwise(lit(""))
    val kept = filter(split(query, "&"), p => !p.startsWith("utm_") && length(p) > 0)
    val qs = array_join(kept, "&")
    concat(lowerHead, path,
      when(length(qs) > 0, concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** Corpus-level boilerplate lines (the C4/CCNet pre-clean shape):
    * nav bars, cookie banners and footers repeat VERBATIM across a
    * site's pages, and a training pipeline strips any line whose
    * trimmed form occurs in at least `minDocs` distinct documents.
    * Returns (lk = trimmed line, doc_freq). Whitespace-only lines are
    * never candidates. Shape at scale: explode → per-(doc, line)
    * dedupe → count — all hash-partitioned on the line key with
    * map-side combine; no doc's state ever exceeds the doc itself. */
  def boilerplateLines(docs: DataFrame, keyCol: String, textCol: String,
      minDocs: Long): DataFrame =
    docs.select(col(keyCol).as("__k"),
        explode(split(col(textCol), "\n")).as("__line"))
      .select(col("__k"), trim(col("__line")).as("lk"))
      .filter(length(col("lk")) > 0)
      .dropDuplicates("__k", "lk")
      .groupBy("lk").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)

  /** Strip corpus-level boilerplate from every document: lines whose
    * trimmed form appears in ≥ `minDocs` distinct docs are removed,
    * every other line survives byte-identical in original order
    * (whitespace-only lines always survive). Docs whose every line is
    * boilerplate come back with an empty string, not a dropped row.
    * The anti-join keys on the trimmed line — a shuffle-partitioned
    * equi-join; the rebuild aggregates (pos, line) structs per doc,
    * bounded by the document's own size. */
  def removeBoilerplate(docs: DataFrame, keyCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    val bp = boilerplateLines(docs, keyCol, textCol, minDocs)
    val lines = docs.select(col(keyCol).as("__k"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("lk", trim(col("__line")))
    val kept = lines.join(bp.select("lk"), Seq("lk"), "left_anti")
      .groupBy("__k")
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x("__line"))).as("__clean"))
    docs.select(col(keyCol))
      .join(kept, docs(keyCol) === kept("__k"), "left")
      .select(col(keyCol),
        coalesce(col("__clean"), lit("")).as("clean_text"))
  }

  /**
   * Deterministic per-stratum quota sampling (the language-balancing
   * step of a corpus pipeline): within each stratum keep the
   * `perStratum` rows with the smallest multiplicative hash of the
   * key (Lehmer constant 48271 mod 2^31−1 — reproducible in plain
   * integer SQL, unlike xxhash64), ties broken by the key. The
   * selection is a pure function of the data — independent of
   * partitioning, executor count, and run order — so a resumed or
   * re-run pipeline samples the identical subset. One window
   * partitioned by the stratum; no global sort.
   */
  /**
   * Deterministic global shuffle — the training-order permutation step
   * of a data loader. Position = global rank under (multiplicative
   * hash of the key, key): a pure function of the DATA, so the same
   * corpus shuffles identically at any parallelism, on resume, and
   * across engines (the Lehmer hash is plain integer SQL). The global
   * rank is the cluster-correct two-pass form: deterministic
   * hash-range buckets, a BUCKET-LOCAL row_number, then one subtotal
   * row per bucket pulled and rebroadcast as cumulative offsets —
   * never a single-partition global window, and (unlike a sampled
   * repartitionByRange) nothing needs caching because the bucket of a
   * row is a pure function of its key. Returns the input columns plus
   * `pos` (0-based).
   */
  def shuffleDeterministic(docs: DataFrame, keyCol: String,
      buckets: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // DETERMINISTIC hash-range buckets (bucket = h·B / 2^31) instead
    // of repartitionByRange: range boundaries come from sampling, so
    // two evaluations of the same plan could disagree — which would
    // force caching the whole corpus to keep offsets consistent.
    // Fixed arithmetic buckets make both passes pure functions of the
    // data: nothing is pinned in executor storage.
    val withH = docs
      .withColumn("__h", pmod(col(keyCol).cast("long") * 48271L, lit(2147483647L)))
      .withColumn("__b", (col("__h") * buckets / 2147483648L).cast("int"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__h"), col(keyCol))
    val local = withH.withColumn("__lrn", row_number().over(w).cast("long") - 1L)
    // bounded driver pull: ONE row per bucket
    val subtotals = withH.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val starts = subtotals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (b, n)) => (b, acc + n)
    }
    val startsDf = broadcast(subtotals.map(_._1).zip(starts.map(_._2))
      .toSeq.toDF("__b", "__bstart"))
    local.join(startsDf, Seq("__b"))
      .withColumn("pos", col("__bstart") + col("__lrn"))
      .drop("__b", "__h", "__lrn", "__bstart")
  }

  /**
   * Deterministic train/validation/test assignment by hash bucket:
   * the key's Lehmer hash maps to a bucket in [0, 1e6) and cumulative
   * `fractions` thresholds (floor(cum·1e6), computed once driver-side)
   * slice the bucket space. Pure function of the key — stable across
   * runs, parallelism, and incremental snapshots (a doc never changes
   * split when new data arrives), and integer-SQL mirrorable. The
   * LAST split absorbs the rounding remainder.
   */
  def assignSplits(docs: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.floor(f * 1000000.0).toLong)
    val bucket = pmod(col(keyCol).cast("long") * 16807L, lit(2147483647L)) % 1000000L
    val expr = fractions.map(_._1).zip(cum).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) {
        case ((name, hi), acc) => when(bucket < hi, lit(name)).otherwise(acc)
      }
    docs.withColumn("split", expr)
  }

  /**
   * Weighted mixture sampling — the "sampling weights per source"
   * step of corpus mixing (temperature weighting is the caller recipe
   * w_i = n_i^(1/T)): each source's quota = floor(total · w_i / Σw)
   * is computed ONCE from the literal weights (no data-dependent
   * float aggregation, so the selection is exactly replayable), and
   * within a source the quota keeps the smallest Lehmer-hashed keys
   * ([[stratifiedSample]]'s selection rule — a pure function of the
   * data). Sources absent from `weights` drop; a quota larger than
   * the source keeps the whole source.
   */
  def mixtureSample(docs: DataFrame, srcCol: String, keyCol: String,
      weights: Seq[(String, Double)], total: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(weights.nonEmpty && weights.forall(_._2 >= 0))
    require(weights.exists(_._2 > 0),
      "mixtureSample needs at least one positive weight (all-zero weights " +
        "would make every quota 0/0)")
    val wsum = weights.map(_._2).sum
    val quotas = weights.map { case (s, w) =>
      (s, math.floor(total * w / wsum).toLong)
    }
    val qDf = broadcast(quotas.toDF(srcCol, "__quota"))
    val h = pmod(col(keyCol).cast("long") * 48271L, lit(2147483647L))
    val w = Window.partitionBy(col(srcCol)).orderBy(h.asc, col(keyCol).asc)
    docs.join(qDf, Seq(srcCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      perStratum: Int): DataFrame = {
    val h = pmod(col(keyCol).cast("long") * 48271L, lit(2147483647L))
    val w = Window.partitionBy(col(strataCol)).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("samp_rank", row_number().over(w))
      .filter(col("samp_rank") <= perStratum)
  }

  /**
   * TF-IDF top-k terms per document. tf = term count in the doc,
   * df = number of docs containing the term, score = tf · ln(N/df).
   * The RANK is computed from the integers alone (tf desc, df asc,
   * term asc) so the selected term set is bit-deterministic — the
   * float score is reporting, never a tie-breaker. Shape at scale:
   * one (doc, term) aggregation (map-side combined), one df
   * aggregation keyed by term, one term equi-join, one per-doc
   * window; N is a single scalar count. No driver-side loops.
   */
  def tfIdf(docs: DataFrame, keyCol: String, textCol: String, k: Int = 3): DataFrame = {
    val n = docs.count()
    val terms = docs.select(col(keyCol).as("__k"),
        explode(wordsOf(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("__k"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, Seq("term"))
      .withColumn("tfidf", col("tf").cast("double") * log(lit(n.toDouble) / col("df").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumnRenamed("__k", keyCol)
      .select(col(keyCol), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  /**
   * Corpus-level duplicate SPAN removal (the C4 paper's "deduplicate
   * at the span level" step, reshaped for a whitespace-token corpus):
   * every document splits into consecutive non-overlapping
   * `span`-word chunks; a chunk survives only where it FIRST occurs
   * in the whole corpus (order = (key, chunk index) — deterministic,
   * so reruns keep the same copy); the survivors reassemble in
   * original order. Returns one row per input document:
   * (key, clean_text, n_kept, n_chunks) — fully-duplicated documents
   * come back with an empty string, not a dropped row.
   *
   * Shape at scale: the only wide operations are ONE window
   * partitioned by the chunk text (hash-partitioned — a chunk's
   * occurrence list is tiny except for pathological boilerplate,
   * which [[removeBoilerplate]] handles first) and ONE per-document
   * reassembly aggregation bounded by the document's own size. The
   * chunking itself is a per-row array expression — no explode of
   * words, no quadratic re-evaluation (the word array is a bound
   * column, see the PERF note at [[shinglesOfWords]]).
   */
  def dedupSpans(docs: DataFrame, keyCol: String, textCol: String,
      span: Int = 20): DataFrame = {
    require(span >= 1)
    val withWords = docs.select(col(keyCol).as("__k"),
      split(col(textCol), "\\s+").as("__ws"))
    val withChunks = withWords
      .withColumn("__nc", ceil(size(col("__ws")) / lit(span.toDouble)).cast("int"))
      .select(col("__k"), col("__nc"),
        posexplode(transform(sequence(lit(0), greatest(col("__nc"), lit(1)) - 1),
          i => array_join(slice(col("__ws"), i * span + 1, lit(span)), " ")))
          .as(Seq("__idx", "__chunk")))
    val w = Window.partitionBy(col("__chunk")).orderBy(col("__k"), col("__idx"))
    val ranked = withChunks.withColumn("__rn", row_number().over(w))
    ranked.groupBy(col("__k"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__rn") === 1,
            struct(col("__idx"), col("__chunk"))))),
          x => x("__chunk"))).as("clean_text"),
        count(when(col("__rn") === 1, lit(1))).as("n_kept"),
        count(lit(1)).as("n_chunks"))
      .withColumnRenamed("__k", keyCol)
  }

  /**
   * Benchmark decontamination (the GPT-3/FineWeb eval-overlap rule):
   * flag every training document sharing at least one `n`-gram of
   * normalized words with any benchmark document. Returns the
   * training rows + a `contaminated` boolean — flag, not drop, so the
   * caller can audit before filtering. Both sides explode to distinct
   * n-gram strings and meet in ONE equi-join on the n-gram
   * (hash-partitioned; the benchmark side of a real pipeline is
   * dimension-sized next to the crawl, so Spark broadcasts it when
   * small and shuffles cleanly when not); the flag set then left-semi
   * joins back — no row ever carries more than one n-gram.
   */
  def decontaminate(train: DataFrame, trainKey: String, trainText: String,
      bench: DataFrame, benchText: String, n: Int = 8): DataFrame = {
    val trainGrams = train.select(col(trainKey).as("__k"),
        explode(shinglesOfWords(wordsOf(col(trainText)), n)).as("__g"))
      .dropDuplicates("__k", "__g")
    val benchGrams = bench.select(explode(
        shinglesOfWords(wordsOf(col(benchText)), n)).as("__g"))
      .distinct()
    val contaminatedKeys = trainGrams.join(benchGrams, Seq("__g"), "left_semi")
      .select(col("__k")).distinct()
      .withColumn("__contaminated", lit(true))
    train.join(contaminatedKeys, train(trainKey) === contaminatedKeys("__k"), "left")
      .drop("__k")
      .withColumn("contaminated", coalesce(col("__contaminated"), lit(false)))
      .drop("__contaminated")
  }

  /**
   * One-call training-corpus cleaning pipeline — the end-to-end
   * composition a web-scale data pipeline actually runs, each stage a
   * shuffle-bounded operator from this module:
   *
   *  1. canonical-URL dedup (normalizeUrl; first writer = min key wins,
   *     deterministically) — crawls re-fetch the same page under
   *     tracking-param/fragment/port variants;
   *  2. corpus-level boilerplate line removal (removeBoilerplate);
   *  3. PII redaction (redactPii) — BEFORE near-dup detection, so two
   *     copies of a template page differing only in the embedded
   *     email/phone become identical and dedup catches them;
   *  4. quality gate: at least `minWords` whitespace tokens;
   *  5. near-duplicate clustering (MinHash LSH + exact re-rank +
   *     connected components) keeping the cluster minimum as the
   *     canonical copy.
   *
   * Returns one row per SURVIVING document: (key, canon_url,
   * cluster_size, clean_text). Every stage is hash-partitioned on its
   * natural key (canonical url / line / doc / cell-free) with no
   * driver-side collection; state per task never exceeds one document.
   */
  def cleanCorpus(docs: DataFrame, keyCol: String, urlCol: String, textCol: String,
      boilerplateMinDocs: Long, minWords: Int, dupThreshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 1. canonical-URL dedup
    val canon = docs.withColumn("__curl", normalizeUrl(col(urlCol)))
    val urlKept = canon
      .withColumn("__mink", min(col(keyCol)).over(Window.partitionBy(col("__curl"))))
      .filter(col(keyCol) === col("__mink"))
      .select(col(keyCol), col("__curl").as("canon_url"), col(textCol))
    // 2. boilerplate (doc frequency measured on the POST-dedup corpus)
    val stripped = removeBoilerplate(urlKept, keyCol, textCol, boilerplateMinDocs)
      .join(urlKept.select(col(keyCol), col("canon_url")), Seq(keyCol))
    // 3. PII redaction
    val redacted = stripped.withColumn("clean_text", redactPii(col("clean_text")))
    // 4. quality gate
    val quality = redacted
      .filter(size(split(col("clean_text"), "\\s+")) >= minWords)
    // 5. near-dup clusters; canonical survivors with their cluster size
    val clusters = Components.nearDupClusters(
      quality.select(col(keyCol), col("clean_text")), keyCol, "clean_text", dupThreshold)
    val sizes = clusters.groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
    quality
      .join(clusters.filter(col("is_canonical")).select(col(keyCol), col("cluster")), Seq(keyCol))
      .join(sizes, Seq("cluster"))
      .select(col(keyCol), col("canon_url"), col("cluster_size"), col("clean_text"))
  }

  /** Lower-cased host (authority minus port) of a URL — the key for
    * per-domain quotas, blocklists and crawl accounting. Pure
    * codegen'd regex. */
  def hostOf(url: Column): Column = lower(regexp_extract(url, HostPattern, 1))

  /** Per-domain corpus accounting (the input to domain quotas and
    * blocklist decisions): page count, language spread, total text
    * volume and a deterministic sample URL per host. One map-side
    * combinable aggregation keyed by host — scale-free. */
  def domainStats(pages: DataFrame, urlCol: String, langCol: String,
      textCol: String): DataFrame =
    pages.groupBy(hostOf(col(urlCol)).as("host"))
      .agg(count(lit(1)).as("n_pages"),
        countDistinct(col(langCol)).as("n_langs"),
        sum(length(col(textCol))).as("total_chars"),
        min(col(urlCol)).as("sample_url"))

  /** URL duplicate groups: one row per canonical URL with the member
    * count and the lexicographically-smallest raw member. Plain
    * hash-partitioned aggregation on the canonical form — scale-free. */
  def urlDupGroups(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("norm_url", normalizeUrl(col(urlCol)))
      .groupBy("norm_url")
      .agg(count(lit(1)).as("n_variants"), min(col(urlCol)).as("canonical_url"))

  // ------------------------------------------------------- embeddings

  /** Assemble per-id vectors from a long-form embeddings table
    * (id, pos, element): elements are placed at their POSITION, so the
    * result is the actual vector (cosine over two assembled vectors is
    * the cosine of the underlying vectors). The position column is
    * required — collecting without one and sorting by value would
    * compute a bag-of-values similarity, not cosine. */
  def assembleVectors(embeddings: DataFrame, idCol: String, posCol: String,
      elemCol: String): DataFrame =
    embeddings.groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col(posCol).cast("int").as("p"),
          col(elemCol).cast("double").as("x")))),
        e => e.getField("x")).as("vec"))

  /** Cosine similarity between two equal-length array<double> cols. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Brute-force exact top-k cosine neighbours (the correctness
    * baseline; the broadcast side must be dimension-table sized). */
  def cosineTopK(vectors: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val l = vectors.select(col(idCol).as("a"), col(vecCol).as("va"))
    val r = vectors.select(col(idCol).as("b"), col(vecCol).as("vb"))
    val pairs = l.join(broadcast(r), col("a") =!= col("b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
    val w = Window.partitionBy(col("a")).orderBy(col("cosine").desc, col("b"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("a"), col("b"), col("cosine"), col("rank"))
  }

  /**
   * IVF (inverted-file) ANN bucketing — the coarse-quantizer scale
   * path beside the hyperplane LSH: a deterministic k-means (fixed
   * iteration count, centroids seeded from the rows with the smallest
   * key hashes — no RNG, so results are identical at any parallelism)
   * builds `k` coarse cells; every vector is assigned to its nearest
   * centroid, and candidate pairs are generated by an equi-join on
   * the cell id with `nprobe`-cell expansion on one side (a vector
   * probes its `nprobe` nearest centroids, so near-duplicates split
   * across a cell boundary are still found). Centroids are a k×dim
   * dimension table — driver-sized by design — while assignments and
   * pair generation stay fully distributed; shuffle keys are cell
   * ids, never pairs.
   */
  def cosineIvfPairs(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, nprobe: Int = 2, iterations: Int = 5,
      threshold: Double = 0.9): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val v = vectors.select(col(idCol).cast("long").as("__id"),
      col(vecCol).cast("array<double>").as("__v")).persist()
    // deterministic seeds: k rows with the smallest key hash
    var centroids: Array[(Int, Seq[Double])] = v
      .withColumn("__h", xxhash64(col("__id")))
      .orderBy(col("__h")).limit(k)
      .select("__v").as[Seq[Double]].collect()
      .zipWithIndex.map { case (c, i) => (i, c) }
    var it = 0
    while (it < iterations) {
      val cdf = broadcast(centroids.toSeq.toDF("__cid", "__c"))
      val assigned = v.crossJoin(cdf)
        .withColumn("__cos", cosine(col("__v"), col("__c")))
      val w = Window.partitionBy(col("__id")).orderBy(col("__cos").desc, col("__cid"))
      val best = assigned.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      // new centroid = dimension-wise mean of members (then the next
      // cosine normalizes implicitly)
      val means = best
        .select(col("__cid"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy("__cid", "__d").agg(avg(col("__x")).as("__m"))
        .groupBy("__cid").agg(array_sort(collect_list(struct(col("__d"), col("__m")))).as("__s"))
        .select(col("__cid"), expr("transform(__s, p -> p.__m)").as("__c"))
        .as[(Int, Seq[Double])].collect()
      // keep seeds for clusters that lost all members (deterministic)
      val byId = means.toMap
      centroids = centroids.map { case (i, c) => (i, byId.getOrElse(i, c)) }
      it += 1
    }
    val cdf = broadcast(centroids.toSeq.toDF("__cid", "__c"))
    val scored = v.crossJoin(cdf)
      .withColumn("__cos", cosine(col("__v"), col("__c")))
    val w = Window.partitionBy(col("__id")).orderBy(col("__cos").desc, col("__cid"))
    val ranked = scored.withColumn("__r", row_number().over(w))
    val home = ranked.filter(col("__r") === 1)
      .select(col("__id").as("b"), col("__v").as("vb"), col("__cid"))
    val probes = ranked.filter(col("__r") <= nprobe)
      .select(col("__id").as("a"), col("__v").as("va"), col("__cid"))
    // normalize pair orientation AFTER the join: the probe side may be
    // either endpoint (only one of the two needs to probe the other's
    // home cell for the pair to surface)
    val pairs = probes.join(home, Seq("__cid"))
      .filter(col("a") =!= col("b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"), col("cosine"))
      .dropDuplicates("a", "b")
      .filter(col("cosine") >= threshold)
    v.unpersist()
    pairs
  }

  /**
   * LSH-bucketed approximate neighbour candidates: sign-bit sketch
   * under `planes` deterministic pseudo-random hyperplanes (plane
   * values derived from xxhash64(planeIdx, dimIdx) — no RNG), bucket
   * join on the sketch, exact cosine re-rank. The scale path: shuffle
   * keys are buckets, never pairs.
   */
  def cosineLshPairs(vectors: DataFrame, idCol: String, vecCol: String,
      planes: Int = 16, threshold: Double = 0.9): DataFrame = {
    // deterministic plane component for (p, d): map hash to [-1, 1)
    def planeComponent(p: Int, d: Column): Column =
      (pmod(xxhash64(lit(p), d), lit(20001L)).cast("double") - 10000.0) / 10000.0
    val sketch = (0 until planes).map { p =>
      val dotp = aggregate(
        zip_with(col(vecCol), transform(sequence(lit(0), size(col(vecCol)) - 1),
          d => planeComponent(p, d)), (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      when(dotp >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    val sk = vectors.withColumn("__bucket", sketch)
    val l = sk.select(col(idCol).as("a"), col(vecCol).as("va"), col("__bucket"))
    val r = sk.select(col(idCol).as("b"), col(vecCol).as("vb"), col("__bucket"))
    l.join(r, Seq("__bucket")).filter(col("a") < col("b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }

  // ------------------------------------------- context-window chunking

  /**
   * Split each document's whitespace tokens into windows of
   * `chunkSize` tokens advancing by `stride` (overlap = chunkSize −
   * stride) — the context-window prep for pretraining / RAG
   * ingestion. Windows cover every token; the LAST window may be
   * shorter than `chunkSize`; no window starts at or past the end
   * (no fully-redundant tail, the HF `return_overflowing_tokens`
   * convention). Token-less documents yield no rows.
   *
   * Scale: pure column expressions (whole-stage codegen), zero
   * shuffle — output partitioning inherits the input's. Emits
   * (key, chunk_id, chunk_text, chunk_tokens).
   */
  def chunkDocuments(docs: DataFrame, keyCol: String, textCol: String,
      chunkSize: Int = 512, stride: Int = 384): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      "need 1 <= stride <= chunkSize")
    val nChunks =
      floor((greatest(col("__n") - chunkSize, lit(0)) + (stride - 1))
        .cast("double") / stride).cast("long") + 1
    docs
      .select(col(keyCol),
        filter(split(col(textCol), "\\s+"), w => length(w) > 0).as("__ws"))
      .withColumn("__n", size(col("__ws")))
      .filter(col("__n") > 0)
      .select(col(keyCol),
        posexplode(transform(sequence(lit(0L), nChunks - 1),
          k => slice(col("__ws"), (k * stride + 1).cast("int"), lit(chunkSize)))))
      .select(col(keyCol), col("pos").as("chunk_id"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).as("chunk_tokens"))
  }

  /**
   * GPT-style sequence packing: concatenate every document's tokens
   * in ascending key order into one global stream and split it into
   * fixed `blockSize`-token training blocks. Returns the doc↔block
   * span map — one row per (doc, block) overlap:
   * (key, block_id, doc_off, tok_start, n_toks), where `doc_off` is
   * the document's global token offset, `tok_start` the first token
   * of the doc belonging to this block, `n_toks` how many.
   *
   * Scale: the global prefix sum is computed the cluster-correct way
   * — DETERMINISTIC order-preserving buckets (equal-width slices of
   * the exact driver-pulled [min, max] key range — the bucket of a
   * row is a pure function of the data, unlike repartitionByRange's
   * sampled boundaries, so nothing needs pinning in executor storage
   * and a recomputed partition can never shift offsets mid-job),
   * per-bucket running totals under a BUCKET-LOCAL window, per-bucket
   * subtotals (one tiny row per bucket) pulled once and rebroadcast
   * as cumulative starts — never a global single-partition
   * Window.orderBy. Offsets depend only on the key order, so any
   * parallelism yields identical output. Keys must be numeric (the
   * engine-wide ordering-key contract, see [[shuffleDeterministic]])
   * and unique; bucket balance tracks the key distribution's
   * uniformity (raise `buckets` for skewed id spaces — the driver
   * pull stays one row per bucket).
   */
  def packSequences(docs: DataFrame, keyCol: String, textCol: String,
      blockSize: Int, buckets: Int = 1024): DataFrame = {
    require(blockSize >= 1 && buckets >= 1)
    require(docs.schema(keyCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packSequences orders by '$keyCol', which must be numeric")
    val spark = docs.sparkSession
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(keyCol),
        size(filter(split(col(textCol), "\\s+"), w => length(w) > 0)).cast("long").as("__n"))
      .filter(col("__n") > 0)
    // exact key range: a two-scalar driver pull (deterministic, no
    // sampling) that fixes the bucket boundaries for both passes
    val mm = toks.agg(min(col(keyCol).cast("double")).as("lo"),
      max(col(keyCol).cast("double")).as("hi")).head()
    if (mm.isNullAt(0))
      return toks.select(col(keyCol), lit(0L).as("block_id"), lit(0L).as("doc_off"),
        lit(0L).as("tok_start"), lit(0L).as("n_toks")).limit(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val bCol =
      if (hi == lo) lit(0)
      else least(floor((col(keyCol).cast("double") - lo) / (hi - lo) * buckets),
        lit(buckets - 1.0)).cast("int")
    val withB = toks.withColumn("__b", bCol)
    val w = Window.partitionBy(col("__b")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val localOff = withB.withColumn("__loff", coalesce(sum(col("__n")).over(w), lit(0L)))
    // bounded driver pull: ONE row per bucket
    val subtotals = withB.groupBy(col("__b")).agg(sum(col("__n")).as("__tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val starts = subtotals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (b, tot)) => (b, acc + tot)
    }
    val startByB = subtotals.map(_._1).zip(starts.map(_._2))
    import spark.implicits._
    val startsDf = startByB.toSeq.toDF("__b", "__bstart")
    val withOff = localOff.join(broadcast(startsDf), Seq("__b"))
      .withColumn("doc_off", col("__bstart") + col("__loff"))
    val firstB = floor(col("doc_off").cast("double") / blockSize).cast("long")
    val lastB = floor((col("doc_off") + col("__n") - 1).cast("double") / blockSize).cast("long")
    withOff
      .select(col(keyCol), col("__n"), col("doc_off"),
        explode(sequence(firstB, lastB)).as("block_id"))
      .withColumn("tok_start",
        greatest(col("block_id") * blockSize - col("doc_off"), lit(0L)))
      .withColumn("n_toks",
        least(col("__n"), (col("block_id") + 1) * blockSize - col("doc_off")) - col("tok_start"))
      .select(col(keyCol), col("block_id"), col("doc_off"), col("tok_start"), col("n_toks"))
  }

  // ---------------------------------------- Bloom-membership dedup

  /**
   * Bloom filter over xxhash64(valueCol) as a SPARSE (word_idx, word)
   * bitmap table: `k` set positions per value from seed-stable
   * hashes, OR-folded into 64-bit words. Size is bounded by
   * min(k·|ref|, bits/64) rows — a few MB even for a billion-doc
   * reference at bits=2^32, so it BROADCASTS where the reference
   * corpus itself never could. Fully deterministic (no RNG, no
   * sampling): same reference → bit-identical filter at any
   * parallelism.
   */
  def bloomBuild(ref: DataFrame, valueCol: String,
      bits: Long = 1L << 24, k: Int = 5): DataFrame = {
    require(bits % 64 == 0 && k >= 1)
    val pos = (1 to k).map(s => pmod(xxhash64(lit(s), col(valueCol)), lit(bits)))
    ref
      .select(explode(array(pos: _*)).as("__pos"))
      .groupBy(floor(col("__pos").cast("double") / 64).cast("long").as("word_idx"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("__pos"), lit(64)).cast("int"))).as("word"))
  }

  /**
   * Membership probe: flag each row of `df` with `might_contain` —
   * true iff ALL `k` bloom positions of its value hit set bits.
   * False ⇒ DEFINITELY absent from the reference (no false
   * negatives); true ⇒ verify exactly. The probe is a broadcast
   * equi-join on word_idx (the bloom table is compact by
   * construction) + a count-of-hits aggregate keyed by the row key —
   * the big side shuffles once, by its own key.
   */
  def bloomMightContain(df: DataFrame, keyCol: String, valueCol: String,
      bloom: DataFrame, bits: Long = 1L << 24, k: Int = 5): DataFrame = {
    val pos = (1 to k).map(s => pmod(xxhash64(lit(s), col(valueCol)), lit(bits)))
    val probes = df.select(col(keyCol),
        explode(array(pos: _*)).as("__pos"))
      .select(col(keyCol),
        floor(col("__pos").cast("double") / 64).cast("long").as("word_idx"),
        call_function("shiftleft", lit(1L),
          pmod(col("__pos"), lit(64)).cast("int")).as("__mask"))
    val hits = probes
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .withColumn("__hit", coalesce(col("word").bitwiseAND(col("__mask")) =!= 0, lit(false)))
      .groupBy(col(keyCol))
      .agg((count(lit(1)) === sum(when(col("__hit"), 1).otherwise(0))).as("might_contain"))
    df.join(hits, Seq(keyCol))
  }

  /**
   * Dedup a new batch against a reference corpus WITHOUT joining the
   * reference's text: build (or reuse) a bloom over the reference's
   * exact text hashes, pass definitely-new docs straight through,
   * and exact-verify only the might-contain sliver (md5 anti-join —
   * false positives die here, so the END-TO-END semantics are the
   * exact anti-join, independent of bloom sizing). Returns the new
   * docs NOT present in the reference, plus `bloom_pruned` = true
   * where the bloom alone already proved novelty.
   *
   * The scale story for incremental crawls: the reference (100 TB of
   * history) is read ONCE to build a bits/8-byte filter; each new
   * snapshot probes the broadcast filter and joins only its
   * might-contain docs against the reference's hash column.
   */
  def bloomDedup(newDocs: DataFrame, keyCol: String, textCol: String,
      ref: DataFrame, refTextCol: String,
      bits: Long = 1L << 24, k: Int = 5): DataFrame = {
    val bloom = bloomBuild(ref.select(md5(col(refTextCol).cast("binary")).as("__h")), "__h", bits, k)
    val flagged = bloomMightContain(
      newDocs.withColumn("__h", md5(col(textCol).cast("binary"))),
      keyCol, "__h", bloom, bits, k)
    val definiteNew = flagged.filter(!col("might_contain"))
      .withColumn("bloom_pruned", lit(true))
    val verified = flagged.filter(col("might_contain"))
      .join(ref.select(md5(col(refTextCol).cast("binary")).as("__h")).distinct(),
        Seq("__h"), "left_anti")
      .withColumn("bloom_pruned", lit(false))
    definiteNew.unionByName(verified).drop("__h", "might_contain")
  }

  // ------------------------------------------- HTML text extraction

  /**
   * HTML → visible text (the crawl step between WARC payloads and
   * cleaning): drop script/style/comment blocks, turn block-level
   * closers and <br> into newlines, strip remaining tags, decode the
   * named entities (&amp; LAST so "&amp;lt;" cannot double-decode —
   * the standard order), collapse horizontal whitespace, squeeze
   * blank-line runs. Pure codegen'd regexp/replace chain (no UDF, no
   * DOM): deterministic, cross-engine replayable, O(len) per row.
   * Numeric character references other than &#39; are left as-is
   * (documented: a DOM-less extractor; fine for quality signals).
   */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", "")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", "")
    val breaks = regexp_replace(noComment,
      "(?i)<(br[^>]*|/p|/div|/h[1-6]|/li|/tr|/title)>", "\n")
    val noTags = regexp_replace(breaks, "<[^>]+>", "")
    val ent = replace(replace(replace(replace(replace(replace(noTags,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" ")), lit("&amp;"), lit("&"))
    val hws = regexp_replace(ent, "[ \\t\\r]+", " ")
    val lines = regexp_replace(hws, " ?\\n ?", "\n")
    val squeezed = regexp_replace(lines, "\\n{2,}", "\n")
    // SQL trim() strips spaces only — strip newline runs too
    regexp_replace(squeezed, "^\\s+|\\s+$", "")
  }

  // ------------------------------------ DSIR importance scores

  /** Deterministic word→bucket map: an 8-char 31-polynomial over the
    * code points of the '.'-padded word, mod `buckets`. Pure integer
    * column arithmetic (no engine-specific hash), so an external SQL
    * engine replays it bit-for-bit — the contract is the bucketed
    * LLR, not this particular bucket map; swap in any hash at scale. */
  private def wordBucket(w: Column, buckets: Int): Column = {
    val p = rpad(w, 8, ".")
    val h = (1 to 8).map(i =>
      ascii(substring(p, i, 1)).cast("long") * lit(Seq(1L, 31L, 961L, 29791L,
        923521L, 28629151L, 887503681L, 27512614111L)(i - 1))).reduce(_ + _)
    pmod(h, lit(buckets.toLong))
  }

  /**
   * DSIR-style importance scores (Xie et al. 2023, "Data Selection
   * for Language Models via Importance Resampling"): score each doc
   * by the log-likelihood ratio of a bag-of-hashed-words model fit on
   * a TARGET (high-quality) corpus vs the RAW corpus, add-1 smoothed:
   *
   *   score(d) = Σ_tokens llr(bucket(tok)),
   *   llr(b)   = ln( ((ct_p+1)/(Tp+B)) / ((ct_q+1)/(Tq+B)) )
   *
   * llr is INTEGER-SCALED (floor(1e6·llr + 0.5) per bucket — one ln
   * per bucket, a bounded dimension table) so the per-doc sum is an
   * exact integer sum: bit-identical at any parallelism, and an
   * external engine verifies it exactly.
   *
   * Scale: bucket LLRs are a ≤`buckets`-row broadcast; docs explode
   * to tokens, map-side combine to (doc, bucket, count), one
   * broadcast join, one groupBy — shuffle volume O(docs·buckets).
   */
  def dsirScores(docs: DataFrame, keyCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 4096): DataFrame = {
    def bucketCounts(df: DataFrame, tc: String): DataFrame =
      df.select(explode(filter(split(lower(col(tc)), "\\s+"),
          w => length(w) > 0)).as("__w"))
        .select(wordBucket(col("__w"), buckets).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val pc = bucketCounts(target, targetTextCol)
    val qc = bucketCounts(docs, textCol)
    val tp = pc.agg(sum("ct")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()(0) // one scalar, bounded driver pull by design
    val tq = qc.agg(sum("ct")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()(0)
    val llr = qc.join(pc.withColumnRenamed("ct", "ctp"), Seq("bucket"), "left")
      .select(col("bucket"),
        floor(lit(1e6) * log(
          (coalesce(col("ctp"), lit(0L)).cast("double") + lit(1.0)) /
            (lit(tp.toDouble) + lit(buckets.toDouble)) *
            ((lit(tq.toDouble) + lit(buckets.toDouble)) /
              (col("ct").cast("double") + lit(1.0)))) + lit(0.5))
          .cast("long").as("llr"))
    val docBuckets = docs
      .select(col(keyCol), explode(filter(split(lower(col(textCol)), "\\s+"),
        w => length(w) > 0)).as("__w"))
      .select(col(keyCol), wordBucket(col("__w"), buckets).as("bucket"))
      .groupBy(keyCol, "bucket").agg(count(lit(1)).as("n"))
    docBuckets.join(broadcast(llr), Seq("bucket"))
      .groupBy(keyCol)
      .agg(sum(col("n")).cast("long").as("n_tokens"),
        sum(col("n") * col("llr")).cast("long").as("score_scaled"))
  }

  // --------------------------------- bigram-LM perplexity (CCNet shape)

  /** (key, b1, b2) adjacent word-bucket pairs of each doc — the window
    * is per doc (partitioned on the key), so the sort never crosses
    * documents. */
  private def bucketPairs(df: DataFrame, keyCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val w = df.select(col(keyCol),
      posexplode(filter(split(lower(col(textCol)), "\\s+"),
        x => length(x) > 0)).as(Seq("pos", "__w")))
    val win = Window.partitionBy(keyCol).orderBy("pos")
    w.withColumn("__w2", lead(col("__w"), 1).over(win))
      .filter(col("__w2").isNotNull)
      .select(col(keyCol), wordBucket(col("__w"), buckets).as("b1"),
        wordBucket(col("__w2"), buckets).as("b2"))
  }

  /**
   * Hashed-bigram language-model scores — the CCNet/Wenzek 2020
   * perplexity-filter shape with a transparent in-engine LM instead
   * of KenLM: fit add-1-smoothed bigram probabilities on a REFERENCE
   * corpus (the "good" text), score each doc by its total bigram
   * log-likelihood. Lower (more negative) per-pair averages ≈ higher
   * perplexity ≈ filter candidates.
   *
   *   term(b1,b2) = ln( (c2(b1,b2)+1) / (c1(b1)+B) )     [add-1]
   *   score(d)    = Σ_adjacent-pairs term(bucket pair)
   *
   * Terms are INTEGER-SCALED per distinct pair (floor(1e6·t + 0.5)),
   * so per-doc sums are exact integer sums — bit-identical at any
   * parallelism, exactly SQL-replayable. Unigram context counts are a
   * ≤B-row broadcast; bigram counts join on the pair key (shuffle
   * scales with distinct observed pairs, never with corpus size
   * squared).
   */
  def lmScores(docs: DataFrame, keyCol: String, textCol: String,
      ref: DataFrame, refKeyCol: String, refTextCol: String,
      buckets: Int = 4096): DataFrame = {
    val refPairs = bucketPairs(ref, refKeyCol, refTextCol, buckets)
    val c2 = refPairs.groupBy("b1", "b2").agg(count(lit(1)).as("c2"))
    val c1 = refPairs.groupBy("b1").agg(count(lit(1)).as("c1"))
    val docPairs = bucketPairs(docs, keyCol, textCol, buckets)
      .groupBy(keyCol, "b1", "b2").agg(count(lit(1)).as("n"))
    val withTerm = docPairs
      .join(c2, Seq("b1", "b2"), "left")
      .join(broadcast(c1), Seq("b1"), "left")
      .withColumn("term", floor(lit(1e6) * log(
        (coalesce(col("c2"), lit(0L)).cast("double") + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)).cast("double") + lit(buckets.toDouble)))
        + lit(0.5)).cast("long"))
    withTerm.groupBy(keyCol)
      .agg(sum(col("n")).cast("long").as("n_pairs"),
        sum(col("n") * col("term")).cast("long").as("loglik_scaled"))
  }
}
