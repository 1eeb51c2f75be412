package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH and SimHash near-dup detection.
  *
  * Scale design (100 TB): every variant projects the text down to a
  * compact key/signature BEFORE the shuffle — raw text never moves.
  *  - exact: shuffle on a 64-bit hash of the normalized key.
  *  - Jaccard: explode distinct shingles (doc_id, shingle-hash) pairs;
  *    the self-join is shingle-partitioned; skew (stop-shingles) is
  *    bounded by dropping shingles above a document-frequency cap.
  *  - MinHash+LSH: k permutations → b bands; candidate pairs come from
  *    band-bucket joins (linear in bucket sizes), not all-pairs.
  *  - SimHash: one 64-bit signature per doc; banding on 16-bit chunks
  *    gives hamming≤k candidates without O(n²).
  */
object Dedup {

  /** Exact duplicate groups by normalized key: every input row comes
    * back with its `dedup_key`, the key's `group_size`, and
    * `is_representative` (true on the row with the minimum idCol per
    * key — the one a dedup keeps).
    *
    * A bounded aggregation, NOT a window: the per-key representative
    * rides in `min(struct(id))`, so map tasks reduce each key to one
    * (size, rep) candidate before the shuffle and the exchange carries
    * O(keys) rows. The earlier `row_number over partitionBy(key)`
    * formulation sorted every group inside one task — a boilerplate
    * key with millions of duplicates (the common shape in web corpora)
    * would serialize there at 100 TB. PlanSpec pins the no-window
    * shape. */
  def exactGroups(docs: DataFrame, key: Column, idCol: String): DataFrame = {
    val keyed = docs.withColumn("dedup_key", key)
    val groups = keyed.groupBy(col("dedup_key"))
      .agg(count(lit(1)).as("group_size"),
        min(col(idCol)).as("__rep_id"))
      .withColumnRenamed("dedup_key", "__gk")
    // null-safe join: a NULL key is a group like any other (groupBy
    // already buckets NULLs together); a plain equi-join would drop
    // every null-key row and break the every-row-comes-back contract
    keyed.join(groups, col("dedup_key") <=> col("__gk"))
      .withColumn("is_representative", col(idCol) <=> col("__rep_id"))
      .drop("__gk", "__rep_id")
  }

  /** (doc_id, shingle-hash) exploded pairs, distinct per doc, with hot
    * shingles above dfCap dropped (skew guard — a shingle occurring in
    * a large fraction of docs generates quadratic join fanout and no
    * dedup signal).
    *
    * Shingles are projected to a 64-bit xxhash64 BEFORE the explode, so
    * every downstream shuffle/join carries 8-byte longs instead of raw
    * k-word strings — at 100 TB the shingle table is the dominant
    * shuffle and this cuts its width ~10×. Collision odds at n distinct
    * shingles are n²/2⁶⁵ (≪1e-6 even at billions). */
  def shinglePairs(docs: DataFrame, idCol: String, textCol: String, k: Int,
      dfCap: Long = Long.MaxValue): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.ShingleHashes(col(textCol), k)).as("s"))
    if (dfCap == Long.MaxValue) sh
    else {
      val hot = sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") > dfCap)
      sh.join(hot, Seq("s"), "left_anti")
    }
  }

  /** All pairs with n-gram Jaccard ≥ threshold: shingle-partitioned
    * self-join, shared-count agg, then Jaccard arithmetic. Rounded to 6
    * decimals so results are engine-portable.
    *
    * `dfCap` is REQUIRED (no default): the self-join fans out cap²
    * pairs per shingle, so a single stop-shingle carried by a large
    * fraction of the corpus goes quadratic unless capped — size it to
    * the largest document-frequency that still carries dedup signal
    * (shingles above it are boilerplate and produce no true near-dup
    * evidence). Semantics: shingles with df > dfCap are excluded from
    * BOTH the pair join and the per-doc shingle counts, as if they
    * never existed — an oracle reproduces this with a HAVING clause.
    * At corpus sizes where the cap provably cannot trigger (df ≤ #docs
    * ≤ dfCap) the result equals the uncapped all-pairs Jaccard. For
    * anything beyond evaluation anchors, prefer
    * [[minhashVerifiedPairs]] — bucket-local, never all-pairs. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, k: Int,
      threshold: Double, dfCap: Long,
      shinglePersist: StorageLevel = StorageLevel.NONE): DataFrame = {
    // persist the RAW shingle table (not the capped view): the raw plan
    // is the one [[minhashVerifiedPairs]] also builds, so in a session
    // running both the CacheManager shares one entry; the df filter is
    // cheap to re-derive from the cached scan
    val raw0 = shinglePairs(docs, idCol, textCol, k)
    val raw = if (shinglePersist == StorageLevel.NONE) raw0 else raw0.persist(shinglePersist)
    val sh =
      if (dfCap == Long.MaxValue) raw
      else {
        val hot = raw.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") > dfCap)
        raw.join(hot, Seq("s"), "left_anti")
      }
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val a = sh.select(col("doc_id").as("d1"), col("s").as("s1"))
    val b = sh.select(col("doc_id").as("d2"), col("s").as("s2"))
    val shared = a.join(b, col("s1") === col("s2") && col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("shared"))
    shared
      .join(counts.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_shingles", "n1"), "d1")
      .join(counts.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_shingles", "n2"), "d2")
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("n1") + col("n2") - col("shared")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("shared"), col("jaccard"))
  }

  /** MinHash signatures from an exploded (doc_id, shingle-hash) table:
    * signature[i] = min over the doc's shingles of xxhash64(i, s). */
  def signaturesFromShingles(sh: DataFrame, numPerm: Int): DataFrame = {
    val mins = (0 until numPerm).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numPerm).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash signatures: k permutations simulated as xxhash64(seed, s);
    * signature[i] = min over the doc's shingles. One row per doc,
    * signature as array<bigint>. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numPerm: Int): DataFrame =
    signaturesFromShingles(shinglePairs(docs, idCol, textCol, shingleK), numPerm)

  /** Per-doc LSH band keys from MinHash signatures: one (doc_id, band,
    * bucket) row per band, bucket = xxhash64 over the band's signature
    * slice (the band index rides inside the hash input, so bucket
    * values are already band-disjoint). This is the storable identity
    * of the LSH scheme — what a cross-run near-dup ledger persists
    * ([[graft.operators.FingerprintLedger]], q94). numPerm must be
    * divisible by bands. */
  def bandBuckets(signatures: DataFrame, bands: Int): DataFrame = {
    val rowsPerBand = (size(col("sig")) / lit(bands)).cast("int")
    signatures.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_", lit("band"), b.cast("string"),
          to_json(slice(col("sig"), b * rowsPerBand + lit(1), rowsPerBand)))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** LSH candidate pairs from banded MinHash signatures: docs sharing
    * any band bucket. numPerm must be divisible by bands. */
  def minhashCandidates(signatures: DataFrame, bands: Int): DataFrame = {
    val banded = bandBuckets(signatures, bands)
    val l = banded.select(col("doc_id").as("d1"), col("band").as("band1"), col("bucket").as("bucket1"))
    val r = banded.select(col("doc_id").as("d2"), col("band").as("band2"), col("bucket").as("bucket2"))
    l.join(r, col("band1") === col("band2") && col("bucket1") === col("bucket2") &&
        col("d1") < col("d2"))
      .select("d1", "d2").distinct()
  }

  /** The production near-dup pipeline shape: MinHash+LSH candidate
    * generation (linear in bucket sizes — never all-pairs) followed by
    * an exact n-gram-Jaccard verification of ONLY the candidate pairs.
    * With numPerm=64 / bands=16 (4 rows per band), a pair at the
    * j=threshold boundary of 0.9 is missed with probability
    * (1−0.9⁴)¹⁶ ≈ 4e-8, so the output equals the exact all-pairs
    * result while the join cost stays bucket-local — this is what
    * replaces [[jaccardPairs]]'s shingle self-join at 100 TB.
    * Output: (d1, d2, shared, jaccard) with jaccard ≥ threshold.
    *
    * `shinglePersist` controls whether the exploded shingle table is
    * persisted across its four consumers (signatures, counts, both
    * sides of the verify join). Default NONE: at 100 TB the shingle
    * table dwarfs executor storage and recomputation is a cheap
    * scan-side projection Spark pipelines freely. At bench/cluster
    * scales where it fits, MEMORY_AND_DISK avoids a 4× recompute of
    * the explode+distinct (measured 14.9 s → ~3 s at sf0.1). */
  def minhashVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numPerm: Int, bands: Int, threshold: Double,
      shinglePersist: StorageLevel = StorageLevel.NONE): DataFrame = {
    val sh0 = shinglePairs(docs, idCol, textCol, shingleK)
    val sh = if (shinglePersist == StorageLevel.NONE) sh0 else sh0.persist(shinglePersist)
    val cand = minhashCandidates(signaturesFromShingles(sh, numPerm), bands)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    // Exact verify restricted to candidates: fan each candidate pair out
    // to d1's shingles, probe d2's shingle set — O(|cand| · shingles),
    // not O(n²).
    val shared = cand
      .join(sh.select(col("doc_id").as("d1"), col("s")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("s")), Seq("d2", "s"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("shared"))
    shared
      .join(counts.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_shingles", "n1"), "d1")
      .join(counts.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_shingles", "n2"), "d2")
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("n1") + col("n2") - col("shared")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("shared"), col("jaccard"))
  }

  /** CROSS-corpus [[minhashVerifiedPairs]]: near-dup pairs BETWEEN two
    * corpora (never within one) — the verify stage of the cross-run
    * near-dup flow (q94): candidates are (left, right) docs sharing an
    * LSH band bucket, then exact n-gram Jaccard verifies only those.
    * Same 64/16 boundary-miss argument as the single-corpus form, so
    * the output equals the exact cross-corpus all-pairs result while
    * the join stays bucket-local. Output: (d1 ∈ left, d2 ∈ right,
    * shared, jaccard ≥ threshold). */
  def crossMinhashVerifiedPairs(left: DataFrame, right: DataFrame,
      idCol: String, textCol: String, shingleK: Int, numPerm: Int,
      bands: Int, threshold: Double,
      shinglePersist: StorageLevel = StorageLevel.NONE): DataFrame = {
    def prep(docs: DataFrame): (DataFrame, DataFrame) = {
      val sh0 = shinglePairs(docs, idCol, textCol, shingleK)
      val sh = if (shinglePersist == StorageLevel.NONE) sh0
        else sh0.persist(shinglePersist)
      (sh, bandBuckets(signaturesFromShingles(sh, numPerm), bands))
    }
    val (sh1, k1) = prep(left)
    val (sh2, k2) = prep(right)
    val cand = k1.select(col("doc_id").as("d1"), col("band"), col("bucket"))
      .join(k2.select(col("doc_id").as("d2"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select("d1", "d2").distinct()
    val c1 = sh1.groupBy("doc_id").agg(count(lit(1)).as("n1"))
      .withColumnRenamed("doc_id", "d1")
    val c2 = sh2.groupBy("doc_id").agg(count(lit(1)).as("n2"))
      .withColumnRenamed("doc_id", "d2")
    val shared = cand
      .join(sh1.select(col("doc_id").as("d1"), col("s")), "d1")
      .join(sh2.select(col("doc_id").as("d2"), col("s")), Seq("d2", "s"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("shared"))
    shared.join(c1, "d1").join(c2, "d2")
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("n1") + col("n2") - col("shared")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("shared"), col("jaccard"))
  }

  /** Blocked fuzzy-match pairs (entity-resolution dedup for short
    * strings — titles, names, URLs): all pairs within Levenshtein
    * distance ≤ maxDist, with candidates restricted to rows sharing
    * the lowercase `blockPrefix`-char block AND |len(a)−len(b)| ≤
    * maxDist (a length gap > maxDist already implies distance >
    * maxDist, so that filter loses nothing). The scale story is the
    * blocking: the self-join is block-partitioned — candidates are
    * block-local, never all-pairs — and the O(len²) edit-distance
    * verify runs only on candidates. The recall trade-off is explicit
    * and deterministic: a pair whose edits fall inside the block
    * prefix is missed — the standard prefix-blocking contract, so an
    * oracle reproduces the result exactly by mirroring the blocking.
    * Output: (d1, d2, dist), d1 < d2. */
  def fuzzyPairs(docs: DataFrame, idCol: String, strCol: String,
      maxDist: Int, blockPrefix: Int): DataFrame = {
    require(maxDist >= 0 && blockPrefix > 0, "need maxDist >= 0, blockPrefix > 0")
    val base = docs.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("block", lower(substring(col("__s"), 1, blockPrefix)))
      .withColumn("__l", length(col("__s")))
    val a = base.select(col("__id").as("d1"), col("__s").as("s1"),
      col("block"), col("__l").as("l1"))
    val b = base.select(col("__id").as("d2"), col("__s").as("s2"),
      col("block"), col("__l").as("l2"))
    a.join(b, Seq("block"))
      .filter(col("d1") < col("d2") &&
        abs(col("l1") - col("l2")) <= lit(maxDist))
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= lit(maxDist))
      .select(col("d1"), col("d2"), col("dist"))
  }

  /** 64-bit SimHash per doc: bit j is the sign of Σ over tokens of
    * (bit j of xxhash64(token) ? +1 : −1). A pure per-row map via the
    * native [[graft.functions.SimHash64]] expression — no explode, no
    * shuffle; at 100 TB the signature computes inside the scan's
    * projection. [[simhashAgg]] is the built-in-only formulation kept
    * for the equivalence spec. */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      md5Based: Boolean = false): DataFrame = {
    val sig = if (md5Based) graft.functions.SimHash64.md5(col(textCol))
    else graft.functions.SimHash64(col(textCol))
    docs.select(col(idCol).as("doc_id"), sig.as("simhash"))
  }

  /** Built-in-only SimHash: explode(tokens) → 64 conditional sums.
    * Semantically identical to [[simhash]] (PipelineSpec asserts it);
    * kept as the oracle-expressible reference formulation. With
    * `md5Based` the per-token bit source is bit (j mod 4) of hex digit
    * 16 − ⌊j/4⌋ of md5(token) — the identical arithmetic DuckDB runs
    * in q21's oracle SQL. */
  def simhashAgg(docs: DataFrame, idCol: String, textCol: String,
      md5Based: Boolean = false): DataFrame = {
    val tok0 = docs.select(col(idCol).as("doc_id"),
      explode(words(col(textCol))).as("w"))
    val tok =
      if (md5Based) tok0.withColumn("h", md5(col("w")))
      else tok0.withColumn("h", xxhash64(col("w")))
    def bit(j: Int): Column =
      if (md5Based)
        shiftright(conv(substring(col("h"), 16 - j / 4, 1), 16, 10).cast("int"),
          j % 4).bitwiseAND(1)
      else shiftright(col("h"), j).bitwiseAND(1)
    val bitSums = (0 until 64).map { j =>
      sum(when(bit(j) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    tok.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
        ).reduce((a, b) => a.bitwiseXOR(b)).as("simhash"))
  }

  /** Duplicate CLUSTERS from near-dup pairs: connected components via
    * iterative min-label propagation, labeling every member with the
    * smallest doc id reachable through the pair graph. Near-dup pairs
    * are transitive in intent (A~B, B~C ⇒ one cluster), so production
    * dedup keeps ONE representative per component, not per pair.
    *
    * Scale shape: each round is one hash-partitioned join + partial
    * min aggregation over the edge list; the label table is
    * `localCheckpoint`ed per round (same lesson as Ivf.train — an
    * iterative var-DataFrame re-chains the whole history otherwise).
    * Rounds needed = component diameter; verified near-dup components
    * are clique-dense, so convergence is 2-3 rounds in practice, and
    * the loop exits on a fixpoint count.
    *
    * Output: (doc_id, cluster_rep) for every doc that appears in a
    * pair (singletons are trivially their own cluster — left out to
    * keep the output proportional to the duplicate mass). */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    // Materialize the edge list ONCE: it is consumed every round, and
    // an unmaterialized lineage would re-run the whole upstream pair
    // pipeline (LSH + verify) per round. |edges| = 2·|pairs| —
    // proportional to the duplicate mass, small even at 100 TB.
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .unionByName(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .localCheckpoint()
    // Labels initialize to least(id, min neighbor) — EXACTLY the state
    // one propagation round produces from the identity init, computed
    // as a single aggregation over the symmetrized edge list (the same
    // one shuffle the old `distinct` init paid) instead of a full
    // join + checkpoint + count round. Every converged result is
    // unchanged; the loop just starts one round further along.
    var labels = edges.groupBy(col("a"))
      .agg(min(col("b")).as("__nb"))
      .select(col("a").as("id"), least(col("a"), col("__nb")).as("label"))
      .localCheckpoint()
    // The per-round checkpoints live in block storage OUTSIDE the
    // CacheManager (clearCache never frees them), so each superseded
    // round's blocks are dropped eagerly once the next round has
    // materialized — otherwise a long-lived session accumulates one
    // label table per round per invocation (measured: this plus sibling
    // leaks pressured the bench JVM's storage pool enough to evict the
    // q43/q44 shingle cache and triple q44's wall time).
    var prevRound: DataFrame = null
    var it = 0
    var changed = 1L
    while (changed > 0 && it < maxIters) {
      // candidate label per node: min over neighbors' current labels
      // (partial agg runs map-side; the shuffle carries one row/node)
      val cand = edges.join(labels, edges("a") === labels("id"))
        .groupBy(col("b").as("id")).agg(min(col("label")).as("nl"))
      val merged = labels.join(cand, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("new_label"))
        .localCheckpoint() // eager: materialized before the old round is freed
      changed = merged.filter(col("new_label") < col("label")).count()
      if (prevRound != null) CheckpointBridge.freeCheckpoint(prevRound)
      prevRound = labels
      labels = merged.select(col("id"), col("new_label").as("label"))
      it += 1
    }
    // the returned plan reads only the final round's checkpoint — the
    // edge list and the second-to-last round are no longer reachable
    if (prevRound != null) CheckpointBridge.freeCheckpoint(prevRound)
    CheckpointBridge.freeCheckpoint(edges)
    // A component with diameter > maxIters would exit here with labels
    // still moving — unconverged clusters downstream would silently
    // keep several representatives for one true cluster. Surface it.
    if (changed > 0) {
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"duplicateClusters: label propagation did not converge after " +
          s"$maxIters iterations ($changed labels still changing); " +
          s"cluster labels may split long chains — raise maxIters")
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_rep"))
  }

  /** Canonical-document selection: the step after
    * [[duplicateClusters]] in a production dedup — keep ONE document
    * per cluster, chosen by a quality preference (here: max prefCol,
    * ties to the larger id). A bounded aggregation, NOT a window: the
    * per-cluster argmax rides in `max(struct(pref, id))`, so map tasks
    * reduce each cluster to one candidate before the shuffle and the
    * exchange carries O(clusters) rows — no per-cluster sort at any
    * scale. Output: (cluster_rep, n_members, canonical_id,
    * canonical_pref, sum_ids). */
  def canonicalPerCluster(clusters: DataFrame, docs: DataFrame,
      idCol: String, prefCol: String): DataFrame =
    clusters
      .join(docs.select(col(idCol).as("doc_id"), col(prefCol).as("pref")), "doc_id")
      .groupBy(col("cluster_rep"))
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("pref"), col("doc_id"))).as("best"),
        sum(col("doc_id")).cast("bigint").as("sum_ids"))
      .select(col("cluster_rep"), col("n_members"),
        col("best.doc_id").as("canonical_id"),
        col("best.pref").cast("bigint").as("canonical_pref"),
        col("sum_ids"))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: band each signature into 4×16-bit
    * chunks; docs sharing any chunk are candidates (any pair with
    * hamming ≤ 3 shares at least one chunk by pigeonhole); verify with
    * the exact hamming distance. */
  def simhashCandidates(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")
    val l = banded.select(col("doc_id").as("d1"), col("simhash").as("s1"),
      col("band").as("band1"), col("chunk").as("chunk1"))
    val r = banded.select(col("doc_id").as("d2"), col("simhash").as("s2"),
      col("band").as("band2"), col("chunk").as("chunk2"))
    l.join(r, col("band1") === col("band2") && col("chunk1") === col("chunk2") &&
        col("d1") < col("d2"))
      .select(col("d1"), col("d2"), hamming(col("s1"), col("s2")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Corpus-wide repeated-chunk removal (line-level dedup): drop every
    * chunk that appears in more than `maxDocs` distinct documents —
    * the boilerplate/navigation-text scrub that runs line-by-line over
    * web corpora — then reassemble each document from its surviving
    * chunks in original order. "Lines" here are non-overlapping
    * `chunkTokens`-token windows (the fixture corpus has no newlines);
    * with newline-delimited text, split on newlines upstream and pass
    * chunkTokens large enough to keep one line per chunk.
    *
    * Returns (idCol, n_chunks, n_kept_chunks, cleaned) — one row per
    * input document; fully-boilerplate docs come back with zero kept
    * chunks and empty text rather than vanishing.
    *
    * Scale shape: chunking is a scan-side generator (`posexplode` of a
    * per-row `transform`); the duplicate-count shuffle carries
    * (chunk, id) pairs — at 100 TB swap the join key to
    * `xxhash64(chunk)` so the shuffle moves 8-byte keys, and note the
    * repeated-chunk set (the boilerplate mass) is orders of magnitude
    * smaller than the corpus, so the anti-join's right side is
    * broadcast-able. Reassembly is an `array_sort(collect_list)` — the
    * per-doc chunk list is bounded by document length, never by corpus
    * size, and no window function is involved. */
  /** Per-row chunk array: non-overlapping `chunkTokens`-token windows
    * of the text — the shared chunking of [[dropRepeatedChunks]] /
    * [[repeatedChunks]] / [[scrubChunks]], so the batch scrub, the
    * boilerplate learner and the streaming scrub can never disagree on
    * chunk boundaries. */
  private def chunkArray(textCol: String, chunkTokens: Int): Column = {
    val w = Chunking.tokens(col(textCol))
    when(size(w) > 0,
      transform(sequence(lit(1), size(w), lit(chunkTokens)),
        i => concat_ws(" ", slice(w, i, lit(chunkTokens)))))
      .otherwise(array().cast("array<string>"))
  }

  /** The boilerplate set: chunks appearing in more than `maxDocs`
    * distinct documents. Orders of magnitude smaller than the corpus
    * (it is the repeated mass only), so the output broadcasts — this
    * is what [[scrubChunks]] and the streaming ingest consume. */
  def repeatedChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 10, maxDocs: Int = 1): DataFrame = {
    require(chunkTokens > 0 && maxDocs >= 1, "need chunkTokens > 0, maxDocs >= 1")
    docs.select(col(idCol), explode(chunkArray(textCol, chunkTokens)).as("chunk"))
      .groupBy(col("chunk"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > maxDocs)
      .select(col("chunk"))
  }

  /** Streaming-safe boilerplate scrub: rewrites `textCol` with every
    * chunk in `boilerplate` removed. The boilerplate side collapses to
    * ONE broadcast row holding the chunk array (stream-static cross
    * join — supported in append mode), and the scrub itself is a pure
    * per-row projection: chunk, filter by membership, rejoin. No
    * explode survives the plan, no aggregation, no state store — this
    * is the shape that composes with the stateful dedup downstream in
    * [[graft.streaming.StreamingOps.corpusIngestStream]].
    *
    * Batch↔stream contract (StreamingSpec pins it): with
    * `boilerplate = repeatedChunks(docs, ...)` the rewritten text
    * equals [[dropRepeatedChunks]]'s `cleaned` on the same rows.
    *
    * Scale note: membership is `array_contains` over the broadcast
    * array — linear per chunk, fine up to ~10⁵ boilerplate chunks; a
    * larger learned set should pre-sort and binary-search via a custom
    * expression, or Bloom-prefilter (q46's machinery) before an exact
    * per-batch verify. */
  def scrubChunks(docs: DataFrame, textCol: String, chunkTokens: Int,
      boilerplate: DataFrame): DataFrame = {
    require(chunkTokens > 0, "need chunkTokens > 0")
    val bp = broadcast(boilerplate.agg(
      coalesce(collect_list(col("chunk")), array().cast("array<string>")).as("__bp")))
    val keepOrder = docs.columns.toSeq
    docs.crossJoin(bp)
      .withColumn(textCol,
        array_join(filter(chunkArray(textCol, chunkTokens),
          c => !array_contains(col("__bp"), c)), " "))
      .select(keepOrder.map(col): _*)
  }

  def dropRepeatedChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 10, maxDocs: Int = 1,
      chunkPersist: StorageLevel = StorageLevel.NONE): DataFrame = {
    require(chunkTokens > 0 && maxDocs >= 1, "need chunkTokens > 0, maxDocs >= 1")
    val chunked0 = docs
      .select(col(idCol),
        posexplode_outer(chunkArray(textCol, chunkTokens)).as(Seq("pos", "chunk")))
    // three consumers below (duplicate counts, anti-join left side,
    // per-doc totals) — persist at bench scale so the scan+explode runs
    // once; NONE (recompute) for the 100 TB path, same contract as
    // jaccardPairs/minhashVerifiedPairs above. Caller owns unpersist.
    val chunked =
      if (chunkPersist == StorageLevel.NONE) chunked0 else chunked0.persist(chunkPersist)
    // the duplicate COUNT and the anti-join key only need chunk
    // EQUALITY, never chunk text — key them on xxhash64(chunk) so the
    // count's two exchanges and the broadcast dup set carry 8 bytes
    // per chunk instead of k-token strings (equal text ⇔ equal hash
    // modulo 2⁻⁶⁴ collisions — the q56/q69/q95 contract); the kept
    // side keeps the string payload the rebuild needs
    val chunkedH = chunked.filter(col("chunk").isNotNull)
      .withColumn("__h", xxhash64(col("chunk")))
    val repeated = chunkedH
      .groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > maxDocs)
      .select(col("__h"))
    val kept = chunkedH
      .join(repeated, Seq("__h"), "left_anti")
    val totals = chunked.groupBy(col(idCol))
      .agg(count(col("chunk")).as("n_chunks"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept_chunks"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("chunk")))),
          s => s.getField("chunk"))).as("cleaned"))
    totals.join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept_chunks"), lit(0L)).as("n_kept_chunks"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** The duplicated-span set: stride-1 `windowTokens`-token window
    * texts occurring in ≥ `minDocs` distinct documents — the learned
    * state [[scrubSpans]] broadcasts (the span-granularity sibling of
    * [[repeatedChunks]]). Duplicated mass only, orders of magnitude
    * under the corpus. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 15, minDocs: Int = 2): DataFrame = {
    require(windowTokens > 0 && minDocs >= 2, "need windowTokens > 0, minDocs >= 2")
    val k = windowTokens
    docs.select(col(idCol), Chunking.tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= k)
      .select(col(idCol), explode(
        transform(sequence(lit(1), size(col("__w")) - (k - 1)),
          i => concat_ws(" ", slice(col("__w"), i, lit(k))))).as("gram"))
      .groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("gram"))
  }

  /** Streaming-safe duplicated-span scrub: rewrites `textCol` with
    * every token position covered by a learned duplicated span
    * removed. The span set collapses to ONE broadcast row
    * (stream-static cross join, append-mode-safe) and the scrub is a
    * pure per-row projection: regenerate this row's windows, find the
    * starts whose gram is in the set, drop the covered positions —
    * identical coverage semantics to [[dropDuplicatedSpans]] on the
    * same rows (StreamingSpec pins scrub == batch `cleaned`), so the
    * live ingest path can apply the batch-learned span state without
    * aggregations or a state store.
    *
    * Scale note: per-row cost is O(tokens · matched-starts)
    * interpreted HOF work — fine at micro-batch rates; the batch-side
    * learner stays the heavy lifter. */
  def scrubSpans(docs: DataFrame, textCol: String, windowTokens: Int,
      spans: DataFrame): DataFrame = {
    require(windowTokens > 0, "need windowTokens > 0")
    val k = windowTokens
    val bp = broadcast(spans.agg(
      coalesce(collect_list(col("gram")), array().cast("array<string>")).as("__bp")))
    val keepOrder = docs.columns.toSeq
    docs.crossJoin(bp)
      .withColumn("__w", Chunking.tokens(col(textCol)))
      .withColumn("__starts",
        when(size(col("__w")) >= k,
          filter(sequence(lit(1), size(col("__w")) - (k - 1)),
            i => array_contains(col("__bp"),
              concat_ws(" ", slice(col("__w"), i, lit(k))))))
          .otherwise(array().cast("array<int>")))
      .withColumn(textCol,
        // empty guard: Spark's sequence(1, 0) counts DOWN
        when(size(col("__w")) === 0, lit(""))
          .otherwise(array_join(
            filter(transform(sequence(lit(1), size(col("__w"))),
              p => when(exists(col("__starts"),
                s => p >= s && p <= s + (k - 1)), lit(null))
                .otherwise(element_at(col("__w"), p))),
              t => t.isNotNull), " ")))
      .select(keepOrder.map(col): _*)
  }

  /** Exact duplicated-SUBSTRING removal at token granularity — the
    * "dedup the repeated spans, not just the documents" pass of
    * training-data pipelines: every sliding `windowTokens`-token
    * window (stride 1) whose text occurs in ≥ `minDocs` distinct
    * documents marks ALL its token positions for removal, in every
    * carrier; each document is then rebuilt from its surviving tokens.
    * Compared to [[dropRepeatedChunks]] (non-overlapping chunks,
    * boundary-aligned), the stride-1 windows catch duplicated runs at
    * ANY offset — the exact-substring semantics, with the span
    * boundary resolved to tokens.
    *
    * Returns (idCol, n_tokens, n_kept_tokens, cleaned), one row per
    * input document; docs shorter than `windowTokens` are never
    * dropped from (no window fits).
    *
    * Scale shape: window generation is a scan-side generator — the
    * native [[graft.functions.TokenWindowHashes]], so the duplicate
    * count shuffles (window-hash, id) 8-byte pairs, never k-token
    * window STRINGS (identical output modulo 2⁻⁶⁵ chained-XXH64
    * collisions; the pre-hash HOF formulation also evaluated its
    * window lambda interpreted per window). Coverage explodes each DUP
    * window into `windowTokens` (id, pos) rows — duplicated mass only,
    * orders of magnitude under the corpus; the production variant
    * would merge overlapping spans per doc before exploding.
    * Reassembly is the same window-free `array_sort(collect_list)` as
    * [[dropRepeatedChunks]]. */
  def dropDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 15, minDocs: Int = 2,
      tokenPersist: StorageLevel = StorageLevel.NONE): DataFrame = {
    require(windowTokens > 0 && minDocs >= 2, "need windowTokens > 0, minDocs >= 2")
    val toks0 = docs.select(col(idCol), Chunking.tokens(col(textCol)).as("__w"))
    // two consumers (token explode, totals) — persist knob with the
    // same caller-owns-unpersist contract as dropRepeatedChunks
    val toks =
      if (tokenPersist == StorageLevel.NONE) toks0 else toks0.persist(tokenPersist)
    val k = windowTokens
    // stride-1 windows: 1-based start positions 1 .. n-k+1, windows as
    // 8-byte hashes straight off the scan (docs shorter than k tokens
    // yield an empty array — no explicit length filter needed)
    val wins = docs.select(col(idCol), posexplode(
        graft.functions.TokenWindowHashes(col(textCol), k)).as(Seq("p0", "gram")))
      .select(col(idCol), (col("p0") + 1).as("start"), col("gram"))
    val dup = wins.groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("gram"))
    val covered = wins.join(dup, Seq("gram"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("start"), col("start") + (k - 1))).as("pos"))
      .distinct()
    val tokens = toks
      .select(col(idCol), posexplode(col("__w")).as(Seq("p0", "token")))
      .select(col(idCol), (col("p0") + 1).as("pos"), col("token"))
    val kept = tokens.join(covered, Seq(idCol, "pos"), "left_anti")
    val totals = toks.select(col(idCol), size(col("__w")).cast("bigint").as("n_tokens"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("token")))),
          s => s.getField("token"))).as("cleaned"))
    totals.join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept_tokens"), lit(0L)).as("n_kept_tokens"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }
}
