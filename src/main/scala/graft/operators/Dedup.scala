package graft.operators

import graft.functions.ShingleFunctions._
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators over the `documents` table — the first stage
 * of any LLM training-data pipeline, each written as a pure DataFrame
 * transform with an explicit 100 TB scale path:
 *
 *  - exact:       hash-groupBy on a content digest (one shuffle of
 *                 (digest, id) pairs, never the text itself)
 *  - minhash+LSH: shingle → minhash signature (row-local) → band →
 *                 bucket self-join (shuffle on band hash only) →
 *                 exact-Jaccard rerank of candidates
 *  - simhash:     64-bit signature (native Expression), bucket by
 *                 signature bands for Hamming-near candidates
 *  - n-gram Jaccard: exact pairwise verify (the rerank kernel; also
 *                 exposed brute-force as the small-SF oracle baseline)
 *  - embedding near-dup: cosine over the embeddings table (see
 *                 Similarity for the ANN scale path)
 *  - semantic:    cluster-bucketed keeper search over the persisted
 *                 IVF quantizer cells (SemDeDup) — the scale path for
 *                 the embedding all-pairs baseline
 */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Reshard a CPU-bound scan across all cores ONLY when it arrives
   * under-partitioned (locally the testdata is one row group → one
   * partition). At 100 TB the scan already has thousands of partitions
   * and an unconditional repartition would full-shuffle the corpus text
   * for nothing — so guard on the actual partition count. */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** (doc_id, sh): distinct word-3-shingle sets. Tokens are materialized
   * as a column BEFORE shingling so the transform lambda slices a bound
   * attribute — inlining the tokenizer into the lambda re-runs the regex
   * split per shingle (measured ~50× slower at sf0.1). Deliberately NO
   * size(sh)>0 filter here: predicate pushdown would clone the whole
   * shingling expression into a Filter BELOW the spread repartition —
   * the CPU-bound stage would then run twice, once serially on the
   * pre-spread scan (observed in the r07 plan audit). Consumers exclude
   * empty sets structurally (explode, or an n_union > 0 pair guard). */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    // Tokenize/shingle is the CPU-bound stage (higher-order functions
    // evaluate interpreted, ~1ms/doc): spread it across all cores when
    // the scan arrives under-partitioned.
    spread(docs(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), array_distinct(shingles(col("toks"), 3)).as("sh"))

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups: one row per distinct content digest with the
   * canonical (min) doc_id and the duplicate count. At scale: shuffle
   * carries (16-byte digest, id) — O(rows) tiny records, then the text
   * itself never moves. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(md5(col("text")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Keep-first exact dedup: the surviving rows (doc_id = min per
   * digest). Window over the digest — same single shuffle. */
  def dedupExactKeepFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    docs(spark, dir)
      .withColumn("keep_id", min("doc_id").over(w))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("n_chars"))
  }

  // --------------------------------------------------------- incremental

  /** Bloom sizing for the incremental path: 2¹⁷ bits / 7 hashes ≈ 10
   * bits per element at the demo history size (~0.8% FP). The knob a
   * deployment turns is bits-per-element; the words array itself is
   * what ModelCache persists. */
  val BloomBits = 1 << 17
  val BloomHashes = 7

  /** History fingerprint bloom, fitted once per corpus snapshot and
   * persisted ([[graft.sources.ModelCache]], the quantizer pattern):
   * the summary a 100 TB deployment ships to every new batch instead
   * of re-joining the full history. Collected to one words array —
   * 16 KB here; histories past ~10⁹ fingerprints take the decon
   * automaton's hash-shard recipe (K blooms by fingerprint hash). */
  private def historyBloom(spark: SparkSession, dir: String,
      hist: DataFrame): Array[Long] = {
    import spark.implicits._
    val words = graft.sources.ModelCache.loadOrFit(spark,
      s"$dir/documents.parquet", s"bloom-prefix64-m$BloomBits-k$BloomHashes-v1",
      sys.env.getOrElse("GRAFT_BLOOM_CACHE", "/tmp/graft-bloom-cache"),
      "graft-bloom") {
      val agg = new graft.functions.BloomAgg(BloomBits, BloomHashes)
      // typed select → Dataset[BloomBuf], whose product encoder flattens
      // to a single `words` array column; posexplode pairs each word
      // with its index so the cached table round-trips order-stably
      hist.select(xxhash64(col("fp")).as("h")).as[Long]
        .select(agg.toColumn)
        .select(posexplode(col("words")).as(Seq("idx", "word")))
    }
    graft.sources.ModelCache.memo(
      FixtureCache.dirStamp(s"$dir/documents.parquet") + "-bloomWords") {
      words.orderBy("idx").collect().map(_.getLong(1))
    }
  }

  /**
   * Incremental dedup — the arriving-batch-vs-historical-corpus mode
   * (the one dedup shape [[dedupExact]]'s whole-corpus groupBy does
   * not cover, and the standard production form: CCNet / RefinedWeb
   * dedup new crawl snapshots against everything already kept). The
   * fingerprint is md5 of the first 64 chars — the cheap prefix key
   * crawl pipelines use for boilerplate-headed near-dups (the corpus
   * has no full-text exact dups across the split; prefix collisions
   * exist, so the positive path is genuinely exercised).
   *
   * Shape: history (doc_id % 4 ≠ 0) is summarized by a persisted
   * 16 KB bloom ([[historyBloom]]); the batch (doc_id % 4 = 0) groups
   * by fingerprint ONCE (the only batch-sized shuffle), probes the
   * bloom row-locally, and only the positives — true dups + ~0.8% FP
   * — reach the exact confirm: history scanned once against the
   * BROADCAST candidate set, then a broadcast anti-join of candidates
   * against the confirmed-present set. The result is EXACTLY the
   * anti-join of batch groups vs history (the bloom is one-sided:
   * negatives are proof of novelty), so the oracle is plain SQL and
   * the FP rate can only affect the confirm-join size, never the
   * answer. At 100 TB: no history-vs-batch shuffle exists anywhere —
   * history moves zero bytes on a bloom-cache HIT beyond the one
   * membership scan, whose probe set is candidate-sized.
   */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), md5(substring(col("text"), 1, 64)).as("fp"))
    val hist = d.filter(pmod(col("doc_id"), lit(4)) =!= 0).select("fp")
    val batch = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    val words = historyBloom(spark, dir, hist)
    // bloom-positive batch fingerprints — the ONLY ones that can be in
    // history (no false negatives), so `present` is complete and one
    // broadcast anti-join over all groups finishes the job (no
    // union-of-branches: that shape re-scanned the batch per branch)
    val candFps = batch
      .filter(graft.functions.BloomFunctions
        .bloom_might_contain(xxhash64(col("fp")), words, BloomHashes))
      .select("fp").distinct()
    val present = hist.join(broadcast(candFps), Seq("fp"))
      .select("fp").distinct()
    batch.groupBy("fp")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .join(broadcast(present), Seq("fp"), "left_anti")
  }

  // ------------------------------------------------------------- jaccard

  /** Exact n-gram (word 3-shingle) Jaccard near-dup pairs, brute-force —
   * the rerank kernel, oracle-checked at small SF. Jaccard is integer
   * arithmetic (|∩|/|∪|) so engines agree exactly. At 100 TB this runs
   * only WITHIN LSH buckets (see dedupMinhashLsh), never all-pairs. */
  def dedupJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = shingled(spark, dir)
    val a = d.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = d.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("n_union",
        size(col("sh_a")) + size(col("sh_b")) - col("n_inter"))
      // jaccard >= 0.5; n_union > 0 excludes empty-shingle docs (the
      // structural replacement for the removed pre-filter in `shingled`)
      .filter(col("n_inter") * 2 >= col("n_union") && col("n_union") > 0)
      .select(col("id_a"), col("id_b"),
        col("n_inter").cast("bigint").as("n_inter"),
        col("n_union").cast("bigint").as("n_union"),
        round(col("n_inter").cast("double") / col("n_union"), 6).as("jaccard"))
  }

  // --------------------------------------------------------- containment

  /** Posting-list df cap for the containment join: 4 binds at sf0.01
   * (max df is 7 there — ~1% of shingles are dropped as
   * "stop-shingles", so the cap path is genuinely exercised, and the
   * planted near-dup pairs still surface). A deployment caps in the
   * hundreds; the cap is what BOUNDS the pair expansion — each kept
   * shingle emits ≤ cap² ordered pairs — making the join linear in
   * true co-occurrence instead of corpus². */
  val ContainmentDfCap = 4

  /**
   * Asymmetric containment near-dup pairs — C(A→B) =
   * |sh(A) ∩ sh(B)| / |sh(A)| over df-capped distinct shingles —
   * the sub-document-duplication detector Jaccard misses: a short doc
   * quoted wholesale inside a long one scores C ≈ 1 while Jaccard ≈
   * |A|/|B| ≈ 0. Both sides of the ratio live in the capped
   * ("informative") shingle space, so C = 1 ⇔ every informative
   * shingle of A appears in B; dropping stop-shingles before pairing
   * is the standard production trade (the cap is mirrored exactly in
   * the oracle, so it is semantics, not approximation).
   *
   * Scale shape vs [[dedupJaccardPairs]] (the documented O(n²) rerank
   * baseline): this is the scalable form — an inverted-index self-join
   * whose posting lists are df-capped, so the pair expansion is
   * Σ_shingle df² ≤ cap · Σ df = cap · corpus-postings, LINEAR in the
   * corpus with a cap-bounded constant, and every exchange carries
   * ids/hashes only. The df filter runs as an aggregate + co-partitioned
   * join (NOT a collect_list-then-filter, which would buffer an
   * unbounded stop-shingle posting in one aggregation buffer before
   * discarding it). Pairs explode from grouped lists bounded at ≤ cap
   * elements, ≤ cap² structs per row.
   */
  def containmentPairs(postings: DataFrame, cap: Int): DataFrame = {
    val dfc = postings.groupBy("s").agg(count(lit(1)).as("df"))
    // co-partitioned on s with the groupBy below — one exchange chain.
    // The grouped posting lists feed BOTH consumers (sizes + pairs);
    // without materialization the whole scan+df+collect subtree runs
    // twice (Spark shares no common subtrees) — localCheckpoint is the
    // q15/tfidf pattern, and the relation is ids/hashes only, capped
    // at ≤ cap elements per row.
    val kept = postings.join(dfc.filter(col("df") <= cap), Seq("s"))
    val posts = kept.groupBy("s")
      .agg(collect_list(col("doc_id")).as("ids"))
      .localCheckpoint()
    val sizes = posts.select(explode(col("ids")).as("id_a"))
      .groupBy("id_a").agg(count(lit(1)).as("n_sh_a"))
    val pairs = posts
      .select(explode(flatten(transform(col("ids"), a =>
        transform(col("ids"), b =>
          struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    pairs.join(sizes, Seq("id_a"))
      .filter(col("n_common") * 2 >= col("n_sh_a"))
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_sh_a"),
        round(col("n_common").cast("double") / col("n_sh_a"), 6)
          .as("containment"))
  }

  /** Wired containment pairs over the persisted
   * [[Curation.shingleHashTable]] — the corpus is shingled ZERO times
   * on a snapshot hit (the decon/pipeline queries' table, reused). */
  def dedupContainmentPairs(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(
      Curation.shingleHashTable(spark, dir).select(col("doc_id"), col("s")),
      ContainmentDfCap)

  // ------------------------------------------------------------- minhash

  val NumHashes = 16
  val NumBands = 4
  val RowsPerBand: Int = NumHashes / NumBands

  /**
   * MinHash+LSH near-dup pairs — the 100 TB path:
   *  1. hashed shingle set per doc, one codegen'd UTF-8 pass
   *     (ShingleHashes — no token/shingle strings materialized);
   *  2. 16-permutation minhash folded into NumBands band buckets inside
   *     the same scan (MinHashBands), posexploded to (band, bucket);
   *  3. self-join per bucket → candidate pairs (shuffle carries only
   *     (band, bucket, id) rows, AQE handles hot buckets);
   *  4. exact Jaccard rerank of candidates over the hashed shingle sets
   *     (64-bit hashes: collision odds ~ |sh|²/2⁶⁴, immaterial).
   * Banding (4 bands × 4 rows) makes P(candidate) ≈ 1-(1-j^4)^4 — steep
   * around j≈0.7, so ≥0.8-similar pairs are found w.h.p. while unrelated
   * pairs rarely collide. The shingle arrays never ride the self-join;
   * candidate pairs are deduped as bare id pairs, then the (few)
   * survivors re-join the shingle sets for rerank — at 100 TB that's the
   * difference between shuffling 3 long columns and shuffling the corpus.
   */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairs(docs(spark, dir))

  /** The MinHash+LSH pipeline over any `(doc_id, text)` frame —
   * exposed so scale smokes / callers with their own corpus reuse the
   * exact wired plan. `materialize = true` checkpoints the signature
   * tables (`d`, `banded`) so each is computed once; `false` lets every
   * consumer recompute the hash kernels from the text scan. The smoke
   * keeps the trade measured per round.
   *
   * Default history: r10 checkpointed both ("hash once"); r11 measured
   * materialization 2.2× ahead at 40× (8.8 vs 19.5 s) and kept it. r22
   * re-measured: the kernels got ~2× faster over r12–r21, and the r11
   * ranking no longer reproduces — five warmed best-of-2 runs at 40×
   * read materialized 9.6–14.6 s vs recompute 8.6–13.3 s (tie within
   * host variance), and at the bench SF an interleaved 5-run A/B reads
   * 0.46 vs 0.36 s for recompute. The default STAYS materialized on
   * first-principles I/O math (guide §1.3): the recompute plan scans
   * the corpus parquet EIGHT times (plan-verified), ~800 TB of source
   * reads at target scale, vs one scan + signature traffic through
   * block storage (~5 signature-sized passes) for the checkpoint form —
   * and both smoke regimes sit in page cache, so the 40× tie cannot
   * arbitrate real I/O. The 0.10 s sf0.1 delta is two small-corpus
   * checkpoint jobs — a local-mode artifact, not a scale signal.
   * Re-measured every `ScaleSmoke dedup` run; revisit only with an
   * out-of-cache measurement. */
  def minhashLshPairs(corpus: DataFrame, materialize: Boolean = true): DataFrame = {
    def mat(df: DataFrame): DataFrame = if (materialize) df.localCheckpoint() else df
    // No size(sh)>0 filter (see `shingled`): posexplode drops empty band
    // arrays itself, and the pushed-down filter would re-run the hash
    // kernel serially below the spread repartition.
    // `d` feeds the banding AND both rerank re-attach joins, `banded`
    // feeds both sides of the bucket self-join, and Spark does not
    // dedupe common subtrees — unmaterialized, the shingle kernel runs
    // four times and the minhash fold twice (8 corpus scans in the
    // physical plan).
    val d = mat(spread(corpus) // CPU-bound hashing scan
      .select(col("doc_id"), shingle_hashes(col("text"), 3).as("sh")))
    val banded = mat(d.select(col("doc_id"),
      posexplode(minhash_bands(col("sh"), NumBands, RowsPerBand)))
      .toDF("doc_id", "band", "bucket"))
    val pairs = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct() // dedupe multi-band hits
    pairs
      .join(d.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("n_union",
        size(col("sh_a")) + size(col("sh_b")) - col("n_inter"))
      // n_union > 0: empty-shingle docs share every band bucket (the
      // minima fold of an empty set is a constant), so the rerank — not
      // a pushdown-prone pre-filter — must exclude their 0/0 pairs
      .filter(col("n_inter") * 2 >= col("n_union") && col("n_union") > 0)
      .select(col("id_a"), col("id_b"),
        round(col("n_inter").cast("double") / col("n_union"), 6).as("jaccard"))
  }

  // ------------------------------------------------------- clustering

  /**
   * Connected components by iterative min-label propagation:
   * label(v) ← min(label(v), min label of neighbors), repeated to
   * fixpoint (≤ graph diameter rounds, convergence detected by an
   * exact label-sum probe; near-dup clusters are shallow so this
   * converges in a few). Each round is ONE distributed join+min
   * aggregate — self-loop edges make the aggregate cover `least(own,
   * min-neighbor)` directly, so the old left-join-back that re-attached
   * untouched vertices (two more exchanges per round) is gone (r22,
   * guide §2.4); lineage truncated per round via localCheckpoint so
   * plans don't nest across iterations.
   *
   * Convergence needs ≤ diameter rounds. Near-dup clusters are shallow
   * (a handful of rounds in practice), but a pathological long-chain
   * graph could exceed `maxIter` — that MUST be an error, not a silent
   * half-propagated labeling (the labels would look plausible and
   * split one true cluster into several).
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val a = col("a"); val b = col("b")
    // edges materialized ONCE (tiny: the near-dup pair list): the
    // symmetrization union consumes it twice, and Spark does not dedupe
    // common subtrees, so an unmaterialized pair pipeline — the whole
    // LSH candidate generation + rerank in dedup_clusters_lsh — would
    // execute once per branch
    val e0 = edges.toDF("a", "b").localCheckpoint()
    // SELF-LOOPS folded into the symmetrized edge set (r22, guide §2.4):
    // with (v, v) present for every vertex, one propagation step is a
    // single join + min-aggregate — `min over (self ∪ neighbors)` IS
    // `least(own, min-neighbor)` — where the old shape needed the
    // aggregate PLUS a left join back onto the label table (two more
    // exchanges per step) to re-attach untouched vertices.
    val sym = e0
      .union(e0.select(b.as("a"), a.as("b")))
      .union(e0.select(a, a.as("b")))
      .union(e0.select(b.as("a"), b))
      .distinct().localCheckpoint(eager = false)
    var labels = sym.select(a.as("id")).distinct()
      .withColumn("label", col("id"))
    def step(lbl: DataFrame): DataFrame =
      sym.join(lbl, sym("b") === lbl("id"))
        .groupBy(a.as("id")).agg(min("label").as("label"))
    // Convergence probe: labels only ever DECREASE, so the label sum
    // (exact decimal — a bigint sum could overflow at 10¹⁰ labels ×
    // 10¹⁰-sized ids) is strictly monotone and stalls exactly at the
    // fixpoint — no extra per-step column or compare-join needed.
    def labelSum(lbl: DataFrame): java.math.BigDecimal = {
      val r = lbl.agg(sum(col("label").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var steps = 0
    // ONE step per checkpoint+probe round. Batching 2-3 steps per round
    // (VERDICT #6's suggestion) was measured and REJECTED (CcAb,
    // in-session: 1-step 0.646s, 2-step 0.752s, 3-step 0.761s vs the
    // old left-join shape's 0.654s): the deeper uncheckpointed plan per
    // round costs more locally than the saved probe action, and at
    // scale a batched round over-steps past convergence by up to
    // stepsPerRound−1 full label-table propagation shuffles — the
    // exact-stop single step never wastes one.
    while (!converged && steps < maxIter) {
      val merged = step(labels).localCheckpoint(eager = false)
      val newSum = labelSum(merged)
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      labels = merged
      steps += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $steps steps " +
          "(label sum still decreasing) — graph diameter exceeds maxIter")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Near-dup clusters over the brute-force exact-Jaccard pair graph —
   * the ORACLE HARNESS configuration only (its pair source is the
   * all-pairs crossJoin baseline): it pins the component step against a
   * DuckDB recursive-CTE closure at small SF. Users call
   * [[dedupClustersLsh]], whose plan has no all-pairs stage. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(
      dedupJaccardPairs(spark, dir).select(col("id_a"), col("id_b")))

  /** Near-dup clustering, the NAMED 100 TB entry point: candidate pairs
   * come from [[dedupMinhashLsh]] (band/bucket equi-joins, ids-only
   * exchanges — no crossJoin anywhere in the plan), then the same
   * min-label-propagation component step. Oracle: the value-level LSH
   * pair oracle wrapped in a recursive-CTE transitive closure. */
  def dedupClustersLsh(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(
      dedupMinhashLsh(spark, dir).select(col("id_a"), col("id_b")))

  // ------------------------------------------------------------- simhash

  /** SimHash near-dup candidates: 64-bit signature (native Expression),
   * bucketed by each of four 16-bit bands — two docs within Hamming
   * distance 3 share at least one exact band (pigeonhole). Deterministic
   * output: candidate pairs + Hamming distance ≤ 3. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    // coalesce makes the kernel input NON-NULLABLE, so the downstream
    // hamming filter's null-rejecting constraint folds to true instead
    // of being inferred as an isnotnull(simhash64(...)) Filter on the
    // scan — which would clone the whole kernel below the spread
    // repartition (same pathology as the shingle size-guards, but
    // Spark-generated; caught in the r07 plan audit). Null text → ""
    // → signature 0, same bucket behavior as an empty token list.
    // localCheckpoint: the banded view below feeds BOTH sides of the
    // bucket self-join — unmaterialized, the simhash kernel would scan
    // the corpus twice. Same trade as the minhash signature table,
    // measured fairly in r11 (tie at 10×, 2.2× win for materialization
    // at 40× — BASELINE.md); the ~0.2s r10 bench delta is the one-time
    // materialization cost at the small bench corpus.
    val d = spread(docs(spark, dir)) // CPU-bound hashing scan
      .select(col("doc_id"),
        simhash64(tokens(coalesce(col("text"), lit("")))).as("sig"))
      .localCheckpoint()
    val banded = d.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast("bigint").as("hamming"))
  }

  // ------------------------------------------- repeated substrings (self)

  /**
   * Corpus-internal repeated-substring self-dedup — the Lee et al. 2022
   * recipe ("Deduplicating Training Data Makes Language Models Better",
   * arXiv:2107.06499): long passages repeated ACROSS the corpus itself
   * (boilerplate headers, licence blocks, templated paragraphs) are cut
   * down to one kept occurrence. A damage mode none of the other dedup
   * operators catch — the duplicated passage hides inside
   * otherwise-distinct documents, so whole-doc digests, MinHash and
   * SimHash all miss it; and a different JOIN SHAPE from the decon
   * matchers, which compare the corpus against a driver-collected
   * benchmark dictionary: here both sides are the corpus, so nothing
   * can be collected or broadcast.
   *
   * The paper's exact tool is a corpus-wide suffix array; the
   * distributed approximation is the aligned-tile scheme the decon
   * matcher established ([[graft.operators.Curation.exactContaminationTiled]]'s
   * derivation): every `tileLen`-char tile of every document (positions
   * 1, 1+L, 1+2L, … — full windows only) is digested SCAN-SIDE, a tile
   * whose digest occurs ≥ 2 times anywhere in the corpus is repeated,
   * and every occurrence after the lexicographic-min (doc_id, pos)
   * keeper is emitted as a span to cut. Aligned tiles trade the suffix
   * array's any-offset guarantee for one-pass scan cost: a repeated
   * passage of length ≥ 2L−1 always contains a full aligned tile, so
   * the detection floor is 2L−1 chars (31 here), with per-span
   * granularity L.
   *
   * Scale shape: ONE corpus scan; the only full-corpus exchanges carry
   * (digest, doc_id, pos) triples — text never shuffles. The digest
   * groupBy partial-aggregates map-side (count + min are algebraic), so
   * even a pathologically hot tile arrives at its reducer as one
   * partial row per map task, and the join-back's skew is AQE's to
   * split. No stage is pairwise in the corpus: cost is O(chars) scan +
   * O(tiles) shuffle however much repetition exists (ScaleSmoke
   * `substrself` pins near-linear growth under replication), and the
   * output alone is repetition-proportional. Digesting with md5 keeps
   * the oracle value-exact: DuckDB folds tiles through the same
   * function, so both engines group identically even under a
   * (vanishingly unlikely) collision.
   */
  /** The `(doc_id, pos, md5-digest)` tile derivation shared by the span
   * finder and the apply rebuild. The length guard is a plain
   * scan-column predicate (pushdown-safe: no kernel below it to clone);
   * explode's child stays a complex expression so
   * InferFiltersFromGenerate leaves the plan alone. */
  private def tilesOf(documents: DataFrame, tileLen: Int): DataFrame =
    spread(documents.filter(length(col("text")) >= tileLen))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(text) - ${tileLen - 1}, $tileLen)," +
          s" s -> struct(CAST(s AS BIGINT) AS pos," +
          s" md5(substring(text, s, $tileLen)) AS h))")).as("t"))
      .select(col("doc_id"), col("t.pos").as("pos"), col("t.h").as("h"))

  /** Persisted tile-hash table for the wired (spark, dir) queries — the
   * [[graft.operators.TextAnalysis]] gramCounts / shingleHashTable
   * pattern applied to tiles: BOTH substr-self consumers (span finder,
   * apply rebuild) read ONE corpus-snapshot-keyed table, so the corpus
   * is tiled once per snapshot and zero times on a cache HIT.
   * Deterministic kernel (positions + md5) → hit and miss are
   * bit-identical; the DuckDB oracles re-derive from raw text. */
  def tileHashTable(spark: SparkSession, dir: String, tileLen: Int = 16): DataFrame =
    graft.sources.ModelCache.loadOrFit(spark, s"$dir/documents.parquet",
      s"tilehashes-L$tileLen-v1",
      sys.env.getOrElse("GRAFT_GRAMS_CACHE", "/tmp/graft-grams-cache"),
      "graft-tiles", singleFile = false) {
      tilesOf(docs(spark, dir).select("doc_id", "text"), tileLen)
    }

  /** The span derivation over an already-materialized tile table.
   *
   * The keeper (lexicographic-min (doc_id, pos)) is computed as two
   * stacked HASH aggregates instead of one `min(struct(doc_id, pos))`:
   * a struct-typed agg buffer is not UnsafeRow-mutable, so the struct
   * min forced SortAggregate — a full md5-string sort on BOTH sides of
   * the exchange with interpreted struct comparisons (measured: the
   * aggregate alone 0.63s over a 90k-row table whose bare scan is
   * 0.14s). Per (h, doc_id) the min pos is a primitive min; per h the
   * keeper doc is `min(doc_id)` and its pos is `min_by(mpos, doc_id)`
   * — tie-free because (h, doc_id) is unique after the first
   * aggregate, and both buffers are plain longs, so every stage stays
   * a codegen'd HashAggregate (guide §2.3/§4: keep the hot path inside
   * codegen). Same rows, bit-for-bit: n_occ = Σ per-doc counts, and
   * (keep_doc_id, keep_pos) = lexicographic min exactly.
   *
   * r22 refinement (ScaleSmoke `r21ab`, measured at 40×): the r21
   * stacked shape let each aggregate plan its own exchange — the tile
   * stats crossed the network TWICE (by (h, doc_id), then by h), and
   * at 40× replication that read 0.68–0.81× the OLD min(struct) form's
   * wall at 1.5× its shuffle bytes. One explicit hash repartition on
   * `h` now feeds BOTH aggregates (HashPartitioning(h) satisfies the
   * (h, doc_id) clustering, and the second aggregate inherits it), so
   * the raw tile triples cross the network once and no stage sorts:
   * wall ties the min(struct) form in both repetition regimes
   * (1.01×/1.00× at 40×, bytes 0.92×/0.99×) with the corpus-wide
   * digest SortAggregate gone — the §2.4 shared-exchange trade q2
   * already rides. */
  private[graft] def spansFromTiles(tiles: DataFrame): DataFrame = {
    val perDoc = tiles.repartition(col("h")).groupBy("h", "doc_id")
      .agg(count(lit(1)).as("c"), min(col("pos")).as("mpos"))
    val repeated = perDoc.groupBy("h")
      .agg(sum(col("c")).as("n_occ"),
        min(col("doc_id")).as("keep_doc_id"),
        min_by(col("mpos"), col("doc_id")).as("keep_pos"))
      .filter(col("n_occ") >= 2)
    tiles.join(repeated, Seq("h"))
      .filter(!(col("doc_id") === col("keep_doc_id") &&
        col("pos") === col("keep_pos")))
      .select(col("doc_id"), col("pos"),
        col("keep_doc_id"), col("keep_pos"),
        col("n_occ"))
  }

  def substrSelfSpans(documents: DataFrame, tileLen: Int = 16): DataFrame =
    // ad-hoc frames (smokes, specs) checkpoint inline: the tile table
    // feeds the aggregate AND the join-back, and unmaterialized the
    // corpus would be scanned and re-tiled twice (common subtrees are
    // not deduped). Digest-only rows — the signature-table trade,
    // measured 2.2× ahead at 40× scale (BASELINE.md r11). The wired
    // queries ride the persisted [[tileHashTable]] instead.
    spansFromTiles(tilesOf(documents, tileLen).localCheckpoint())

  /** Wired self-dedup query: the repeated-tile spans of the documents
   * corpus against itself (within-doc repeats count — a doc repeating
   * its own boilerplate is damage too, exactly as in the paper). */
  def dedupSubstrSelf(spark: SparkSession, dir: String): DataFrame =
    spansFromTiles(tileHashTable(spark, dir))

  /**
   * [[substrSelfSpans]] APPLIED — the cleaned corpus the Lee et al.
   * pipeline actually outputs (spans alone are a report; training reads
   * text with the repeats cut). Every document is rebuilt keeping its
   * unique tiles, its keeper occurrences of repeated tiles, and the
   * sub-tile tail — only the non-keeper repeated spans drop.
   *
   * Scale shape: the span set is damage-proportional; per doc it
   * collapses to one `cuts` position array (a groupBy of the span rows,
   * never the text) that LEFT-joins back to the corpus, and the rebuild
   * itself is a single codegen'd row-local expression — slice positions
   * filtered against `cuts`, concatenated, tail appended. Documents
   * shorter than one tile pass through untouched. The oracle re-derives
   * the whole rebuild in DuckDB list SQL, so the driver hash pins the
   * reconstructed STRINGS byte-for-byte, not just the span bookkeeping.
   */
  def substrSelfApply(documents: DataFrame, tileLen: Int = 16): DataFrame =
    applyFromSpans(documents, substrSelfSpans(documents, tileLen), tileLen)

  /** The rebuild over an already-derived span set (the wired query
   * passes spans off the persisted [[tileHashTable]]). */
  private def applyFromSpans(documents: DataFrame, spans: DataFrame,
      tileLen: Int): DataFrame = {
    val L = tileLen
    val cuts = spans
      .groupBy("doc_id").agg(collect_list(col("pos")).as("cuts"))
    documents.join(cuts, Seq("doc_id"), "left")
      .withColumn("cuts",
        coalesce(col("cuts"), expr("CAST(array() AS ARRAY<BIGINT>)")))
      .select(col("doc_id"),
        size(col("cuts")).cast("bigint").as("n_cut"),
        // cut-free documents (spans are damage-proportional, so at a
        // clean corpus that is nearly all of them) skip the tile
        // re-slice entirely: with `cuts` empty the rebuild below
        // reconstructs `text` byte-for-byte (every aligned tile kept
        // in order + the sub-tile tail), so passing `text` through is
        // identity, not an approximation. The rebuild branch
        // otherwise allocates len/L substrings + an array_join per
        // row — O(len) copies now paid only by documents that carry a
        // cut (guide §1.2 per-task work). At sf0.1 the wall is flat
        // (1.46 → 1.48s, noise: the fixture plants cuts in ~38% of
        // docs and the line is stage-scheduling-bound); the saving is
        // proportional to the clean fraction of corpus bytes.
        when(size(col("cuts")) === 0, col("text"))
          .otherwise(expr(s"""concat(
          CASE WHEN length(text) >= $L THEN
            array_join(transform(filter(sequence(1, length(text) - ${L - 1}, $L),
              p -> NOT array_contains(cuts, CAST(p AS BIGINT))),
              p -> substring(text, p, $L)), '')
          ELSE '' END,
          substring(text, CASE WHEN length(text) >= $L
            THEN (((length(text) - $L) div $L) + 1) * $L + 1
            ELSE 1 END))""")).as("clean_text"))
  }

  /** Wired apply query: the documents corpus with its non-keeper
   * repeated spans cut — spans derived off the SAME persisted tile
   * table as dedup_substr_self (tiled once per corpus snapshot). */
  def dedupSubstrApply(spark: SparkSession, dir: String): DataFrame =
    applyFromSpans(docs(spark, dir).select(col("doc_id"), col("text")),
      spansFromTiles(tileHashTable(spark, dir)), 16)

  // ----------------------------------------------------- embedding cosine

  /** Embedding-cosine near-dup pairs (brute force at small SF; the ANN
   * path lives in Similarity). Cosine in double precision via a
   * sequential left fold — same evaluation order as the oracle. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /**
   * Cluster-bucketed semantic dedup — the 100 TB scale path for
   * [[dedupEmbedding]]'s all-pairs baseline (the SemDeDup recipe,
   * Abbas et al. 2023, arXiv:2303.09540): bucket vectors by their IVF
   * coarse-quantizer cell (`Similarity.loadOrFitCentroids` — fitted
   * once, persisted, shared with sim_ann_ivf) and search duplicate
   * pairs ONLY within a cell. Per-cell work is quadratic in CELL size,
   * not corpus size; the centroid count grows with the corpus so N/C
   * stays bounded, and with the table written partitioned by cid the
   * pairing is partition-local — no exchange carries vectors at all.
   * Cross-cell duplicates are missed by design (the quantizer recall
   * trade, exactly IVF's nprobe=1 regime).
   *
   * Output: every vector having a LOWER-id cell-mate at cosine ≥ 0.4
   * names its keeper — highest cosine, tie → lowest id — i.e. the rows
   * a curation pass would DROP, with their surviving representative.
   */
  def dedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    semanticKeepers(e, Similarity.loadOrFitCentroids(spark, dir, e))
  }

  /** [[dedupSemantic]] with cell assignment through the bucket-pruned
   * [[graft.functions.CentroidIndex]] at `numPlanes = 1`, where the
   * probe set covers both buckets and the indexed argmax is provably
   * exact (see [[Similarity.simAnnIvfPruned]]) — so this row shares
   * dedup_semantic's unrolled-Lloyd DuckDB oracle verbatim and the
   * C ≳ 10⁴ assignment path is driver-verified through BOTH its
   * consumers (ANN probe and SemDeDup keeper search). */
  def dedupSemanticPruned(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    semanticKeepers(e, Similarity.loadOrFitCentroids(spark, dir, e),
      indexPlanes = Some(1))
  }

  /** The cell-bucketed keeper search behind [[dedupSemantic]],
   * parameterized over the quantizer so the scale smoke can grow the
   * centroid count with the corpus (the contract that keeps per-cell
   * pairing bounded). `indexPlanes = Some(p)` assigns through the
   * bucket-pruned [[graft.functions.CentroidIndex]] instead of the flat
   * kernel — the C ≳ 10⁴ path, recall measured in ScaleSmoke
   * `ivfindex`. */
  def semanticKeepers(e: DataFrame, cents: Similarity.Centroids,
      threshold: Double = 0.4, indexPlanes: Option[Int] = None): DataFrame = {
    val lists = indexPlanes match {
      case Some(p) => Similarity.ivfAssignPruned(e, cents, p)
      case None => Similarity.ivfAssign(e, cents)
    }
    val keep = lists.select(col("cid"), col("vec_id").as("keeper_id"),
      col("embedding").as("kv"))
    val dup = lists.select(col("cid"), col("vec_id").as("dup_id"),
      col("embedding").as("dv"))
    val w = Window.partitionBy("dup_id")
      .orderBy(col("cos").desc, col("keeper_id"))
    keep.join(dup, Seq("cid"))
      .filter(col("keeper_id") < col("dup_id"))
      .withColumn("cos", Similarity.cosine(col("kv"), col("dv")))
      .filter(col("cos") >= threshold)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("dup_id"), col("keeper_id"), round(col("cos"), 6).as("cos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_exact_keep_first" -> dedupExactKeepFirst,
    "dedup_incremental" -> dedupIncremental,
    "dedup_jaccard_pairs" -> dedupJaccardPairs,
    "dedup_containment_pairs" -> dedupContainmentPairs,
    "dedup_clusters" -> dedupClusters,
    "dedup_clusters_lsh" -> dedupClustersLsh,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "dedup_substr_self" -> dedupSubstrSelf,
    "dedup_substr_apply" -> dedupSubstrApply,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_semantic" -> dedupSemantic,
    "dedup_semantic_pruned" -> dedupSemanticPruned)

  private val ShSql =
    """list_distinct(list_transform(
      |  range(0, greatest(len(toks) - 2, 0)),
      |  i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS canonical_id,
         CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY 1""",
    "dedup_exact_keep_first" ->
      """SELECT doc_id, n_chars FROM (
           SELECT doc_id, n_chars,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
           FROM documents) WHERE doc_id = keep_id""",
    "dedup_incremental" ->
      """WITH d AS (SELECT doc_id, md5(substring(text, 1, 64)) AS fp
                    FROM documents),
          h AS (SELECT DISTINCT fp FROM d WHERE doc_id % 4 <> 0)
          SELECT fp, min(doc_id) AS canonical_id,
            CAST(count(*) AS BIGINT) AS n_copies
          FROM d WHERE doc_id % 4 = 0
            AND fp NOT IN (SELECT fp FROM h)
          GROUP BY fp""",
    "dedup_jaccard_pairs" ->
      s"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0) AS toks
          FROM documents),
          s AS (SELECT doc_id, $ShSql AS sh FROM t),
          f AS (SELECT * FROM s WHERE len(sh) > 0)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
            CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_union,
            round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
          FROM f a, f b
          WHERE a.doc_id < b.doc_id
            AND len(list_intersect(a.sh, b.sh)) * 2 >=
                len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))""",
    "dedup_containment_pairs" ->
      graft.operators.HashOracleSql.containmentPairs(ContainmentDfCap),
    "dedup_clusters" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0) AS toks
          FROM documents),
          s AS (SELECT doc_id, $ShSql AS sh FROM t),
          f AS (SELECT * FROM s WHERE len(sh) > 0),
          pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM f a, f b
            WHERE a.doc_id < b.doc_id
              AND len(list_intersect(a.sh, b.sh)) * 2 >=
                  len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
          SELECT a AS doc_id, least(a, min(b)) AS cluster_id
          FROM reach GROUP BY a""",
    // same tile derivation as decon_exact_tiled, self-joined via the
    // shared md5 digest; keeper + occurrence rank restated as windows
    "dedup_substr_self" ->
      """WITH tiles AS (
           SELECT doc_id,
             unnest(list_transform(range(1, len(text) - 14, 16),
               s -> struct_pack(pos := CAST(s AS BIGINT),
                 h := md5(substr(text, CAST(s AS INTEGER), 16))))) AS t
           FROM documents),
         flat AS (SELECT doc_id, t.pos AS pos, t.h AS h FROM tiles),
         w AS (
           SELECT doc_id, pos,
             count(*) OVER (PARTITION BY h) AS n_occ,
             first_value(doc_id) OVER
               (PARTITION BY h ORDER BY doc_id, pos) AS keep_doc_id,
             first_value(pos) OVER
               (PARTITION BY h ORDER BY doc_id, pos) AS keep_pos,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
           FROM flat)
         SELECT doc_id, pos, keep_doc_id, keep_pos,
           CAST(n_occ AS BIGINT) AS n_occ
         FROM w WHERE n_occ >= 2 AND rn > 1""",
    // the cleaned corpus rebuilt in DuckDB list SQL over the same tile
    // CTEs — the hash pins the reconstructed strings byte-for-byte
    "dedup_substr_apply" ->
      """WITH tiles AS (
           SELECT doc_id,
             unnest(list_transform(range(1, len(text) - 14, 16),
               s -> struct_pack(pos := CAST(s AS BIGINT),
                 h := md5(substr(text, CAST(s AS INTEGER), 16))))) AS t
           FROM documents),
         flat AS (SELECT doc_id, t.pos AS pos, t.h AS h FROM tiles),
         w AS (
           SELECT doc_id, pos,
             count(*) OVER (PARTITION BY h) AS n_occ,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
           FROM flat),
         cuts AS (SELECT doc_id, list(pos) AS cuts FROM w
                  WHERE n_occ >= 2 AND rn > 1 GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(coalesce(len(c.cuts), 0) AS BIGINT) AS n_cut,
           (CASE WHEN len(d.text) >= 16 THEN
             -- coalesce: DuckDB's array_to_string over an EMPTY list
             -- (a fully-cut doc) is NULL where Spark's array_join is ''
             coalesce(array_to_string(list_transform(
               list_filter(range(1, len(d.text) - 14, 16),
                 p -> c.cuts IS NULL OR NOT list_contains(c.cuts, p)),
               p -> substr(d.text, CAST(p AS INTEGER), 16)), ''), '')
            ELSE '' END) ||
           substr(d.text, CASE WHEN len(d.text) >= 16
             THEN CAST(((len(d.text) - 16) // 16 + 1) * 16 + 1 AS INTEGER)
             ELSE 1 END) AS clean_text
         FROM documents d LEFT JOIN cuts c USING (doc_id)""",
    "dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
         FROM embeddings a, embeddings b
         WHERE a.vec_id < b.vec_id
           AND list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.5""",
    // full value-level oracles for the 64-bit hash pipelines — the
    // mod-2^64 kernels re-expressed in DuckDB HUGEINT CTEs
    "dedup_minhash_lsh" -> HashOracleSql.minhashLsh,
    "dedup_clusters_lsh" -> HashOracleSql.minhashLshClusters,
    "dedup_simhash" -> HashOracleSql.simhashPairs,
    "dedup_semantic" -> HashOracleSql.semDedup,
    // the pruned path at numPlanes=1 is exact — identical oracle
    "dedup_semantic_pruned" -> HashOracleSql.semDedup)
}
