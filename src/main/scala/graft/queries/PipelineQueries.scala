package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Components, Contamination, Dedup, Multimodal, Packing, Pii, Relational, Sampling, Similarity, SimilarityJoin, Stats, TextAnalysis, UrlOps}
import graft.sources.Tables

/** Training-data-pipeline operators (builder prompt: dedup / similarity /
  * text analysis / multimodal / sessionization) + the reference's
  * similarity join (SURVEY J14), each instantiated over the driver
  * testdata with a DuckDB oracle where SQL-expressible.
  *
  * Cross-engine parity rules: every hash is engine-neutral integer
  * arithmetic (see [[graft.functions.RollingHash]]), every ratio is a
  * floor-scaled integer, every similarity score used for ranking is an
  * exact BIGINT (quantized dot product), and every window order ends in a
  * unique key.
  */
object PipelineQueries {

  /** Canonical-doc assignment: connected components over the VERIFIED
    * near-dup pair graph (MinHash-LSH candidates that passed the exact
    * Jaccard check — the q25 operator). ONE builder shared by q32 (the
    * default execution path) and q76 (threshold 0 forces the distributed
    * contraction) so the mining parameters can never drift between the
    * two oracle-twinned queries. */
  private def dupComponents(
      s: SparkSession, d: String, localEdgeThreshold: Long): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
      n = 3, k = 8, bands = 4, minJaccardPermille = 200)
    Components.connectedComponents(
      docs.select(col("doc_id").as("id")),
      pairs.select(col("a_id").as("src"), col("b_id").as("dst")),
      localEdgeThreshold = localEdgeThreshold)
      .select(col("id").as("doc_id"), col("component_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J14: deletion-neighborhood blocked levenshtein<=1 self-join — the
    // equi-join rewrite of the reference's fuzzy alias lookup
    // (src/benchmark.py:69-79). Oracle is the naive cross-join form; the
    // property test in SimilarityJoinSpec proves equivalence in general.
    "q17_simjoin_lev1" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.select(col("c_custkey").as("a_key"), col("c_name").as("a_name"))
      val b = c.select(col("c_custkey").as("b_key"), col("c_name").as("b_name"))
      SimilarityJoin.levenshtein1Join(a, "a_name", b, "b_name",
        pairFilter = Some(col("a_key") < col("b_key")),
        shuffleHash = true) // big-big self-join: never broadcast the corpus
        .select(col("a_key"), col("b_key"))
    }),

    // exact dedup: one shuffle on the content hash
    "q18_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), col("text"), col("doc_id"))),

    // the exact-dedup DECISION in its 100 TB shape: the output-bounded
    // duplicate drop-list (one slim id+hash window exchange; the corpus
    // text never shuffles, and the apply side anti-joins a broadcast).
    // Keyed on a 40-char text PREFIX (boilerplate-prefix dedup) rather
    // than the full text so the oracle has real rows to hash at EVERY
    // gate scale — the fixture has zero full-text duplicates below
    // sf0.1, which would make a full-text oracle vacuously green (empty
    // vs empty) exactly where the driver runs it; full-text semantics
    // are pinned in DedupSpec instead
    "q77_exact_droplist" -> ((s, d) =>
      Dedup.exactDropList(Tables.documents(s, d),
        substring(col("text"), 1, 40), col("doc_id"))),

    // URL provenance tier: host extraction (userinfo/port-stripping
    // regexp), registrable-domain reduction (public-suffix second-level
    // heuristic), blocklist verdict — all map-side scans; URLs are
    // synthesized deterministically from the fixture so every shape
    // (www., cc-TLD suffix, userinfo, port, junk) appears
    "q71_url_domains" -> ((s, d) => {
      val urls = Tables.documents(s, d).withColumn("url",
        when(pmod(col("doc_id"), lit(6)) === 0,
          concat(lit("https://www."), col("source"), lit(".example.com/a/"), col("doc_id")))
        .when(pmod(col("doc_id"), lit(6)) === 1,
          concat(lit("http://"), col("source"), lit(".shop.example.co.uk:8080/b?q="), col("doc_id")))
        .when(pmod(col("doc_id"), lit(6)) === 2,
          concat(lit("https://user@"), col("source"), lit(".org/c#frag")))
        .when(pmod(col("doc_id"), lit(6)) === 3,
          concat(lit("http://[2001:DB8::"), pmod(col("doc_id"), lit(100)), lit("]:8080/x")))
        .when(pmod(col("doc_id"), lit(6)) === 4,
          concat(lit("https://192.0.2."), pmod(col("doc_id"), lit(250)), lit("/p")))
        .otherwise(concat(lit("not a url "), col("doc_id"))))
      val h = UrlOps.host(col("url"))
      val dom = UrlOps.registrableDomain(h)
      urls.select(col("doc_id"), h.as("host"), dom.as("reg_domain"),
        coalesce(dom.isin("example.co.uk"), lit(false)).as("blocked"))
    }),

    // C4-style line-level dedup: the fixture text has no newlines, so the
    // query makes words the lines (space -> \n) with a high occurrence
    // cap — only the corpus's most common words cross it and get cut from
    // every doc; the rebuild is a map-side positional filter
    "q72_line_dedup" -> ((s, d) => {
      val src = Tables.documents(s, d)
        .withColumn("text", translate(col("text"), " ", "\n"))
      Dedup.lineDedup(src, col("doc_id"), col("text"), maxFreq = 400L)
    }),

    // CCNet-style LM quality signal: train an exact-integer bigram LM on
    // the corpus itself (minCount=2 prune; denominators pre-prune), score
    // every doc by mean per-mille P(w2|w1) — OOV bigrams score 0, docs
    // under 2 tokens survive with n_bigrams=0
    "q73_lm_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.bigramLmScore(docs, col("doc_id"), col("text"),
        TextAnalysis.bigramLm(docs, col("text"), minCount = 2L))
    }),

    // leakage-free train/val/test split: the split key is the verified
    // near-dup CLUSTER representative (the q32 DAG), so a test doc can
    // never have a near-duplicate twin in train — the guard q48's
    // row-keyed split cannot give
    "q74_leakfree_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
        n = 3, k = 8, bands = 4, minJaccardPermille = 200)
      val clusters = Components.connectedComponents(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("a_id").as("src"), col("b_id").as("dst")))
      Sampling.leakFreeSplit(docs, col("doc_id"), clusters,
        Seq("train" -> 900, "val" -> 50, "test" -> 50), salt = "v1")
        .select(col("doc_id"), col("component_id"), col("split"))
    }),

    // token/quality metrics — all integers; ratios in exact per-mille
    "q19_text_stats" -> ((s, d) => {
      val t = col("text")
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(t).cast("long").as("n_tokens"),
        TextAnalysis.bpeishCount(t).cast("long").as("n_bpeish"),
        TextAnalysis.punctCount(t).cast("long").as("n_punct"),
        TextAnalysis.perMille(
          TextAnalysis.tokenCharCount(t), TextAnalysis.tokenCount(t)).as("mean_tok_len_permille"),
        TextAnalysis.perMille(
          TextAnalysis.stopwordCount(lower(t), TextAnalysis.StopwordProfiles.toMap.apply("en")),
          TextAnalysis.tokenCount(t)).as("en_stopword_permille"))
    }),

    // language-ID: stopword-evidence argmax with pinned tie-break
    "q20_lang_id" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.langId(col("text")).as("lang_guess"))),

    // document fingerprint: custom codegen RollingHash expression
    "q21_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))),

    // MinHash signatures (k=8, 3-gram shingles) — pure integer arithmetic
    "q22_minhash_sig" -> ((s, d) =>
      Dedup.minhashSignatures(Tables.documents(s, d), col("doc_id"), col("text"), n = 3, k = 8)),

    // SimHash near-dup pairs, hamming <= 2: banding guarantees full recall
    // at that distance, so the banded plan must equal the oracle's brute force
    "q23_simhash_pairs" -> ((s, d) =>
      Dedup.simhashNearDupPairs(Tables.documents(s, d), col("doc_id"), col("text"), maxHamming = 2)),

    // n-gram Jaccard near-dup pairs via the inverted-index equi-join
    "q24_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), col("doc_id"), col("text"),
        n = 3, minJaccardPermille = 200)
        .select(col("a_id"), col("b_id"), col("common"), col("jaccard_permille"))),

    // MinHash-LSH candidates (k=8, 4 bands × r=2) verified by exact Jaccard
    "q25_lsh_pairs" -> ((s, d) =>
      Dedup.minhashNearDupPairs(Tables.documents(s, d), col("doc_id"), col("text"),
        n = 3, k = 8, bands = 4, minJaccardPermille = 200)),

    // brute-force ANN top-5 by exact quantized dot (unit vectors: dot = cosine)
    "q26_ann_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 64), emb, k = 5, Similarity.quantizedDot)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
          col("score"))
    }),

    // sessionization over the events stream table: 30-min inactivity gap.
    // Both sides work in exact µs longs (`Tables.eventsTsUs` ↔ DuckDB
    // `epoch_us`): integer µs, never doubles — double division corrupts
    // 1.7e18-scale values
    "q28_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val gapUs = col("ts_us") - lag(col("ts_us"), 1).over(byUser)
      val isNew = when(gapUs.isNull || gapUs > lit(1800L * 1000000L), 1L).otherwise(0L)
      Tables.eventsTsUs(s, d)
        .withColumn("session_id",
          sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_us")).as("first_ts_us"),
          max(col("ts_us")).as("last_ts_us"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("total_value"))
    }),

    // as-of join: each purchase attributed to the user's latest click at or
    // before it (ties at equal µs: highest event_id). One shuffle on
    // user_id via the union+window sweep — never a per-key range blowup.
    "q33_asof_join" -> ((s, d) => {
      val ev = Tables.eventsTsUs(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      Relational.asofJoin(purchases, clicks,
        keys = Seq("user_id"), tsCol = "ts_us", tieCol = "event_id",
        rightPayload = Seq("event_id", "ts_us"), prefix = "click_")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_us").as("purchase_ts_us"), col("value"),
          col("click_event_id").as("click_id"), col("click_ts_us"))
    }),

    // range join: every purchase paired with EVERY click of the same user
    // in the preceding hour (the as-of join q33 keeps only the latest) —
    // bucketed-interval equi-join, never a per-key nested loop
    "q41_range_join" -> ((s, d) => {
      val ev = Tables.eventsTsUs(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_us").as("purchase_ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts_us").as("click_ts_us"),
          (col("ts_us") + lit(3600L * 1000000L)).as("window_end_us"))
      Relational.rangeJoin(
        purchases, Seq("user_id"), "purchase_ts_us",
        clicks, Seq("c_user"), "click_ts_us", "window_end_us",
        bucketWidth = 3600L * 1000000L)
        .select(col("purchase_id"), col("click_id"), col("user_id"),
          col("purchase_ts_us"), col("click_ts_us"))
    }),

    // W2: moving-frame window aggregate — per-user running stats over the
    // last 4 events (ROWS frame). DECIMAL-summed for bit-identical totals.
    "q35_moving_agg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.eventsTsUs(s, d)
        .select(
          col("event_id"), col("user_id"), col("ts_us"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .over(w).cast("double").as("moving_sum"),
          count(lit(1)).over(w).as("n_in_frame"),
          max(col("value")).over(w).as("moving_max"))
    }),

    // deterministic stratified sampling: per-language keep rates decided by
    // an engine-neutral hash of (stratum, doc_id) — reproducible across
    // engines/partitionings/retries, pure map-side (see Sampling scaladoc)
    "q36_stratified_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("lang", TextAnalysis.langId(col("text")))
      Sampling.stratifiedHashSample(docs, col("lang"), col("doc_id"),
        ratesPermille = Map("en" -> 200), defaultPermille = 500)
        .select(col("doc_id"), col("lang"))
    }),

    // multimodal metadata extraction: binary payload → typed metadata via
    // the partition-batched stub decoder (real plumbing, fake codec)
    "q29_media_meta" -> ((s, d) => {
      val media = Multimodal.fromText(s, Tables.documents(s, d), "doc_id", "text", "utf8")
      Multimodal.extractMeta(media, Multimodal.StubDecoder)
        .toDF()
        .select(col("id").as("doc_id"), col("byte_len"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"),
          col("format"))
    }),

    // LSH-bucketed ANN (8 tables × 6 hyperplanes, 2-bit multi-probe;
    // measured recall@5 = 0.80 vs exact at sf0.01) — no SQL oracle: LSH
    // recall is probabilistic by construction; the driver records a
    // rows-only check and SimilaritySpec asserts recall vs the exact oracle
    "q27_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(
        emb.filter(col("vec_id") < 64), emb, k = 5, planes = 6,
        Similarity.quantizedDot, probeBits = 2, tables = 8)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
          col("score"))
    }),

    // IVF-partitioned ANN (seeded k-means cells, nprobe=8 of nlist=16 —
    // chosen off the measured recall-vs-nprobe curve in AnnRecallBench:
    // 2→0.33, 4→0.57, 6→0.72, 8→0.82, 12→0.94, 16→1.00 at sf0.1; the
    // synthetic embeddings are UNclustered, so the cells carry little
    // structure and half the cells are needed for ≥0.8 recall@5; a real
    // clustered corpus sits higher on the same curve at lower nprobe) —
    // like q27, no SQL oracle: cell assignment is a trained artifact;
    // driver records rows-only, SimilaritySpec asserts recall vs exact
    "q37_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // maxIter 3: bucketing quality saturates fast and each k-means
      // iteration is a scheduler round-trip the bench pays per run
      Similarity.ivfTopK(
        emb.filter(col("vec_id") < 64), emb, k = 5, nlist = 16, nprobe = 8,
        Similarity.quantizedDot, maxIter = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
          col("score"))
    }),

    // feature extraction plumbing: partition-batched featurizer over the
    // binary payload; the stub's seeded-hash components are exact small
    // ints, so (uniquely for a "model" stage) the oracle replays them
    "q45_media_features" -> ((s, d) => {
      val media = Multimodal.fromText(s, Tables.documents(s, d), "doc_id", "text", "utf8")
      Multimodal.extractFeatures(media, Multimodal.StubFeaturizer(8)).toDF()
        .select(col("id").as("doc_id"), posexplode(col("embedding")).as(Seq("j", "f")))
        .select(col("doc_id"), col("j").cast("long").as("j"), col("f").cast("long").as("f_q"))
    }),

    // frame sampling plumbing: k byte offsets per payload — rows-only
    // oracle would be expressible but the op is about the explode shape
    "q30_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(
        Tables.documents(s, d).select(col("doc_id"), col("text").cast("binary").as("content")),
        "doc_id", "content", k = 4)),

    // canonical-doc assignment: connected components over the VERIFIED
    // near-dup pair graph (MinHash-LSH candidates that passed the exact
    // Jaccard check — the q25 operator; raw simhash collisions at sf0.1
    // form a 100×-denser graph of unverified sketch matches). Each doc
    // maps to the smallest doc_id it is transitively near-duplicate with.
    "q32_dup_components" -> ((s, d) =>
      dupComponents(s, d, Components.DefaultLocalEdgeThreshold)),

    // q32's AT-SCALE plan path, forced at oracle scale: threshold 0 sends
    // the pair graph through the two-level contraction (per-partition
    // union-find + stitched root graph — the plan a >10M-edge dup graph
    // gets), and the same DuckDB oracle as q32 hash-checks that the
    // distributed path is exact, not just spec-pinned. One shared builder
    // (dupComponents) keeps the mining parameters in lockstep with q32 —
    // only the threshold differs, by construction.
    "q76_dup_components_dist" -> ((s, d) => dupComponents(s, d, 0L)),

    // Block width 24 (r13, was 50): the loop's round count follows the
    // root-chain diameter ≈ log₂(fragments/chain), and the loop
    // property worth oracling is MULTI-PAIR propagation — labels
    // flowing between fused round-pairs — which needs ≥2 WORKING pairs,
    // i.e. diameter in [5, 16] under path halving. Measured same
    // session at sf0.1 (GRAFT_CC_DEBUG round logs): block 50 → ~15
    // fragments/chain, 3 working pairs + detect, 2.79 s; block 12 →
    // ~3 fragments, pair 1 finishes everything (propagation NOT
    // exercised — too far); block 24 → 2 working pairs + detect
    // (sums change across pairs), 2.63 s. So 24 is the geometry
    // minimum that keeps the loop-forcing property; the residual cost
    // is the contraction/assignment jobs, not excess rounds.
    // q78: the contraction's partitioner-aware min-label stitch LOOP,
    // forced at oracle scale. q76 cannot reach it: the toy dup graph's
    // components are single pairs, each contracted inside its own
    // partition, so the stitched root graph has ZERO edges and the loop
    // trivially skips — the loop's arithmetic was only ever spec-tested.
    // This query builds a graph the loop MUST solve: map-side chain
    // edges (doc_id → doc_id−1 within blocks of 24), hash-repartitioned
    // on src so every chain straddles many partitions — level 1's
    // per-partition union-find then yields multiple roots per chain and
    // the stitched root graph is itself chain-shaped, exactly the
    // worst-case diameter the RDD min-label loop exists for. threshold 0
    // forces the distributed gate at BOTH levels. The oracle is closed
    // form (component min = the block floor), so DuckDB hash-checks the
    // loop's labels exactly at every SF. Toy cost (~2.6 s at sf0.1, the
    // suite's most expensive query) is FIXED stitch-round overhead: the
    // fragmented root chains take multiple fused label rounds, each a
    // scheduler round-trip over a few-hundred-edge graph — the same
    // documented price q75/q76 pay for oracling an at-scale plan path,
    // amortized to noise on a real >10M-edge graph (ComponentsBench).
    // Measuring this cost paid for itself once already: it surfaced that
    // the stitch loop reused the CORPUS-sized partitioner for the
    // boundary-sized root graph (rounds of mostly-empty tasks — the same
    // waste at cluster shuffle.partitions), fixed in Components by a
    // root-graph-sized partitioner (3.50 → 2.51 s here, same-session).
    "q78_chain_components_dist" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = docs
        .filter(pmod(col("doc_id"), lit(24)) =!= 0)
        .select(col("doc_id").as("src"), (col("doc_id") - 1L).as("dst"))
        .repartition(32, col("src"))
      Components.connectedComponents(
        docs.select(col("doc_id").as("id")), edges, localEdgeThreshold = 0L)
        .select(col("id").as("doc_id"), col("component_id"))
    }),

    // sequence packing: concatenation-order context-window assignment per
    // source shard — running token sum div capacity; shards pack in
    // parallel (see Packing scaladoc for why the shard key matters at scale)
    "q42_seq_packing" -> ((s, d) =>
      Packing.sequencePacking(Tables.documents(s, d), "source", "doc_id",
        TextAnalysis.tokenCount(col("text")), capacity = 512L)
        .select(col("doc_id"), col("source"), col("pack_offset"),
          col("bin_id"), col("offset_in_bin"), col("spans_boundary"))),

    // intra-doc repetition (Gopher-style quality rule): dominance of the
    // top word 2-gram and the repeated-occurrence fraction, per-mille
    "q43_repetition" -> ((s, d) =>
      TextAnalysis.repetitionStats(
        Tables.documents(s, d), col("doc_id"), col("text"), n = 2)),

    // vocabulary profile per source shard: token occurrences, distinct
    // terms (exact — the oracle), and the type/token ratio in per-mille.
    // Terms are counted by the engine-neutral token hash (the same key
    // space the dedup tier shuffles). At 100 TB swap the exact distinct
    // for approx_count_distinct (HLL++, map-side combinable) — same plan
    // shape minus the distinct's second aggregate pass.
    "q44_vocab" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"), explode(Dedup.tokenHashes(col("text"))).as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          count_distinct(col("h")).as("n_terms"))
        .withColumn("type_token_permille",
          TextAnalysis.perMille(col("n_terms"), col("n_tokens")))),

    // corpus length profile: exact nearest-rank quantiles of n_chars per
    // language — pinned rank semantics replayable on any engine (see
    // Stats scaladoc); approx_percentile is the 100 TB sketch path
    "q40_group_quantiles" -> ((s, d) =>
      Stats.groupedQuantiles(Tables.documents(s, d),
        groupCols = Seq("lang"), valueCol = "n_chars", tieCol = "doc_id",
        psPermille = Seq(500, 900, 990))),

    // SemDeDup-style semantic dedup: seeded k-means cells -> within-cell
    // cosine-threshold pairs -> connected components -> keep min id per
    // group. Like q27/q37, no SQL oracle: the cell assignment is a trained
    // artifact; the driver records rows-only and SemDedupSpec pins
    // soundness (components refine the exact-threshold graph) and recall.
    // Cost note: the τ=0.4 pair graph on this synthetic corpus is chain-y
    // (noise-level links) but pair-SIZED, so Components solves it on the
    // single-task union-find path (one job) — the former ~8-round
    // propagation loop and its per-round job latency only engage above
    // the 10M-edge threshold, where per-round data cost dominates anyway.
    "q39_semdedup" -> ((s, d) =>
      Similarity.semDedup(Tables.embeddings(s, d), nlist = 16,
        minScoreQ = 400000L, Similarity.quantizedDot, maxIter = 3,
        nassign = 3)), // registered point on the r12 published
      // recall-vs-(nlist, nassign) surface (AnnRecallBench): nassign
      // 1/2/3/4 at nlist=16 -> 0.238/0.605/0.850/0.959 on the
      // UNclustered synthetic embeddings (the hardest case for
      // cell-local mining — every τ-pair is a random straddle);
      // nassign=3 buys 0.850 for ≤(3/2)² the within-cell pair work of
      // the old nassign=2 point, the same recall-for-bounded-cost move
      // as q37's nprobe=8 (SemDedupSpec pins soundness and the
      // fixture-level recall ordering)

    // q79: q37's ENTIRE IVF query path (assignCells → nprobe probing →
    // cell-keyed equi-join → exact re-rank) forced under a HASH oracle via
    // a fixed quantizer — cell table = the first 16 corpus embeddings, so
    // the only stage the oracle can't replay (trained k-means) is replaced
    // by a closed-form input and everything downstream is exact integer
    // arithmetic DuckDB replays bit-for-bit. Same twin pattern as
    // q75/q76/q78: the trained config (q37) stays quality-pinned by its
    // published recall curve; THIS query value-proves the plan path.
    "q79_ann_ivf_fixed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").cast("int").as("cell_id"), col("embedding").as("centroid"))
      Similarity.ivfTopKWithCentroids(
        emb.filter(col("vec_id") < 64), emb, k = 5, nprobe = 4, cents,
        Similarity.quantizedDot)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
          col("score"))
    }),

    // q80: q39's ENTIRE SemDeDup path (overlap assignment → within-cell
    // τ-pairs → connected components → min-id keeper) under a HASH oracle
    // via the same fixed quantizer as q79 — nassign=3 mirrors q39's
    // registered point so the overlap fan-out (a pair meeting in several
    // shared cells, deduped before Components) is the path exercised.
    "q80_semdedup_fixed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").cast("int").as("cell_id"), col("embedding").as("centroid"))
      Similarity.semDedupWithCentroids(
        emb, cents, minScoreQ = 400000L, Similarity.quantizedDot, nassign = 3)
    }),

    // q81: the hot-shingle cap's observability dial (jaccard-side
    // sibling of cappedLshBuckets) — which shingle hashes exceed the df
    // cap, with exact df. Threshold 5 is calibrated to the testdata (max
    // df 9/7/25 at sf0.001/0.01/0.1) so the dial returns rows at EVERY
    // SF — an always-empty oracle would prove nothing.
    "q81_hot_shingles" -> ((s, d) =>
      Dedup.hotShingles(Tables.documents(s, d), col("doc_id"), col("text"),
        n = 3, maxShingleFreq = 5L)),

    // incremental dedup: docs with doc_id % 7 == 0 play today's crawl
    // increment, the rest the already-indexed corpus (signatures persisted,
    // only candidates re-shingled — see Dedup.incrementalNearDupPairs)
    "q46_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val newDocs = docs.filter(col("doc_id") % 7 === 0)
      val oldDocs = docs.filter(col("doc_id") % 7 =!= 0)
      val oldSig = Dedup.minhashSignatures(oldDocs, col("doc_id"), col("text"), n = 3, k = 8)
      Dedup.incrementalNearDupPairs(
        newDocs, col("doc_id"), col("text"), oldSig,
        oldDocs, col("doc_id"), col("text"),
        n = 3, k = 8, bands = 4, minJaccardPermille = 200)
    }),

    // corpus-level boilerplate mining: top-20 trigrams by document
    // frequency — the list ingest turns into a strip/blocklist; the
    // hot-shingle caps elsewhere only BOUND these grams' cost
    "q53_top_ngrams" -> ((s, d) =>
      TextAnalysis.topNgrams(Tables.documents(s, d), col("text"), n = 3, k = 20)),

    // int8-quantized ANN: same LSH candidate generation as q27, but the
    // re-rank scan reads 1-byte codes through the integer Int8Dot kernel —
    // the serving index is 4x smaller and drops the float embeddings.
    // Rows-only like q27 (float rescale); SimilaritySpec pins recall.
    "q52_ann_int8" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopKInt8(
        emb.filter(col("vec_id") < 64), emb, k = 5, planes = 6,
        probeBits = 2, tables = 8)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"))
    }),

    // token chunking: 32-token windows with 8-token overlap (step 24) —
    // the RAG/embedding segmentation pass; map-side only, fuses into scan
    "q51_chunking" -> ((s, d) =>
      TextAnalysis.chunkDocs(Tables.documents(s, d), col("doc_id"), col("text"),
        chunkTokens = 32, overlapTokens = 8)),

    // span-level contamination: not just WHICH train docs leak the
    // benchmark, but WHERE — merged half-open token spans of leaked
    // shingle coverage, the mask for surgical span removal (removeSpans'
    // input shape) instead of doc drops; all-scalar output for the gate
    "q50_contamination_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Contamination.ngramOverlapSpans(
        docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
        docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
        n = 3, minShared = 2)
    }),

    // exact-substring self-dedup (Lee et al. 2022): maximal token spans
    // whose every 3-gram occurs >= 2 times corpus-wide — the removal mask
    // of an exact-substring dedup pass. Inverted-index + island merge;
    // train-vs-train counterpart of q50's train-vs-bench spans.
    "q54_selfdup_spans" -> ((s, d) =>
      Dedup.duplicateSpans(Tables.documents(s, d), col("doc_id"), col("text"), n = 3)),

    // q54's AT-SCALE plan path, forced at oracle scale: the gate set to 0
    // activates the GramCountSketch pre-filter + cached-candidate mask
    // (the plan a 100 TB corpus gets), and the same DuckDB oracle as q54
    // hash-checks that the sketch path is exact, not just spec-pinned
    "q75_selfdup_spans_sketch" -> ((s, d) => {
      // save-and-restore, not unset: a pre-existing session gate setting
      // must survive running this query
      val prior = s.conf.getOption(Dedup.BroadcastGateMinBytesKey)
      s.conf.set(Dedup.BroadcastGateMinBytesKey, "0")
      try Dedup.duplicateSpans(Tables.documents(s, d), col("doc_id"), col("text"), n = 3)
      finally prior match {
        case Some(v) => s.conf.set(Dedup.BroadcastGateMinBytesKey, v)
        case None => s.conf.unset(Dedup.BroadcastGateMinBytesKey)
      }
    }),

    // the APPLY half of q54: rewrite every doc with its duplicated runs
    // cut out (map-side codegen kernel after one doc-keyed span join) —
    // survivors keep their unique content instead of being dropped whole
    "q57_selfdup_rewrite" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val spans = Dedup.duplicateSpans(docs, col("doc_id"), col("text"), n = 3)
      Dedup.removeSpans(docs, col("doc_id"), col("text"), spans)
    }),

    // CCNet-style head/middle/tail bucketing by per-language n_chars
    // terciles — nearest-rank cuts, value == cut lands low; the per-lang
    // threshold table broadcasts back, labeling is map-side
    "q55_quantile_buckets" -> ((s, d) =>
      Stats.quantileBuckets(Tables.documents(s, d),
        groupCols = Seq("lang"), valueCol = "n_chars", tieCol = "doc_id",
        cutsPermille = Seq(333, 667))),

    // exactly-k-per-group deterministic sample: 10 eval docs per language
    // by salted hash rank — exact count (not a rate), engine-replayable,
    // one window shuffle on the group key
    "q67_sample_k" -> ((s, d) =>
      Sampling.hashSampleK(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        col("lang"), col("doc_id"), k = 10)),

    // training-order shuffle: the corpus into 8 reproducible shards, a
    // position inside each — reading shards in (shard, pos) order IS the
    // epoch's permutation; one hash shuffle + per-shard sort
    "q68_shuffle_shards" -> ((s, d) =>
      Sampling.shuffleShards(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        col("doc_id"), numShards = 8)),

    // corpus snapshot diff: two synthetic snapshots derived from the same
    // table (doc_id%7 drop-out vs doc_id%3 drop-out with %5 docs edited)
    // so all four statuses appear; hashes computed map-side, the
    // full-outer join shuffles ids+hashes only
    "q69_corpus_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      val newSnap = docs.filter(col("doc_id") % 3 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      Dedup.corpusDiff(oldSnap, newSnap, col("doc_id"), col("text"))
    }),

    // per-language keyword profile: top-5 tokens per group by
    // exact-integer df-normalized term frequency; the synthetic corpus's
    // vocabulary is 31 near-uniform-df tokens, so the stopword cap stays
    // open here (its excluding behavior is spec-pinned) and the ranking
    // exercises the tf side; everything after the explode is vocab-sized
    "q70_group_keywords" -> ((s, d) =>
      TextAnalysis.groupKeywords(
        Tables.documents(s, d), col("lang"), col("doc_id"), col("text"),
        k = 5)),

    // markup strip (content extraction): salt a third of the docs with a
    // wrapping div + script payload, a third with entities; the stripper
    // must drop code, keep prose, and unescape in HTML order — map-side
    // regexp chain fused into the scan
    "q66_strip_markup" -> ((s, d) => {
      val marked = Tables.documents(s, d).withColumn("mtext",
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("<div class=x>"), col("text"),
            lit("</div><script type=js>var a=1;</script>")))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(lit("<p>"), col("text"), lit(" &amp;amp; more&nbsp;text</p>")))
        .otherwise(col("text")))
      // `clean` projected FIRST, n_clean derived from the projected column
      // — the 10-step regexp chain is the query's dominant per-row cost
      // and must run once per row, not once per referencing expression
      marked.select(col("doc_id"),
        TextAnalysis.stripMarkup(col("mtext")).as("clean"),
        length(col("mtext")).cast("long").as("n_raw"))
        .withColumn("n_clean", length(col("clean")).cast("long"))
    }),

    // semantic contamination: embedding-space leakage the n-gram check
    // can't see — bench (vec_id < 64) broadcasts whole, the corpus
    // streams map-side through the exact quantized dot; zero shuffles
    "q65_semantic_contamination" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Contamination.semanticOverlapPairs(
        emb.filter(col("vec_id") < 64), col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") >= 64), col("vec_id"), col("embedding"),
        minScoreQ = 300000L)
    }),

    // data-recipe up-sampling: 3 epochs of src0, 1.5 of src1, src2
    // dropped, 0.8 of everything else — integer epochs replicate,
    // the fractional remainder is a deterministic hash Bernoulli;
    // pure map-side explode, no shuffle
    "q64_epoch_mix" -> ((s, d) =>
      Sampling.epochUpsample(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        col("source"), col("doc_id"),
        weightsPermille = Map("src0" -> 3000, "src1" -> 1500, "src2" -> 0),
        defaultPermille = 800)),

    // bag-of-words cosine near-dup pairs: token-frequency vectors over
    // the df≤100 vocabulary, exact integer cos²·1000 — catches
    // same-vocabulary/different-order rewrites that shingle Jaccard
    // misses; inverted-index self-join, norms ride the postings
    "q63_tf_cosine" -> ((s, d) =>
      Dedup.tfCosinePairs(Tables.documents(s, d), col("doc_id"), col("text"),
        minCos2Permille = 250, maxTokenDf = 100L)),

    // bloom-routed blocklist anti-join: lineitem minus the 'F'-status
    // orders — EXACT left_anti semantics; rows the broadcast Bloom sketch
    // proves absent settle map-side with no exchange, only the maybe
    // sliver (members + fpp share) takes the confirming equi-join
    "q62_bloom_anti" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val block = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      graft.operators.BloomJoin.bloomAntiJoin(
        li, col("l_orderkey"), block, col("o_orderkey"),
        fpp = 0.01) // AutoSize: the blocklist is ~⅓ of orders at ANY sf —
                    // a hard-coded estimate would saturate at bench scale
    }),

    // target-corpus affinity (CCNet/GPT-3-style quality proxy): permille
    // of each train doc's distinct bigrams present in the curated target
    // (src0) — target gram set is the small build side, never a cross
    "q61_target_affinity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.targetAffinity(
        docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
        docs.filter(col("source") === "src0"), col("text"), n = 2)
    }),

    // IDF-style lexical commonness: mean corpus df of each doc's tokens
    // (×1000) — the TF-IDF-family quality filter's engine-neutral core
    "q60_token_rarity" -> ((s, d) =>
      TextAnalysis.tokenRarity(Tables.documents(s, d), col("doc_id"), col("text"))),

    // token-budget curation: per source shard, keep the best docs (by
    // n_chars, ties on doc_id) until an 800-token budget fills — the
    // kept set is exactly a quality-ranked prefix; two-pass distributed
    // prefix sum (range slices + broadcast offsets), never one task per
    // group — see Sampling.budgetSelect
    "q59_token_budget" -> ((s, d) =>
      Sampling.budgetSelect(
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        col("source"), Seq(col("n_chars").desc, col("doc_id").asc),
        col("n_tokens"), budget = 800L)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_weight").as("cum_tokens"), col("kept"))),

    // temperature-scaled language mixing (XLM α=0.5): per-lang keep-rate
    // √(n_min/n_lang) — smallest language keeps all, English (3× the
    // corpus share) is damped; deterministic hash Bernoulli, map-side
    // after a broadcast rate join
    "q58_temperature_mix" -> ((s, d) =>
      Sampling.temperatureResample(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        col("lang"), col("doc_id"), alpha = 0.5)),

    // the dedup DECISION on top of q32's clusters: keep the longest doc
    // per near-dup component (ties to smallest id), verdict for every doc
    "q56_canonical_pick" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
        n = 3, k = 8, bands = 4, minJaccardPermille = 200)
      val comp = Components.connectedComponents(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("a_id").as("src"), col("b_id").as("dst")))
        .select(col("id").as("doc_id"), col("component_id"))
      Dedup.keepBest(
        comp.join(docs.select(col("doc_id"), col("n_chars")), "doc_id"),
        col("doc_id"), col("component_id"),
        order = Seq(col("n_chars").desc, col("doc_id").asc))
    }),

    // composite quality gate: the keep/drop decision of a curation pass,
    // one named boolean per rule (auditable) + their conjunction.
    // Thresholds sit inside the synthetic corpus's signal ranges (tokens
    // 10-99, mean-tok-len 3.7-5.3k permille, stopword 0-222 permille,
    // top-gram 10-166 permille at sf0.01) so every flag fires on SOME docs.
    "q49_quality_gate" -> ((s, d) =>
      TextAnalysis.qualityGate(Tables.documents(s, d), col("doc_id"), col("text"),
        minTokens = 30L, maxTokens = 100000L,
        minMeanTokLenPermille = 3000L, maxMeanTokLenPermille = 5000L,
        minStopwordPermille = 20L, maxTopGramPermille = 100L, n = 2)),

    // PII scrub: the synthetic corpus carries no PII, so every 3rd doc is
    // salted with a deterministic email + phone + IPv4 (same arithmetic in
    // the oracle SQL) — the other docs pin the zero-hit path. Counts are
    // audit numbers over the original text; `scrubbed` is the redaction.
    // Pure map-side regexp expressions: one pass, no shuffle, at any scale.
    "q47_pii_scrub" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val salted = docs.withColumn("ptext",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or +1415555"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".7 ok")))
          .otherwise(col("text")))
      Pii.scrubDocs(salted, col("doc_id"), col("ptext"))
    }),

    // deterministic train/val/test split: hash-bucket assignment that is
    // stable across runs, engines and partitionings — a doc can never
    // migrate into eval. Map-side only; the oracle replays the same hash.
    "q48_hash_split" -> ((s, d) =>
      Sampling.hashSplit(Tables.documents(s, d), col("doc_id"),
        Seq("train" -> 900, "val" -> 50, "test" -> 50), salt = "v1")
        .select(col("doc_id"), col("split"))),

    // benchmark-contamination check: treat source 'src0' as the held-out
    // eval suite, everything else as the train corpus; any cross pair
    // sharing >= 2 distinct 3-gram shingles is a leakage candidate.
    // Inverted-index equi-join — never bench × corpus.
    "q38_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Contamination.ngramOverlapPairs(
        docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
        docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
        n = 3, minShared = 2, maxShingleFreq = 100L)
    }),

    // embedding-cosine near-dup pairs, exact baseline form (bounded query
    // side; the LSH bucketing of q27 is the full-corpus scale path). τ sits
    // at the top of this synthetic corpus's similarity distribution —
    // it has no true duplicates (max pairwise cosine ≈ 0.51)
    "q31_embed_dup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val a = emb.filter(col("vec_id") < 256)
        .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      a.crossJoin(b)
        .filter(col("a_id") < col("b_id"))
        .withColumn("dot_q", Similarity.quantizedDot(col("a_emb"), col("b_emb")))
        .filter(col("dot_q") >= 400000L) // unit vectors: cosine ≥ 0.4 at 10⁶ scale
        .select(col("a_id"), col("b_id"), col("dot_q"))
    }))

  private def mkOracles: Map[String, String] = {
    val m = Map.newBuilder[String, String]

    m += "q17_simjoin_lev1" ->
      """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key
        |FROM customer a, customer b
        |WHERE a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin

    m += "q18_dedup_exact" ->
      """SELECT md5(text) AS content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_id
        |FROM documents GROUP BY md5(text)""".stripMargin

    m += "q77_exact_droplist" ->
      """WITH h AS (SELECT doc_id,
        |             MIN(doc_id) OVER (PARTITION BY md5(substring(text, 1, 40))) AS canonical_id
        |           FROM documents)
        |SELECT doc_id, canonical_id FROM h WHERE doc_id <> canonical_id""".stripMargin

    val toks = DuckSql.tokens("text")
    val enList = TextAnalysis.StopwordProfiles.toMap.apply("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    m += "q19_text_stats" ->
      s"""SELECT doc_id,
         | CAST(len($toks) AS BIGINT) AS n_tokens,
         | CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_bpeish,
         | CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS n_punct,
         | CAST(CASE WHEN len($toks) = 0 THEN 0 ELSE
         |   (list_sum(list_transform($toks, t -> length(t))) * 1000 // len($toks))
         | END AS BIGINT) AS mean_tok_len_permille,
         | CAST(CASE WHEN len($toks) = 0 THEN 0 ELSE
         |   (len(list_filter(${DuckSql.tokens("lower(text)")}, t -> list_contains($enList, t))) * 1000 // len($toks))
         | END AS BIGINT) AS en_stopword_permille
         |FROM documents""".stripMargin

    m += "q20_lang_id" ->
      s"SELECT doc_id, ${DuckSql.langIdSql("text")} AS lang_guess FROM documents"

    m += "q21_fingerprint" ->
      s"SELECT doc_id, CAST(${DuckSql.rollingHash("text")} AS BIGINT) AS fp FROM documents"

    m += "q22_minhash_sig" ->
      s"""WITH ${DuckSql.shingleCtes},
         |${DuckSql.minhashCte(8)}
         |SELECT * FROM mh""".stripMargin

    val tokenHashes = s"list_transform(${DuckSql.tokens("text")}, t -> ${DuckSql.rollingHash("t")})"
    m += "q23_simhash_pairs" ->
      s"""WITH sig AS (SELECT doc_id, ${DuckSql.simhash(tokenHashes)} AS s FROM documents)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
         |FROM sig a, sig b
         |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.s, b.s)) <= 2""".stripMargin

    m += "q24_jaccard_pairs" ->
      s"""WITH ${DuckSql.shingleCtes},
         |idx AS (SELECT doc_id, unnest(hs) AS h FROM hashed),
         |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
         |          FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id),
         |sizes AS (SELECT doc_id, len(hs) AS sz FROM hashed)
         |SELECT a_id, b_id, common,
         |  CAST(common * 1000 // (sa.sz + sb.sz - common) AS BIGINT) AS jaccard_permille
         |FROM pairs JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
         |WHERE common * 1000 // (sa.sz + sb.sz - common) >= 200""".stripMargin

    // LSH bands: 4 bands × 2 rows over mh_0..mh_7, then exact-jaccard
    // verify. The band key is the bijective numeric pack of the two rows
    // (each < 1e9+7, so the BIGINT product is < 2^60) — Dedup.bandKey's
    // one definition
    val bandSelects = (0 until 4).map { b =>
      s"SELECT doc, $b AS band, mh_${2 * b} * 1000000007 + mh_${2 * b + 1} AS sig FROM mh"
    }.mkString("\n UNION ALL ")
    m += "q25_lsh_pairs" ->
      s"""WITH ${DuckSql.shingleCtes},
         |${DuckSql.minhashCte(8)},
         |bands AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc AS a_id, b.doc AS b_id
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc < b.doc)
         |SELECT a_id, b_id,
         |  CAST((len(list_intersect(ha.hs, hb.hs)) * 1000 //
         |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))) AS BIGINT) AS jaccard_permille
         |FROM cand JOIN hashed ha ON ha.doc_id = a_id JOIN hashed hb ON hb.doc_id = b_id
         |WHERE (len(list_intersect(ha.hs, hb.hs)) * 1000 //
         |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))) >= 200""".stripMargin

    // incremental ≡ batch restricted to pairs touching the increment,
    // re-oriented: the increment doc is always new_id; a pair inside the
    // increment keeps the later id as new_id (same as the batch a<b form)
    m += "q46_incremental_dedup" ->
      s"""WITH ${DuckSql.shingleCtes},
         |${DuckSql.minhashCte(8)},
         |bands AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc AS a_id, b.doc AS b_id
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc < b.doc),
         |verified AS (SELECT a_id, b_id,
         |  CAST((len(list_intersect(ha.hs, hb.hs)) * 1000 //
         |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))) AS BIGINT) AS jp
         |  FROM cand JOIN hashed ha ON ha.doc_id = a_id JOIN hashed hb ON hb.doc_id = b_id
         |  WHERE (len(list_intersect(ha.hs, hb.hs)) * 1000 //
         |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))) >= 200)
         |SELECT CASE WHEN a_id % 7 = 0 AND b_id % 7 <> 0 THEN a_id ELSE b_id END AS new_id,
         |  CASE WHEN a_id % 7 = 0 AND b_id % 7 <> 0 THEN b_id ELSE a_id END AS dup_of_id,
         |  jp AS jaccard_permille,
         |  a_id % 7 = 0 AND b_id % 7 = 0 AS dup_in_increment
         |FROM verified
         |WHERE a_id % 7 = 0 OR b_id % 7 = 0""".stripMargin

    // connected components via recursive min-reachability closure over the
    // verified LSH pair set (same CTEs as the q25 oracle): reach enumerates
    // every (doc, reachable doc) — UNION dedups → terminates — and the
    // component id is the min reached. Tractable because verified near-dup
    // components are small (reach rows = Σ component²), which is also why
    // the oracle stays SQL-expressible.
    val q32Sql =
      s"""WITH RECURSIVE ${DuckSql.shingleCtes},
         |${DuckSql.minhashCte(8)},
         |bands AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc AS a_id, b.doc AS b_id
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc < b.doc),
         |verified AS (SELECT a_id, b_id
         |  FROM cand JOIN hashed ha ON ha.doc_id = a_id JOIN hashed hb ON hb.doc_id = b_id
         |  WHERE (len(list_intersect(ha.hs, hb.hs)) * 1000 //
         |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))) >= 200),
         |edges AS (SELECT a_id AS src, b_id AS dst FROM verified
         |          UNION ALL SELECT b_id, a_id FROM verified),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r)
         |SELECT id AS doc_id, MIN(r) AS component_id FROM reach GROUP BY id""".stripMargin
    m += "q32_dup_components" -> q32Sql
    // q76: the distributed contraction path must be EXACT — same oracle
    m += "q76_dup_components_dist" -> q32Sql

    // q78: block-chain graph (doc_id → doc_id−1 within blocks of 24), so
    // the component min is the block floor in closed form — no recursive
    // CTE needed, and the stitch loop's labels hash-check exactly
    m += "q78_chain_components_dist" ->
      """SELECT doc_id, doc_id - doc_id % 24 AS component_id
        |FROM documents""".stripMargin

    // q32's component closure + q48's hash-bucket assignment, keyed on the
    // cluster representative instead of the row id — the oracle replays the
    // whole leakage-free split end to end
    m += "q74_leakfree_split" ->
      s"""WITH RECURSIVE ${DuckSql.shingleCtes},
         |${DuckSql.minhashCte(8)},
         |bands AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc AS a_id, b.doc AS b_id
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc < b.doc),
         |verified AS (SELECT a_id, b_id
         |  FROM cand JOIN hashed ha ON ha.doc_id = a_id JOIN hashed hb ON hb.doc_id = b_id
         |  WHERE (len(list_intersect(ha.hs, hb.hs)) * 1000 //
         |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))) >= 200),
         |edges AS (SELECT a_id AS src, b_id AS dst FROM verified
         |          UNION ALL SELECT b_id, a_id FROM verified),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
         |comp AS (SELECT id AS doc_id, MIN(r) AS component_id FROM reach GROUP BY id),
         |h AS (SELECT doc_id, component_id,
         |  ${DuckSql.rollingHash("'v1' || ':' || coalesce(CAST(component_id AS VARCHAR), '')")} AS h0
         |  FROM comp),
         |b AS (SELECT doc_id, component_id, ${DuckSql.decisionMix("h0")} % 1000 AS bk FROM h)
         |SELECT doc_id, component_id,
         |  CASE WHEN bk < 900 THEN 'train' WHEN bk < 950 THEN 'val' ELSE 'test' END AS split
         |FROM b""".stripMargin

    m += "q44_vocab" ->
      s"""WITH h AS (SELECT source, unnest(list_transform(${DuckSql.tokens("text")},
         |  t -> ${DuckSql.rollingHash("t")})) AS h FROM documents)
         |SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT h) AS n_terms,
         |  CAST(CASE WHEN COUNT(*) = 0 THEN 0 ELSE
         |    COUNT(DISTINCT h) * 1000 // COUNT(*) END AS BIGINT) AS type_token_permille
         |FROM h GROUP BY source""".stripMargin

    m += "q42_seq_packing" ->
      s"""WITH t AS (SELECT doc_id, source,
         |  CAST(len(${DuckSql.tokens("text")}) AS BIGINT) AS tok FROM documents),
         |o AS (SELECT doc_id, source, tok,
         |  CAST(COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pack_offset
         |  FROM t)
         |SELECT doc_id, source, pack_offset,
         |  CAST(floor(pack_offset / 512.0) AS BIGINT) AS bin_id,
         |  pack_offset % 512 AS offset_in_bin,
         |  tok > 0 AND CAST(floor((pack_offset + tok - 1) / 512.0) AS BIGINT)
         |    > CAST(floor(pack_offset / 512.0) AS BIGINT) AS spans_boundary
         |FROM o""".stripMargin

    m += "q43_repetition" ->
      s"""WITH toks AS (SELECT doc_id, ${DuckSql.tokens("text")} AS w FROM documents),
         |grams AS (SELECT doc_id, unnest(
         |  list_transform(range(1, len(w)), i -> ${DuckSql.rollingHash("w[i] || ' ' || w[i+1]")})) AS g
         |  FROM toks WHERE len(w) >= 2),
         |counts AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams, COUNT(*) AS n_distinct_grams,
         |  CAST(MAX(c) * 1000 // SUM(c) AS BIGINT) AS top_gram_permille,
         |  CAST((SUM(c) - COUNT(*)) * 1000 // SUM(c) AS BIGINT) AS dup_gram_permille
         |FROM counts GROUP BY doc_id""".stripMargin

    m += "q40_group_quantiles" ->
      """WITH r AS (SELECT lang, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang, MAX(n) AS n_n_chars,
        |  MIN(CASE WHEN rn = greatest(1, CAST(ceil(n * 500 / 1000.0) AS BIGINT))
        |      THEN n_chars END) AS p500_n_chars,
        |  MIN(CASE WHEN rn = greatest(1, CAST(ceil(n * 900 / 1000.0) AS BIGINT))
        |      THEN n_chars END) AS p900_n_chars,
        |  MIN(CASE WHEN rn = greatest(1, CAST(ceil(n * 990 / 1000.0) AS BIGINT))
        |      THEN n_chars END) AS p990_n_chars
        |FROM r GROUP BY lang""".stripMargin

    m += "q53_top_ngrams" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
         |  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS gram
         |  FROM t WHERE len(w) >= 3)
         |SELECT gram, COUNT(*) AS df FROM g GROUP BY gram
         |ORDER BY df DESC, gram ASC LIMIT 20""".stripMargin

    // q54: grams keyed in the WIDE ~60-bit space (h1*(1e9+7)+h2, h2 the
    // base-37 twin hash) — the >=2-on-one-key test saturates the narrow
    // space at ~1e9 corpus grams (see Dedup.duplicateSpans); dup = total multiplicity
    // >= 2 (cross-doc or within-doc); islands merge on COVERAGE (gap <=
    // n: overlap or touch), replayed with the same lag-flag running sum
    // (the HUGEINT sum is only a grouping key, never an output column).
    // MIN/MAX/COUNT stay BIGINT in DuckDB (only SUM goes HUGEINT).
    val q54Sql =
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         |    (${DuckSql.rollingHash("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} * 1000000007
         |     + ${DuckSql.rollingHash37("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")}) AS h
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
         |        FROM t WHERE len(w) >= 3)),
         |dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
         |p AS (SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 3
         |         THEN 0 ELSE 1 END AS newg
         |  FROM g WHERE h IN (SELECT h FROM dup)),
         |s AS (SELECT doc_id, pos,
         |    SUM(newg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM p)
         |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 3 AS span_end,
         |  CAST(COUNT(*) AS BIGINT) AS n_dup_grams
         |FROM s GROUP BY doc_id, grp""".stripMargin
    m += "q54_selfdup_spans" -> q54Sql

    // q75: the sketch path must be EXACT — same oracle as q54
    m += "q75_selfdup_spans_sketch" -> q54Sql

    // q57: a token is cut iff some duplicated gram starting at pos covers
    // it (pos..pos+2); survivors re-join with single spaces, docs that
    // are fully cut (or token-free) collapse to ''
    m += "q57_selfdup_rewrite" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         |    (${DuckSql.rollingHash("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} * 1000000007
         |     + ${DuckSql.rollingHash37("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")}) AS h
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
         |        FROM t WHERE len(w) >= 3)),
         |dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
         |p AS (SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM dup)),
         |cov AS (SELECT DISTINCT doc_id, pos + j AS tk
         |        FROM p, (SELECT unnest(range(0, 3)) AS j)),
         |tok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx, w[i] AS word
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM t)),
         |kept AS (SELECT tok.doc_id, idx, word FROM tok
         |  LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.idx = cov.tk
         |  WHERE cov.tk IS NULL),
         |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY idx) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(a.clean_text, '') AS clean_text
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin

    // q55: nearest-rank cuts exactly as the q40 oracle computes them;
    // bucket = number of cuts strictly exceeded. Null-parity with the
    // operator even though today's data is null-free: the join matches
    // NULL groups (IS NOT DISTINCT FROM) and a NULL value labels as the
    // top bucket, mirroring the nulls-last rank the cuts use.
    m += "q55_quantile_buckets" ->
      """WITH r AS (SELECT lang, n_chars, doc_id,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |q AS (SELECT lang,
        |  MIN(CASE WHEN rn = greatest(1, CAST(ceil(n * 333 / 1000.0) AS BIGINT))
        |      THEN n_chars END) AS t1,
        |  MIN(CASE WHEN rn = greatest(1, CAST(ceil(n * 667 / 1000.0) AS BIGINT))
        |      THEN n_chars END) AS t2
        |  FROM r GROUP BY lang)
        |SELECT d.lang, d.doc_id, d.n_chars,
        |  CAST(CASE WHEN d.n_chars IS NULL THEN 2 ELSE
        |    CASE WHEN d.n_chars > q.t1 THEN 1 ELSE 0 END +
        |    CASE WHEN d.n_chars > q.t2 THEN 1 ELSE 0 END END AS BIGINT) AS bucket
        |FROM documents d JOIN q ON d.lang IS NOT DISTINCT FROM q.lang""".stripMargin

    // q67: hash collisions tie-break on the unique key in BOTH orders;
    // the multiply-and-wrap mix replays exactly in HUGEINT
    m += "q67_sample_k" ->
      s"""WITH r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |  ORDER BY (${DuckSql.rollingHash("'v1:' || CAST(doc_id AS VARCHAR)")} * 2654435761) % ${DuckSql.P}, doc_id)
         |  AS sample_rank FROM documents)
         |SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
         |FROM r WHERE sample_rank <= 10""".stripMargin

    // q68: the same mixed hash; shard = hash mod 8, position = rank of
    // the hash inside the shard (hash >= 0, so % ≡ pmod)
    m += "q68_shuffle_shards" ->
      s"""WITH h AS (SELECT doc_id, source,
         |  (${DuckSql.rollingHash("'v1:' || CAST(doc_id AS VARCHAR)")} * 2654435761) % ${DuckSql.P} AS m
         |  FROM documents)
         |SELECT doc_id, source, CAST(m % 8 AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY m % 8 ORDER BY m, doc_id) AS BIGINT) AS pos_in_shard
         |FROM h""".stripMargin

    // q71: same regexp (RE2∩Java, no quotes/backslashes), same
    // public-suffix second-level heuristic; DuckDB list slices are
    // 1-based inclusive, mirroring Spark's slice(start, length)
    m += "q71_url_domains" ->
      """WITH u AS (SELECT doc_id, CASE
        |    WHEN doc_id % 6 = 0 THEN 'https://www.' || source || '.example.com/a/' || CAST(doc_id AS VARCHAR)
        |    WHEN doc_id % 6 = 1 THEN 'http://' || source || '.shop.example.co.uk:8080/b?q=' || CAST(doc_id AS VARCHAR)
        |    WHEN doc_id % 6 = 2 THEN 'https://user@' || source || '.org/c#frag'
        |    WHEN doc_id % 6 = 3 THEN 'http://[2001:DB8::' || CAST(doc_id % 100 AS VARCHAR) || ']:8080/x'
        |    WHEN doc_id % 6 = 4 THEN 'https://192.0.2.' || CAST(doc_id % 250 AS VARCHAR) || '/p'
        |    ELSE 'not a url ' || CAST(doc_id AS VARCHAR) END AS url
        |  FROM documents),
        |h AS (SELECT doc_id,
        |  nullif(regexp_replace(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(\[[^\]/?#]*\]|[^/?#:]+)', 1)), '\.+$', ''), '') AS host
        |  FROM u),
        |l AS (SELECT doc_id, host, string_split(host, '.') AS ls FROM h),
        |r AS (SELECT doc_id, host, CASE
        |    WHEN host IS NULL THEN NULL
        |    WHEN regexp_matches(host, '^\[') OR regexp_matches(host, '^[0-9.]+$') THEN host
        |    WHEN len(ls) <= 1 THEN host
        |    WHEN len(ls) >= 3 AND length(ls[len(ls)]) = 2
        |         AND ls[len(ls) - 1] IN ('co','com','net','org','gov','edu','ac')
        |      THEN array_to_string(ls[len(ls)-2:len(ls)], '.')
        |    ELSE array_to_string(ls[len(ls)-1:len(ls)], '.') END AS reg_domain
        |  FROM l)
        |SELECT doc_id, host, reg_domain,
        |  COALESCE(reg_domain = 'example.co.uk', FALSE) AS blocked FROM r""".stripMargin

    // q72: words-as-lines (space -> \n); occurrence count over trimmed
    // non-empty lines, drop-all above the cap, positional rebuild;
    // string_agg over zero kept rows is NULL -> '' (Spark: empty array
    // -> array_join -> ""); both trims are space-only
    m += "q72_line_dedup" ->
      """WITH src AS (SELECT doc_id, replace(text, ' ', chr(10)) AS t FROM documents),
        |ls AS (SELECT doc_id, t, string_split(t, chr(10)) AS l FROM src),
        |pos AS (SELECT doc_id, l, CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS i FROM ls),
        |ln AS (SELECT doc_id, i - 1 AS pos, l[i] AS line FROM pos),
        |k AS (SELECT doc_id, pos, line, md5(trim(line)) AS kk, trim(line) <> '' AS ne FROM ln),
        |drops AS (SELECT kk FROM k WHERE ne GROUP BY kk HAVING COUNT(*) > 400),
        |kept AS (SELECT doc_id, pos, line FROM k
        |  WHERE NOT (ne AND kk IN (SELECT kk FROM drops))),
        |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS ct
        |  FROM kept GROUP BY doc_id)
        |SELECT src.doc_id, COALESCE(agg.ct, '') AS clean_text
        |FROM src LEFT JOIN agg USING (doc_id)""".stripMargin

    // q73: bigram LM score — the prefix mass is a window over the gram
    // table partitioned by the first-space split (tokens are
    // whitespace-free by construction), summed PRE-prune; SUMs CAST
    // BIGINT (HUGEINT rule); LEFT JOIN from documents keeps <2-token
    // docs at n_bigrams=0
    m += "q73_lm_score" ->
      s"""WITH toks AS (SELECT doc_id, ${DuckSql.tokens("lower(text)")} AS w FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |  i -> w[i] || ' ' || w[i+1])) AS gram FROM toks),
         |cnt AS (SELECT gram, COUNT(*) AS c FROM bg GROUP BY gram),
         |lmw AS (SELECT gram, c, CAST(SUM(c) OVER
         |    (PARTITION BY string_split(gram, ' ')[1]) AS BIGINT) AS cp FROM cnt),
         |lm AS (SELECT gram, CAST(c * 1000 // cp AS BIGINT) AS p
         |  FROM lmw WHERE c >= 2),
         |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(COALESCE(p, 0)) AS BIGINT) AS sum_p
         |  FROM bg LEFT JOIN lm USING (gram) GROUP BY doc_id)
         |SELECT d.doc_id, CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(CASE WHEN sc.n_bigrams IS NULL THEN 0
         |       ELSE sum_p // sc.n_bigrams END AS BIGINT) AS mean_p_permille
         |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin

    // q69: md5 of the UTF-8 bytes is engine-neutral hex; FULL OUTER +
    // COALESCE mirrors Spark's USING-column join
    m += "q69_corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS old_hash FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS new_hash
        |  FROM documents WHERE doc_id % 3 <> 0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, old_hash, new_hash,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged' ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin

    // q70: COUNT stays BIGINT (only SUM goes HUGEINT); // ≡ Spark's
    // IntegralDivide for non-negative operands; ties break on the token
    // string (binary UTF-8 collation in both engines)
    m += "q70_group_keywords" ->
      s"""WITH t AS (SELECT lang AS grp, doc_id AS doc, unnest(${DuckSql.tokens("text")}) AS tok FROM documents),
         |tf AS (SELECT grp, tok, COUNT(*) AS tf FROM t GROUP BY grp, tok),
         |dfs AS (SELECT tok, COUNT(*) AS df_docs FROM (SELECT DISTINCT doc, tok FROM t) GROUP BY tok),
         |j AS (SELECT grp, tok, tf, df_docs, CAST(tf * 1000000 // df_docs AS BIGINT) AS weight
         |  FROM tf JOIN dfs USING (tok)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY weight DESC, tok ASC) AS "rank" FROM j)
         |SELECT grp, tok, tf, df_docs, weight, CAST("rank" AS BIGINT) AS "rank"
         |FROM r WHERE "rank" <= 5""".stripMargin

    // q66: the same RE2∩Java patterns, 'g' flag explicit (DuckDB replaces
    // first match only by default; Spark replaces all)
    m += "q66_strip_markup" ->
      s"""WITH mk AS (SELECT doc_id, CASE
         |    WHEN doc_id % 3 = 0 THEN '<div class=x>' || text || '</div><script type=js>var a=1;</script>'
         |    WHEN doc_id % 3 = 1 THEN '<p>' || text || ' &amp;amp; more&nbsp;text</p>'
         |    ELSE text END AS mtext FROM documents),
         |st AS (SELECT doc_id, mtext,
         |  trim(regexp_replace(
         |    replace(replace(replace(replace(replace(replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace(
         |            regexp_replace(mtext, '(?is)<script(>|[ \\t\\n\\x0B\\f\\r/][^>]*>).*?</script(>|[ \\t\\n\\x0B\\f\\r/][^>]*>)', ' ', 'g'),
         |            '(?is)<style(>|[ \\t\\n\\x0B\\f\\r/][^>]*>).*?</style(>|[ \\t\\n\\x0B\\f\\r/][^>]*>)', ' ', 'g'),
         |          '(?s)<!--.*?-->', ' ', 'g'),
         |        '</?[A-Za-z!?][^>]*>', ' ', 'g'),
         |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
         |      '&nbsp;', ' '), '&amp;', '&'),
         |    '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS clean FROM mk)
         |SELECT doc_id, clean, CAST(length(mtext) AS BIGINT) AS n_raw,
         |  CAST(length(clean) AS BIGINT) AS n_clean FROM st""".stripMargin

    // q65: the same quantized-dot replay as q26, thresholded cross-corpus
    // (QuantCols duplicated from q26's `quant`, which is declared later)
    val quantQ65 = "list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000) AS BIGINT))"
    m += "q65_semantic_contamination" ->
      s"""WITH bv AS (SELECT vec_id, $quantQ65 AS q FROM embeddings WHERE vec_id < 64),
         |tv AS (SELECT vec_id, $quantQ65 AS c FROM embeddings WHERE vec_id >= 64),
         |s AS (SELECT bv.vec_id AS bench_id, tv.vec_id AS train_id,
         |  CAST(list_sum(list_transform(list_zip(q, c), p -> p[1] * p[2])) AS BIGINT) AS score
         |  FROM bv, tv)
         |SELECT bench_id, train_id, score FROM s WHERE score >= 300000""".stripMargin

    // q64: range(reps) is empty for reps <= 0, so unnest drops zero-weight
    // rows exactly like the Spark filter; bucket replays sampleBucket
    m += "q64_epoch_mix" ->
      s"""WITH h AS (SELECT doc_id, source,
         |  ${DuckSql.rollingHash("'v1:' || coalesce(source, '') || ':' || coalesce(CAST(doc_id AS VARCHAR), '')")} AS h0
         |  FROM documents),
         |b AS (SELECT doc_id, source,
         |  CASE WHEN source = 'src0' THEN 3000 WHEN source = 'src1' THEN 1500
         |       WHEN source = 'src2' THEN 0 ELSE 800 END AS w,
         |  ${DuckSql.decisionMix("h0")} % 1000 AS bk
         |  FROM h),
         |r AS (SELECT doc_id, source,
         |  (w // 1000) + (CASE WHEN bk < (w % 1000) THEN 1 ELSE 0 END) AS reps FROM b)
         |SELECT doc_id, source, CAST(unnest(range(reps)) AS BIGINT) AS epoch
         |FROM r WHERE reps > 0""".stripMargin

    // q63: HUGEINT-exact products/'//' floor-division replay the Spark
    // long arithmetic; every aggregate is CAST AS BIGINT (dtype rule)
    m += "q63_tf_cosine" ->
      s"""WITH tk AS (SELECT doc_id, unnest(list_transform($toks,
         |    t -> ${DuckSql.rollingHash("t")})) AS h FROM documents),
         |tf AS (SELECT doc_id, h, CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY doc_id, h),
         |dfs AS (SELECT h, COUNT(*) AS df_count FROM tf GROUP BY h),
         |sem AS (SELECT tf.doc_id, tf.h, tf.tf, dfs.df_count
         |        FROM tf JOIN dfs USING (h) WHERE df_count <= 100),
         |norms AS (SELECT doc_id, CAST(SUM(tf*tf) AS BIGINT) AS n2 FROM sem GROUP BY doc_id),
         |p AS (SELECT sem.doc_id, h, tf, n2 FROM sem JOIN norms USING (doc_id)
         |      WHERE df_count >= 2),
         |pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot,
         |         CAST(MAX(a.n2) AS BIGINT) AS a_norm2, CAST(MAX(b.n2) AS BIGINT) AS b_norm2
         |       FROM p a JOIN p b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT a_id, b_id, dot, a_norm2, b_norm2,
         |  CAST((1000 * dot * dot) // (a_norm2 * b_norm2) AS BIGINT) AS cos2_permille
         |FROM pr WHERE (1000 * dot * dot) // (a_norm2 * b_norm2) >= 250""".stripMargin

    // q62: the Bloom sketch is routing only — the result IS the plain
    // anti join, so the oracle is the NOT EXISTS form verbatim
    m += "q62_bloom_anti" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderstatus = 'F' AND o.o_orderkey = l.l_orderkey)""".stripMargin

    // q61: COUNT(tgt.h) after the left join counts only matches (SQL
    // COUNT skips nulls — same as Spark count(__hit))
    m += "q61_target_affinity" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS w FROM documents),
         |tgt AS (SELECT DISTINCT ${DuckSql.rollingHash("w[i] || ' ' || w[i+1]")} AS h
         |  FROM (SELECT w, unnest(range(1, len(w))) AS i
         |        FROM t WHERE source = 'src0' AND len(w) >= 2)),
         |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)),
         |    i -> ${DuckSql.rollingHash("w[i] || ' ' || w[i+1]")}))) AS h
         |  FROM t WHERE source <> 'src0' AND len(w) >= 2),
         |a AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |    CAST(COUNT(tgt.h) AS BIGINT) AS n_in_target
         |  FROM g LEFT JOIN tgt ON g.h = tgt.h GROUP BY g.doc_id)
         |SELECT doc_id, n_grams, n_in_target,
         |  CAST(n_in_target * 1000 // n_grams AS BIGINT) AS target_affinity_permille
         |FROM a""".stripMargin

    // q60: HUGEINT `//` then CAST — integer-exact at any token-df mass,
    // mirroring the Spark perMille's IntegralDivide (no double anywhere)
    m += "q60_token_rarity" ->
      s"""WITH tk AS (SELECT doc_id,
         |  unnest(list_transform($toks, t -> ${DuckSql.rollingHash("t")})) AS h
         |  FROM documents),
         |dfreq AS (SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         |          FROM tk GROUP BY h)
         |SELECT tk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(df) * 1000 // COUNT(*) AS BIGINT) AS mean_token_df_x1000
         |FROM tk JOIN dfreq USING (h)
         |GROUP BY tk.doc_id""".stripMargin

    // q59: windowed SUM → CAST AS BIGINT (HUGEINT dtype discipline);
    // unique doc_id makes RANGE/ROWS frames agree
    m += "q59_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source, n_chars,
         |  CAST(len($toks) AS BIGINT) AS n_tokens FROM documents)
         |SELECT doc_id, source, n_tokens,
         |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
         |    AS BIGINT) AS cum_tokens,
         |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
         |    AS BIGINT) <= 800 AS kept
         |FROM t""".stripMargin

    // q58: rate = floor(sqrt(min_n/n)·1e9) — parts-per-billion buckets
    // (the permille grid silently extinguished groups beyond 1000× at
    // low α — see the operator scaladoc); sqrt and the ×1e9 multiply are
    // IEEE-correctly rounded on both engines, so the ppb rates match
    // exactly. The bucket comes from the Knuth-MIXED hash (the raw
    // polynomial's high bits are non-uniform; the product stays < 2^62,
    // exact in BIGINT). Nulls: coalesce mirrors the operator's
    // null-as-"" hash convention, and the IS NOT DISTINCT FROM join
    // mirrors its <=> rate join (no-op on this fixture, which has no
    // null lang/doc_id).
    m += "q58_temperature_mix" ->
      s"""WITH s AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         |r AS (SELECT lang,
         |  CAST(floor(sqrt((SELECT MIN(n) FROM s) * 1.0 / n) * 1000000000) AS BIGINT) AS keep_ppb
         |  FROM s),
         |h AS (SELECT doc_id, lang,
         |  ${DuckSql.rollingHash("coalesce(lang, '') || ':' || coalesce(CAST(doc_id AS VARCHAR), '')")} AS h0
         |  FROM documents)
         |SELECT h.doc_id, h.lang, r.keep_ppb,
         |  ${DuckSql.decisionMix("h0")} % 1000000000 < r.keep_ppb AS kept
         |FROM h JOIN r ON h.lang IS NOT DISTINCT FROM r.lang""".stripMargin

    // q56: q32's recursive component closure + a keep-best window on top
    m += "q56_canonical_pick" ->
      s"""WITH RECURSIVE ${DuckSql.shingleCtes},
         |${DuckSql.minhashCte(8)},
         |bands AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc AS a_id, b.doc AS b_id
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc < b.doc),
         |verified AS (SELECT a_id, b_id
         |  FROM cand JOIN hashed ha ON ha.doc_id = a_id JOIN hashed hb ON hb.doc_id = b_id
         |  WHERE (len(list_intersect(ha.hs, hb.hs)) * 1000 //
         |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))) >= 200),
         |edges AS (SELECT a_id AS src, b_id AS dst FROM verified
         |          UNION ALL SELECT b_id, a_id FROM verified),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
         |comp AS (SELECT id AS doc_id, MIN(r) AS component_id FROM reach GROUP BY id),
         |j AS (SELECT c.doc_id, c.component_id, d.n_chars
         |      FROM comp c JOIN documents d USING (doc_id)),
         |k AS (SELECT component_id, doc_id AS keep_id FROM (
         |  SELECT component_id, doc_id, row_number() OVER (
         |    PARTITION BY component_id ORDER BY n_chars DESC, doc_id ASC) AS rn
         |  FROM j) WHERE rn = 1)
         |SELECT j.doc_id, j.component_id, k.keep_id, j.doc_id = k.keep_id AS is_kept
         |FROM j JOIN k USING (component_id)""".stripMargin

    m += "q51_chunking" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents WHERE len($toks) > 0),
         |c AS (SELECT doc_id, w,
         |  unnest(range(0,
         |    CAST(floor((greatest(len(w) - 8, 1) - 1) / 24) AS BIGINT) + 1)) AS k FROM t)
         |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
         |  CAST(least(32, len(w) - k * 24) AS BIGINT) AS chunk_n_tokens,
         |  array_to_string(w[k * 24 + 1 : k * 24 + 32], ' ') AS chunk_text
         |FROM c""".stripMargin

    // q50: same rolling-hash gram space as q38/q54; span semantics mirror
    // q54's island merge (gap <= n on coverage, lag-flag running sum per
    // (bench, train) pair; the HUGEINT SUM is only a grouping key). Output
    // is all-scalar — the driver compare can only hash scalar columns.
    m += "q50_contamination_spans" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS w FROM documents),
         |bench AS (SELECT doc_id AS bench_id, unnest(list_distinct(
         |    list_transform(range(1, len(w) - 1),
         |      i -> ${DuckSql.rollingHash("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")}))) AS g
         |  FROM t WHERE source = 'src0' AND len(w) >= 3),
         |tr AS (SELECT train_id, CAST(i - 1 AS BIGINT) AS pos,
         |    ${DuckSql.rollingHash("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} AS g
         |  FROM (SELECT doc_id AS train_id, w, unnest(range(1, len(w) - 1)) AS i
         |        FROM t WHERE source <> 'src0' AND len(w) >= 3)),
         |j AS (SELECT b.bench_id, tr.train_id, tr.pos, tr.g
         |      FROM bench b JOIN tr ON b.g = tr.g),
         |ns AS (SELECT bench_id, train_id,
         |    CAST(COUNT(DISTINCT g) AS BIGINT) AS n_shared
         |  FROM j GROUP BY bench_id, train_id),
         |p AS (SELECT j.bench_id, j.train_id, ns.n_shared, j.pos,
         |    CASE WHEN j.pos - lag(j.pos) OVER (
         |        PARTITION BY j.bench_id, j.train_id ORDER BY j.pos) <= 3
         |      THEN 0 ELSE 1 END AS newg
         |  FROM j JOIN ns USING (bench_id, train_id) WHERE ns.n_shared >= 2),
         |s AS (SELECT bench_id, train_id, n_shared, pos, SUM(newg) OVER (
         |    PARTITION BY bench_id, train_id ORDER BY pos) AS grp FROM p)
         |SELECT bench_id, train_id, n_shared,
         |  MIN(pos) AS span_start, MAX(pos) + 3 AS span_end,
         |  CAST(COUNT(*) AS BIGINT) AS n_grams
         |FROM s GROUP BY bench_id, train_id, n_shared, grp""".stripMargin

    m += "q49_quality_gate" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w, ${DuckSql.tokens("lower(text)")} AS lw FROM documents),
         |base AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(CASE WHEN len(w) = 0 THEN 0 ELSE
         |    list_sum(list_transform(w, x -> length(x))) * 1000 // len(w) END AS BIGINT)
         |    AS mean_tok_len_permille,
         |  CAST(CASE WHEN len(w) = 0 THEN 0 ELSE
         |    len(list_filter(lw, x -> list_contains($enList, x))) * 1000 // len(w) END AS BIGINT)
         |    AS stopword_permille
         |  FROM t),
         |grams AS (SELECT doc_id, unnest(
         |  list_transform(range(1, len(w)), i -> ${DuckSql.rollingHash("w[i] || ' ' || w[i+1]")})) AS g
         |  FROM t WHERE len(w) >= 2),
         |counts AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g),
         |rep AS (SELECT doc_id, CAST(MAX(c) * 1000 // SUM(c) AS BIGINT) AS tg
         |        FROM counts GROUP BY doc_id)
         |SELECT b.doc_id, n_tokens, mean_tok_len_permille, stopword_permille,
         |  COALESCE(tg, 0) AS top_gram_permille,
         |  n_tokens < 30 AS too_short,
         |  n_tokens > 100000 AS too_long,
         |  mean_tok_len_permille < 3000 OR mean_tok_len_permille > 5000 AS bad_token_shape,
         |  stopword_permille < 20 AS low_stopword,
         |  COALESCE(tg, 0) > 100 AS repetitive,
         |  NOT (n_tokens < 30 OR n_tokens > 100000 OR
         |       mean_tok_len_permille < 3000 OR mean_tok_len_permille > 5000 OR
         |       stopword_permille < 20 OR COALESCE(tg, 0) > 100) AS keep
         |FROM base b LEFT JOIN rep r ON b.doc_id = r.doc_id""".stripMargin

    // q47: DuckDB regexes are RE2, Spark's are java.util.regex — the Pii
    // patterns are written in the portable intersection (ASCII classes, no
    // lookaround), and regexp_replace needs the explicit 'g' flag here.
    m += "q47_pii_scrub" ->
      s"""WITH p AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |    '@example.com or +1415555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         |    ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 ok'
         |  ELSE text END AS ptext FROM documents),
         |s AS (SELECT doc_id, ptext,
         |  regexp_replace(ptext, '${Pii.EmailPattern}', '<EMAIL>', 'g') AS after_email
         |  FROM p),
         |s2 AS (SELECT doc_id, ptext, after_email,
         |  regexp_replace(after_email, '${Pii.PhonePattern}', '<PHONE>', 'g') AS after_phone
         |  FROM s)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(ptext, '${Pii.EmailPattern}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(after_email, '${Pii.PhonePattern}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(after_phone, '${Pii.Ipv4Pattern}')) AS BIGINT) AS n_ipv4,
         |  len(regexp_extract_all(ptext, '${Pii.EmailPattern}')) +
         |    len(regexp_extract_all(after_email, '${Pii.PhonePattern}')) +
         |    len(regexp_extract_all(after_phone, '${Pii.Ipv4Pattern}')) > 0 AS has_pii,
         |  regexp_replace(after_phone, '${Pii.Ipv4Pattern}', '<IP>', 'g') AS scrubbed
         |FROM s2""".stripMargin

    m += "q48_hash_split" ->
      s"""WITH h AS (SELECT doc_id,
         |  ${DuckSql.rollingHash("'v1' || ':' || coalesce(CAST(doc_id AS VARCHAR), '')")} AS h0
         |  FROM documents),
         |b AS (SELECT doc_id, ${DuckSql.decisionMix("h0")} % 1000 AS bk FROM h)
         |SELECT doc_id,
         |  CASE WHEN bk < 900 THEN 'train' WHEN bk < 950 THEN 'val' ELSE 'test' END AS split
         |FROM b""".stripMargin

    m += "q38_contamination" ->
      s"""WITH ${DuckSql.shingleCtesN(3, Seq("source"))},
         |bench AS (SELECT doc_id AS bench_id, CAST(len(hs) AS BIGINT) AS bench_size,
         |          unnest(hs) AS h FROM hashed WHERE source = 'src0'),
         |train_i AS (SELECT doc_id AS train_id, unnest(hs) AS h FROM hashed
         |            WHERE source <> 'src0'),
         |keep AS (SELECT h FROM train_i GROUP BY h HAVING COUNT(*) <= 100),
         |tp AS (SELECT train_id, h FROM train_i JOIN keep USING (h))
         |SELECT bench_id, train_id, COUNT(*) AS n_shared, MAX(bench_size) AS bench_size,
         |  CAST(COUNT(*) * 1000 // MAX(bench_size) AS BIGINT) AS contaminated_permille
         |FROM bench JOIN tp USING (h)
         |GROUP BY bench_id, train_id
         |HAVING COUNT(*) >= 2""".stripMargin

    val quant = "list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000) AS BIGINT))"
    m += "q26_ann_topk" ->
      s"""WITH qv AS (SELECT vec_id, $quant AS q FROM embeddings WHERE vec_id < 64),
         |cv AS (SELECT vec_id, $quant AS c FROM embeddings),
         |scored AS (SELECT qv.vec_id AS query_id, cv.vec_id AS neighbor_id,
         |  CAST(list_sum(list_transform(list_zip(q, c), p -> p[1] * p[2])) AS BIGINT) AS score
         |  FROM qv, cv WHERE qv.vec_id <> cv.vec_id)
         |SELECT query_id, neighbor_id, rank, score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5""".stripMargin

    m += "q28_sessionize" ->
      """WITH base AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |                 THEN 1 ELSE 0 END AS is_new
        |  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sessions AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
        |  MIN(ts_us) AS first_ts_us, MAX(ts_us) AS last_ts_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sessions GROUP BY user_id, session_id""".stripMargin

    m += "q35_moving_agg" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS moving_sum,
        |  COUNT(*) OVER w AS n_in_frame,
        |  MAX(value) OVER w AS moving_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin

    // coalesce mirrors sampleBucket's null-as-"" convention (no-op here:
    // the fixture has no null lang/doc_id)
    m += "q36_stratified_sample" ->
      s"""WITH l AS (SELECT doc_id, ${DuckSql.langIdSql("text")} AS lang FROM documents),
         |h AS (SELECT doc_id, lang,
         |  ${DuckSql.rollingHash("coalesce(lang, '') || ':' || coalesce(CAST(doc_id AS VARCHAR), '')")} AS h0
         |  FROM l)
         |SELECT doc_id, lang FROM h
         |WHERE ${DuckSql.decisionMix("h0")} % 1000 <
         |      CASE WHEN lang = 'en' THEN 200 ELSE 500 END""".stripMargin

    m += "q33_asof_join" ->
      """WITH base AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER win AS click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
        |      OVER win AS click_ts_us
        |  FROM base
        |  WINDOW win AS (PARTITION BY user_id
        |    ORDER BY ts_us, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us, value,
        |       click_id, click_ts_us
        |FROM w WHERE event_type = 'purchase'""".stripMargin

    m += "q41_range_join" ->
      """WITH base AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us
        |      FROM base WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id AS c_user, ts_us AS click_ts_us
        |      FROM base WHERE event_type = 'click')
        |SELECT purchase_id, click_id, user_id, purchase_ts_us, click_ts_us
        |FROM p JOIN c ON user_id = c_user
        |  AND purchase_ts_us >= click_ts_us
        |  AND purchase_ts_us <= click_ts_us + 3600000000""".stripMargin

    m += "q29_media_meta" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        | CAST(1 + octet_length(CAST(text AS BLOB)) % 64 AS BIGINT) AS width,
        | CAST(1 + octet_length(CAST(text AS BLOB)) % 37 AS BIGINT) AS height,
        | 'utf8' AS format
        |FROM documents""".stripMargin

    m += "q45_media_features" ->
      s"""SELECT doc_id, CAST(j AS BIGINT) AS j,
         |  ${DuckSql.seededRollingHash("text", "j + 1")} % 1000 AS f_q
         |FROM documents, unnest(range(0, 8)) AS t(j)""".stripMargin

    m += "q30_frame_sample" ->
      """SELECT doc_id AS id, f AS frame_index,
        | CAST(floor(f * octet_length(CAST(text AS BLOB)) / 4) AS BIGINT) AS byte_offset
        |FROM documents, unnest([0, 1, 2, 3]) AS t(f)""".stripMargin

    m += "q31_embed_dup" ->
      s"""WITH v AS (SELECT vec_id, $quant AS e FROM embeddings)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  CAST(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2])) AS BIGINT) AS dot_q
         |FROM v a, v b
         |WHERE a.vec_id < 256 AND a.vec_id < b.vec_id
         |  AND CAST(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2])) AS BIGINT) >= 400000""".stripMargin

    // q27/q52 oracles: the sign-random-projection tables are DETERMINISTIC
    // integer arithmetic end to end (LshBucket projects the ⌊x·1000⌋
    // quantization through ±1 Rademacher planes as an exact BIGINT sum;
    // the plane-sign mix replays in HUGEINT — every term non-negative, so
    // bit 16 of the wrapped 64-bit product equals bit 16 of the exact
    // product), so DuckDB replays bucket assignment, the ≤2-bit
    // multi-probe XOR fan-out, candidate dedup, scoring and ranking
    // bit-for-bit. "Approximate" here means approximate NEAREST-NEIGHBOR
    // recall (SimilaritySpec pins it vs exact brute force) — the
    // algorithm itself is a pure function of the input.
    val bucketCte =
      s"""qv AS (SELECT vec_id, $quant AS e FROM embeddings),
         |pl AS (SELECT t.r AS t, j.r AS j, t.r*1024 + j.r AS pj
         |       FROM range(8) t(r), range(6) j(r)),
         |proj AS (
         |  SELECT qv.vec_id, pl.t, pl.j,
         |    SUM(CASE WHEN ((CAST(pl.pj*1000003 + d.r*19349663 + 12289 AS HUGEINT)
         |                    * 2654435761) // 65536) % 2 = 1
         |        THEN qv.e[d.r+1] ELSE -qv.e[d.r+1] END) AS pr
         |  FROM qv, range(64) d(r), pl
         |  GROUP BY qv.vec_id, pl.t, pl.j),
         |bk AS (SELECT vec_id, t, CAST(SUM(CASE WHEN pr > 0 THEN 1<<j ELSE 0 END) AS BIGINT) AS b
         |       FROM proj GROUP BY vec_id, t),
         |masks AS (SELECT unnest([${(0 until 64).filter(m => Integer.bitCount(m) <= 2).mkString(", ")}]) AS m),
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM bk q, masks ms, bk c
         |  WHERE q.vec_id < 64 AND c.t = q.t AND c.b = xor(q.b, ms.m)
         |    AND q.vec_id <> c.vec_id)""".stripMargin

    m += "q27_ann_lsh" ->
      s"""WITH $bucketCte,
         |scored AS (SELECT cand.query_id, cand.neighbor_id,
         |  CAST(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2])) AS BIGINT) AS score
         |  FROM cand JOIN qv a ON a.vec_id = cand.query_id
         |            JOIN qv b ON b.vec_id = cand.neighbor_id)
         |SELECT query_id, neighbor_id, rank, score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5""".stripMargin

    // int8 re-rank: codes = round(127·x/scale) in DOUBLE (exact widening
    // of float32, one IEEE multiply/divide, ties-away round — identical
    // in every engine); the score chain replays Spark's association order
    // ((dot·sa)·sb)/127², all IEEE-determined double ops
    m += "q52_ann_int8" ->
      s"""WITH $bucketCte,
         |i8 AS (SELECT vec_id,
         |    CAST(coalesce(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 0) AS REAL) AS s,
         |    embedding::DOUBLE[] AS e FROM embeddings),
         |codes AS (SELECT vec_id, s,
         |    CASE WHEN s = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
         |         ELSE list_transform(e, x -> CAST(round(x * 127.0 / CAST(s AS DOUBLE)) AS BIGINT))
         |    END AS c FROM i8),
         |scored AS (SELECT cand.query_id, cand.neighbor_id,
         |  ((CAST(list_sum(list_transform(list_zip(a.c, b.c), p -> p[1] * p[2])) AS DOUBLE)
         |    * CAST(a.s AS DOUBLE)) * CAST(b.s AS DOUBLE)) / 16129.0 AS score
         |  FROM cand JOIN codes a ON a.vec_id = cand.query_id
         |            JOIN codes b ON b.vec_id = cand.neighbor_id)
         |SELECT query_id, neighbor_id, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5""".stripMargin

    // q37_ann_ivf and q39_semdedup intentionally keep NO oracle: their
    // cell assignment is a TRAINED artifact (seeded MLlib k-means — float
    // iteration order an external engine cannot replay). The driver
    // records rows-only checks; SimilaritySpec / SemDedupSpec assert
    // recall, reconstruction error and soundness vs the exact forms.
    // Their PLAN PATHS, however, are hash-oracled by the q79/q80 twins
    // below: fixed centroids (= the first 16 corpus embeddings) make every
    // stage downstream of training closed-form integer arithmetic.

    // shared by q79/q80: (vector, cell) exact quantized dot + the
    // (score DESC, cell_id ASC) assignment ranking — the SQL replay of
    // Similarity.assignCells' array_sort over struct(-score, cell_id)
    val cellRankCte =
      s"""qv AS (SELECT vec_id, $quant AS e FROM embeddings),
         |cents AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, e AS ce FROM qv WHERE vec_id < 16),
         |cdots AS (SELECT qv.vec_id, cents.cell_id,
         |    CAST(list_sum(list_transform(list_zip(qv.e, cents.ce), p -> p[1] * p[2])) AS BIGINT) AS dq
         |  FROM qv, cents),
         |cranked AS (SELECT vec_id, cell_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dq DESC, cell_id) AS r
         |  FROM cdots)""".stripMargin

    m += "q79_ann_ivf_fixed" ->
      s"""WITH $cellRankCte,
         |ca AS (SELECT vec_id AS neighbor_id, cell_id FROM cranked WHERE r = 1),
         |qa AS (SELECT vec_id AS query_id, cell_id FROM cranked WHERE r <= 4 AND vec_id < 64),
         |scored AS (SELECT qa.query_id, ca.neighbor_id,
         |    CAST(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2])) AS BIGINT) AS score
         |  FROM qa JOIN ca USING (cell_id)
         |  JOIN qv a ON a.vec_id = qa.query_id
         |  JOIN qv b ON b.vec_id = ca.neighbor_id
         |  WHERE qa.query_id <> ca.neighbor_id)
         |SELECT query_id, neighbor_id, rank, score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5""".stripMargin

    // q80: overlap assignment (r <= nassign=3) → within-cell τ-pairs
    // (deduped — a pair can meet in up to nassign² shared cells) →
    // min-reachability closure (the q32 oracle pattern) → min-id keeper
    m += "q80_semdedup_fixed" ->
      s"""WITH RECURSIVE $cellRankCte,
         |asg AS (SELECT vec_id, cell_id FROM cranked WHERE r <= 3),
         |pairs AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
         |  FROM asg a JOIN asg b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         |  JOIN qv ea ON ea.vec_id = a.vec_id
         |  JOIN qv eb ON eb.vec_id = b.vec_id
         |  WHERE CAST(list_sum(list_transform(list_zip(ea.e, eb.e), p -> p[1] * p[2])) AS BIGINT) >= 400000),
         |edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
         |reach(id, rr) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.rr)
         |SELECT id AS vec_id, MIN(rr) AS component_id, id = MIN(rr) AS keep
         |FROM reach GROUP BY id""".stripMargin

    // q81: the same shingle-hash space as every dedup oracle; the dial
    // is plain SQL — df per hash over the per-doc DISTINCT shingles
    m += "q81_hot_shingles" ->
      s"""WITH ${DuckSql.shingleCtes}
         |SELECT h, COUNT(*) AS df_count
         |FROM (SELECT doc_id, unnest(hs) AS h FROM hashed)
         |GROUP BY h HAVING COUNT(*) > 5""".stripMargin

    m.result()
  }

  val oracleSql: Map[String, String] = mkOracles

  /** The two intentionally oracle-free queries (trained k-means cell
    * assignment — float iteration order an external engine cannot
    * replay): reason + the DECLARED output schema, so rows and schema
    * stay checkable and only the value hash is waived. Recall/soundness
    * live in SimilaritySpec / SemDedupSpec. */
  val rowsOnlyByDesign: Map[String, (String, Seq[(String, String)])] = Map(
    "q37_ann_ivf" -> (("IVF cell assignment is a trained k-means artifact; " +
      "recall vs exact top-k is pinned in SimilaritySpec and MEASURED in this " +
      "registered config (nlist=16, nprobe=8) at 0.819 recall@5 vs brute force " +
      "at sf0.1, chosen off the published recall-vs-nprobe curve " +
      "2/4/6/8/12/16 -> 0.33/0.57/0.72/0.82/0.94/1.00 (graft.tools.AnnRecallBench); " +
      "the PLAN PATH (assignment, probing, cell join, re-rank) is hash-oracled " +
      "end to end by the fixed-centroid twin q79_ann_ivf_fixed",
      Seq("query_id" -> "bigint", "neighbor_id" -> "bigint",
        "rank" -> "bigint", "score" -> "bigint"))),
    "q39_semdedup" -> (("SemDeDup cells are a trained k-means artifact; " +
      "soundness + recall vs the exact threshold graph are pinned in SemDedupSpec " +
      "and MEASURED in this registered config (nlist=16, nassign=3) at sf0.1: " +
      "0.850 of exact tau-pairs co-clustered, 0 soundness violations, chosen off " +
      "the published recall-vs-(nlist, nassign) surface — nassign 1/2/3/4 at " +
      "nlist=16 -> 0.238/0.605/0.850/0.959, all 12 swept configs violation-free " +
      "(graft.tools.AnnRecallBench); the PLAN PATH (overlap assignment, tau-pairs, " +
      "components, keeper) is hash-oracled end to end by the fixed-centroid twin " +
      "q80_semdedup_fixed",
      Seq("vec_id" -> "bigint", "component_id" -> "bigint", "keep" -> "boolean"))))
}
