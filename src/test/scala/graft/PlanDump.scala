package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Diagnostic main (test scope): regenerate PLANS.md — the formatted
  * physical plans of the scale-critical catalog queries, for plan
  * auditing without running the engine.
  *
  *   sbt "Test/runMain graft.PlanDump [sfDir] [outFile]"
  */
object PlanDump {
  val Audited: Seq[(String, String)] = Seq(
    "q01_agg" -> "hash agg: partial→final, codegen end-to-end, scan prunes to 3 columns",
    "q03_join_broadcast" -> "dim join: BroadcastHashJoin, pushed filter reaches the scan",
    "q04_join_sortmerge" -> "fact-fact join: SortMergeJoin on the shuffle keys",
    "q17_topk_global" -> "global top-k: TakeOrderedAndProject, never a full sort",
    "q41_dedup_minhash" -> "collapse → native signature kernel → band buckets → verify-first pair dedup → expansion",
    "q43_ngram_jaccard" -> "collapse → hashed inverted index (graft_hash60 keys) → capped posting lists → expansion",
    "q45_simhash_hamming" -> "collapse → two-level 14-bit band keys (exact at ham ≤ 3 by double pigeonhole) → capped buckets → expansion",
    "q51_ann_ivf" -> "IVF: k-means-trained centroids (fixed-point means, per-round LocalRelation), graft_topk(_,_,1) argmax keeps assignment in ObjectHashAggregate — no SortAggregate pair, partial-aggregates map-side before the shuffle",
    "q52_ann_lsh" -> "SRP ANN: graft_srpsig per-row sketch, vector-free Hamming pass, graft_topk candidate collapse, broadcast re-rank",
    "q64_tf_topterms" -> "explode→agg absorbed by partial aggregation, TakeOrderedAndProject limit",
    "q90_pipeline" -> "composed corpus build: stateless gates in the scan stage, 32-byte sha2 dedup shuffle, payload re-joined by canonical id",
    "q94_sequence_pack" -> "sequence packing: per-stratum running-sum window — one shuffle on the stratum key, never a global sort",
    "q95_decontaminate" -> "decontamination: tiny benchmark shingle set broadcast twice (semi + anti probe); the corpus itself never shuffles",
    "q98_pii_scrub" -> "PII scrubbing: stateless regexp_replace/extract chain — one scan; the only Exchange is Tables.spread's input repartition (fixture-only: a no-op once input files >= parallelism)",
    "q99_hash_split" -> "hash split: scan-stage CASE on the hash fraction, one tiny 3-group aggregate (plus the fixture-only spread repartition)",
    "q100_decontam_bloom" -> "bloom decontamination: the filter is a pre-built literal (index artifact); might_contain prunes every corpus shingle in the scan stage, the exact semi-join sees only survivors",
    "q103_json_multikey" -> "multi-key JSON: ONE schema-pruned JsonToStructs parse per row, then plain column arithmetic — no per-key get_json_object walks",
    "q104_chunk_overlap" -> "sliding-window chunking: per-row sequence+explode+slice in the scan stage — zero shuffles at any corpus size",
    "q105_embed_quantize" -> "int8 quantization: per-row HOF arithmetic (scale, codes, audit stats) in the scan stage — zero shuffles",
    "q106_fuzzy_incremental" -> "fuzzy incremental dedup: bipartite probe of the capped (band, bsig) corpus index — verify-before-pair-shuffle, no same-side candidates",
    "q108_vocab_coverage" -> "vocab coverage: hash-agg counts, TakeOrderedAndProject top-V (never a global sort), running-sum window over exactly V rows",
    "q109_topgram_concentration" -> "top-gram concentration: per-row HOF count-per-distinct-gram in the scan stage — zero shuffles",
    "q110_source_overlap" -> "source overlap matrix: one distinct shuffle on (source, shingle), per-shingle source SETS (bounded by #sources) expanded to pairs with map-side partial counts, per-source totals broadcast — the shingle table is never self-joined",
    "q111_length_profile" -> "length profile: one (source, bucket)-grain aggregate shuffle; both share windows run over the reduced #sources × #buckets grain",
    "q112_embed_outlier" -> "embed outliers: fixed-point per-label centroid aggregate, #labels centroid rows broadcast back, graft_topk bounded heap on the negated score — bottom-k collapses map-side, no ranking window over the corpus",
    "q113_gate_funnel" -> "gate funnel: all four gates are scan-stage predicates; one #sources-grain aggregate with a conditional distinct-sha2 count — the corpus is touched once",
    "q114_token_spectrum" -> "token spectrum: corpus-sized token hash-agg (map-side combinable), vocabulary-sized count-of-counts re-agg, broadcast 1-row totals",
    "q116_pack_sequences" -> "packed sequences: q94's per-lang hash-ordered running-sum window, then one (lang, bin)-grain assembly — per-group payload bounded by PackBudget tokens by construction",
    "q117_contam_report" -> "contamination report: benchmark shingle side broadcast, corpus never shuffles, only contamination-sized matches reach the (train, bench) edge aggregate",
    "q118_doc_surprisal" -> "doc surprisal: token hash-agg fits the unigram model once, the V-row fit ships as a map literal, scoring is a zero-shuffle per-row fold in the scan stage — no join back",
    "q119_curriculum" -> "curriculum binning: one map-side-combinable histogram shuffle, quantile windows over the 1025-bucket grain, broadcast equijoin back to docs — exact global quantiles with no global sort",
    "q120_dedup_attribution" -> "dedup attribution: cluster table (near-dup docs only) id-equijoined to documents twice, #sources2-grain aggregate — AQE broadcasts the small cluster side",
    "q121_mixture_sample" -> "mixture materialization: #sources-row model broadcast back to the scan, per-row hash Bernoulli + epoch explode — one corpus-sized shuffle (the shared token aggregate), output bounded by the token budget",
    "q122_stutter_scrub" -> "stutter scrub: index-lambda filter per row in the scan stage, zero shuffles at any corpus size",
    "q123_span_dup" -> "exact-substring span report: winnowing anchors + window hashing in the scan stage, ONE (h, doc_id) shuffle; the h-grain count is a window over that exchange — the anchor scan never runs twice",
    "q124_semdedup" -> "SemDeDup: q51 trained-centroid assignment (broadcast index) PERSISTED once (round 16 — the exchange-reuse the old plan claimed covered only the two self-join legs, leaving the flag join a third full build); both pairwise legs and the flag join read the cache, cluster-local Σ|c|² pairwise — no global pairwise anywhere",
    "q125_bm25" -> "BM25 retrieval: query-term set broadcast prunes corpus tokens in the scan stage, one matched-postings tf shuffle, df broadcast back, map-side-combinable fixed-point score aggregate, graft_topk bounded heap per query",
    "q126_span_scrub" -> "span scrub: q123's single h shuffle feeds count AND keeper from one window; scrub starts roll up doc-grain; the token mask is a scan-stage HOF over the rejoined text",
    "q127_dsir_weight" -> "DSIR selection: ONE conditional-count token hash-agg fits both unigram models, the merged ≤2V delta map ships as a literal, scoring + the 2^w integer resampling coin are a zero-shuffle scan-stage fold",
    "q128_hybrid_rrf" -> "hybrid RRF: each leg is its own bounded top-k pipeline (BM25 prune-at-scan, dense broadcast-probe); the fusion join + final window see only queries×k rows — integer fixed-point 2^20/(K+rk) fused score",
    "q129_cluster_profile" -> "cluster profile: broadcast k-row index probe, then (c_id, source)- and c_id-grain aggregates only — output ∝ k; dominant source via struct-min argmax, no ranking window; exact fixed-point means",
    "q130_bpe_merges" -> "BPE induction: ONE corpus scan into the word-vocab aggregate; each round localCheckpoints the vocab (lineage truncated) and the batched argmax accepts an exactness-proven disjoint prefix per driver trip; the learned merge table is the emitted LocalRelation artifact",
    "q131_bpe_fertility" -> "tokenizer fertility: merges apply at vocab grain (a fold of replaces in one projection); per-(source, word) counts from one scan; dictionary-sized vocab join; #sources-row output",
    "q132_hybrid_rrf_ivf" -> "hybrid RRF, IVF dense leg: lexical leg = q125's prune-at-scan pipeline over ONE persisted tokenized projection; dense leg probes the broadcast k-row trained-centroid index at 4/8 centroids — rerank touches ~probes/centroids of the corpus; all corpus-sized rankings are graft_topk bounded heaps, the only window is rrfFuse's over ≤2k rows/query",
    "q88_failed_actions" -> "audit failed-action report: XML envelope parse in the scan stage, returncode filter post-parse, (user, object)-grain hash-agg — low-cardinality output, no wide shuffle",
    "q89_ses_actions" -> "ses_actions decode: per-row 16-char mask split + posexplode + filter in the scan stage — zero shuffles at any audit-trail size",
    "q133_session_rollup" -> "per-login rollup: envelope parse in the scan stage, (db_user, userhost)-grain aggregate with distinct session/object counts — user×host-bounded output",
    "q134_knn_graph" -> "kNN graph: every vector probes the broadcast k-row trained-centroid index (bounded heap), candidates from ONE c_id equijoin against the assignment — Σ|c|² cluster-local, never n² — per-vector top-k collapses map-side through graft_topk",
    "q135_source_drift" -> "source drift: ONE persisted (source, token) aggregate feeds token totals, source totals, and the TVD term join; fixed-point BIGINT term sums (no float accumulation, no logs); broadcast 1-row grand total; #sources-row output",
    "q136_bpe_encode" -> "BPE encoding: words encode once at vocab grain (merge fold + symbol-id map literal); docs re-encode via one dictionary join on word (vocab ≪ corpus — broadcastable); the per-doc ordered reassembly is the only corpus-sized shuffle, and it IS the output",
    "q245_bpe_roundtrip" -> "BPE round-trip: encode-then-decode at VOCAB grain (symbol-id map + its inverse as literals — never a word-table lookup); one dictionary join + per-doc ordered reassembly (q136's shape); lossless pinned per doc against the whitespace-normalized original",
    "q137_mixture_temperature" -> "temperature mixture: one #sources-grain token aggregate, quantized sqrt weights (order-free BIGINT weight sum), broadcast 1-row total — q107's shape with derived instead of given weights",
    "q138_knn_outlier" -> "kNN outliers: q134's edge pipeline, vector-grain fixed-point mean aggregate, global bottom-K via the bounded heap in a SINGLE group (map-side collapse to ≤K per partition — no global sort), K-row broadcast flag join",
    "q139_semantic_clusters" -> "semantic clusters: thresholded kNN edges (bounded by k·KnnK) into the q101 closure kernel — min-label propagation rounds with eager lineage truncation; the final size join and singleton left-join are id-equijoins",
    "q140_contrastive_pairs" -> "triplet mining: kNN edges + two label equijoins, per-anchor positive/negative via struct-max CONDITIONAL aggregates — map-side collapse, no ranking window over the edge set",
    "q141_nb_sourceid" -> "NB classifier: the fit collapses to C map literals at build (one (source, token) hash-agg, C×V collected); the scoring plan is ONE scan-stage projection — C folds + array_sort over C structs, zero shuffles",
    "q142_event_transitions" -> "event transitions: per-user lag window on the user_id exchange (q32's sessionization shape), #types²-grain map-side-combined counts, broadcast #types-row normalizer join",
    "q143_containment" -> "containment pairs: q43's shared candidate core (exact-dup collapse, graft_hash60 inverted index, capped posting lists) with the c/min(na, nb) pair score — one extra column, zero extra shuffles",
    "q144_cluster_sample" -> "diversity sample: the q139 cluster table grouped per cluster_id through the graft_topk bounded heap on the md5 coin — map-side collapse, no corpus-wide ranking window",
    "q150_tfidf_keywords" -> "TF-IDF keywords: ONE (doc, term) hash-agg; df as a term-partition window over the same reduced table (no second corpus scan, no vocab broadcast); ranking window partitions by doc_id — every partition bounded by one doc's terms",
    "q151_snapshot_diff" -> "snapshot diff: md5 digests computed in the scan stage on BOTH sides, so the full-outer SortMergeJoin shuffles only (doc_id, digest) — never text; churn filter after the join keeps output ∝ change",
    "q152_graph_triangles" -> "triangle census: canonical a<b edge dedup off the kNN pipeline, wedge equijoin und⋈und (degree-bounded by 2·KnnK) closed by the (a,c) equijoin, per-vertex counts collapse map-side",
    "q153_chisq_independence" -> "chi-square: one (source, lang)-grain hash-agg; marginals re-aggregate the tiny cell table and join back as broadcasts; the only 1-row crosses are the grand total and the DECIMAL chi2 sum",
    "q154_pmi_collocations" -> "PMI collocations: unigram + bigram hash-aggs (map-side combinable) are the only corpus-sized shuffles; support floor filters BEFORE the two vocab-count joins; global top-K is TakeOrderedAndProject, never a full sort",
    "q156_gap_histogram" -> "gap histogram: one lag window on the user_id sessionization exchange, then a ≤64-bucket integer-log2 hash-agg; share via broadcast 1-row cross",
    "q157_key_skew" -> "key skew: per audited key one key-grain hash-agg, log2-bucket histogram, cumulative p99 window over ≤64 rows, 1-row total crosses",
    "q158_event_paths" -> "event paths: two leads share ONE window on the user_id exchange, #types³-grain map-side-combined counts, TakeOrderedAndProject top-K",
    "q159_transition_accuracy" -> "transition accuracy: #types²-grain counts → struct-min argmax → #types-row broadcast prediction join onto the lag-pair stream; no ranking window",
    "q160_ab_test" -> "A/B test: user-grain conversion max collapses map-side, #variants-grain stats, guarded z on a broadcast 1-row cross",
    "q161_daily_anomaly" -> "daily anomaly: one corpus-sized day hash-agg, spine left-join, trailing-window exact DECIMAL(38,0) sums at day grain, fixed-tree z projection",
    "q162_active_users" -> "active users: (day, user) distinct collapses the corpus first, ×7 coverage explode on the reduced table, two day-grain distinct aggregates — exact rolling distinct",
    "q163_salted_join" -> "salted skew join: the fact side salts each key over 8 deterministic shards (hash of the unique line identity), the dim replicates 8× via explode — the hot key's reducer load drops ~8×; result identical to the plain join",
    "q164_session_duration" -> "session durations: q32's one sessionization exchange, per-session min/max micros, ≤64-bucket integer-log2 re-aggregate, share via broadcast 1-row cross",
    "q165_personalized_pagerank" -> "personalized PageRank: q148's fixed-point iteration with the teleport base pinned to a broadcast |S|-row seed flag — per round one id-equijoin + map-side-combinable BIGINT sum, rank tables localCheckpoint-ed",
    "q166_activity_gini" -> "activity Gini: one (user, type) corpus hash-agg, count-of-counts re-aggregate, cumulative window at distinct-level grain partitioned by type, exact DECIMAL(38,0) rank-sum terms, one double tree at the end",
    "q167_activity_outliers" -> "Tukey outliers: one (user, day) corpus hash-agg, quartiles as integer order statistics off the count-of-counts cumulative (grain-bounded global window), broadcast 1-row fence cross, doubled-integer comparisons",
    "q168_conversion_attribution" -> "last-touch attribution: ONE user-partitioned IGNORE-NULLS window (q32's exchange), purchase filter, ≤3-arm hash-agg, share via broadcast 1-row cross",
    "q169_conversion_lag" -> "conversion lag: two chained user-grain min-ts hash-aggs, user-grain equijoin, ≤64-bucket integer-log2 re-aggregate, broadcast 1-row total",
    "q170_quantile_sketch" -> "quantile sketch: GK percentile_approx per group beside exact order statistics off the cents-grain cumulative window (partitioned by group, bounded by the price domain); all bracket joins are #groups-row broadcasts",
    "q171_linear_attribution" -> "linear attribution: purchase×touch pair join is a user-grain EQUI join with the lookback range as a join filter, per-purchase count over the p_id-partitioned bounded pair window, ≤4-arm aggregate",
    "q171b_capped_attribution" -> "capped attribution: the same user-grain pair join, then graft_topk bounded heap collapses per-purchase candidates to ≤ cap rows BEFORE the p_id shuffle — shuffled volume ≤ cap·#purchases under any hot-user density",
    "q172_group_split" -> "group split: scan-stage md5(source) coin — no group-table join; one #splits-grain aggregate with a distinct-source re-aggregate",
    "q173_split_leakage" -> "split leakage: q41's capped banded pair pipeline (≪ corpus) drives two doc-id equijoins against the scan-stage coin assignment; C(#splits,2)-grain output",
    "q174_ewma_baseline" -> "EWMA baseline: one corpus-sized day hash-agg, day-grain collect + aggregate-HOF fold (rows ∝ days), explode back to day grain — the sequential recurrence never touches corpus-sized data",
    "q177_column_profile" -> "column profile: ONE aggregate computes all per-column stats (exact NDVs via the standard multi-distinct Expand — the fixture-scale verification leg; the 100 TB serving stat is the one-pass HLL also in the row), 1-row result exploded to #cols rows driver-free",
    "q178_zorder_layout" -> "z-order layout: 1-row bounds broadcast, Morton key + bit-prefix bucket as scan-stage integer arithmetic (NO global sort anywhere), one ≤64-grain hash-agg",
    "q179_scd2_intervals" -> "SCD2 intervals: run starts + row_number + per-user total from windows on ONE user_id exchange; the lead window runs over run-start rows only and reuses the partitioning — a single corpus exchange end to end",
    "q180_token_diversity" -> "token diversity: per-doc sort + run-length fold as ONE scan-stage HOF projection — zero shuffles at any corpus size (the only Exchange is Tables.spread's fixture-only input rebalance)",
    "q181_cdc_compact" -> "CDC compaction: latest-wins via row_number on ONE user_id exchange (n_ops rides it) — never a max(struct) corpus aggregate dragging the string payload through a SortAggregate buffer",
    "q182_equidepth_hist" -> "equi-depth histogram: exact leg = distinct-cents cumulative (near-rows on this column — the fixture-scale verification harness; the GK sketch is the serving path), ONE theta probe of the broadcast 15-row rank table yields boundary+lo+hi, GK multi-quantile array in one corpus pass",
    "q183_kanon_report" -> "k-anonymity census: ONE quasi-identifier-grain hash-agg (map-side combinable), risky flag as a post-aggregate projection — output bounded by the QI domain, never rows",
    "q184_cusum_changepoint" -> "CUSUM change-point: q174's shape — one corpus-sized day hash-agg, two-sided integer fold at day grain (out array is the only accumulator: one copy of each recurrence), explode back to day grain",
    "q185_incremental_stats" -> "incremental stats: two filtered partial aggregates union into an O(#sources) merge re-aggregate — the daily-refresh cost is O(delta) + the merge, never a corpus rescan; all moments mergeable by construction",
    "q186_covisitation" -> "co-visitation: the capped (user, day, item) set PERSISTED once (round 16 — the ReusedExchange this prose used to claim never materialized in the executed plan), both pair legs read the cache, session-grain pair join, item-pair hash-agg with the coincidence floor after partial aggregation",
    "q187_join_cardinality" -> "join calibration: per audited join two key-grain hash-aggs + a key-grain equijoin compute the TRUE size as sum-of-products — the corpus-sized joined output never materializes; stats rows are 1-row crosses",
    "q188_tpch_q5" -> "six-way join (TPC-H Q5): all dimension legs BroadcastHashJoin, the single fact-fact edge is the only shuffle join, the one-year date cut is a PushedFilter on the orders scan, region prunes nations before any fact is touched",
    "q189_tpch_q3" -> "TPC-H Q3: customer is a broadcast LEFT SEMI that cuts orders BEFORE the one orderkey shuffle; date filters are PushedFilters on both fact scans; top-10 is TakeOrderedAndProject on the exact-integer revenue",
    "q194_tpch_q13" -> "TPC-H Q13: priority filter inside the outer join (no-match customers kept as zeros), custkey-grain count, second aggregate at order-count grain — bounded by max orders/customer, never rows",
    "q198_sole_delay" -> "TPC-H Q21 shape: EXISTS and NOT-EXISTS are orderkey-equi semi/anti SortMergeJoins with the supplier inequality as join residual — never a per-row subquery or nested loop; supplier name resolves via broadcast after the correlations prune",
    "q200_embed_gram" -> "exact Gram matrix: ONE graft_gram TypedImperativeAggregate pass (2080-long buffer per partition, map-side merged) — never n·d²/2 product rows through the shuffle; the (i,j) index map is a broadcast LocalRelation",
    "q201_dq_report" -> "DQ audit: row-grain checks are scan-stage conditional sums collapsing to 1-row aggregates; the PK check's multi-column distinct is the one Expand; FK is a key-projected LeftAnti equi join; #checks-row output",
    "q202_record_linkage" -> "blocked linkage: the (nationkey, mktsegment) blocking keys drive a pure equi self-join (Σ block², never n²); the length-gap guard and levenshtein run as post-join filters on block-pair survivors only",
    "q203_ks_drift" -> "KS drift: rows collapse to (source, len) grain in one hash-agg; the zero-filled grid is #sources × distinct-lengths (value-domain-bounded); the CDF cumulative partitions per source; BIGINT cross-multiplied numerator, one division",
    "q204_ols_fit" -> "per-group OLS: six integer moments in ONE map-side-combinable codegen hash-agg over ONE lineitem scan; slope/intercept/R² are post-aggregate projections from the shared OlsDerived template",
    "q205_score_auc" -> "ranking AUC: corpus collapses to score-value grain in one hash-agg; the cum-negatives window runs over DISTINCT scores only; 2U and the counts are exact BIGINTs, AUC one division",
    "q208_trend_mk" -> "Mann–Kendall: the one corpus-sized pass is the day hash-agg; the sign-pair theta join runs at day grain with both sides post-aggregate broadcast-sized",
    "q209_spearman" -> "Spearman: one orders scan → customer-grain agg; midrank maps are value-domain cumulatives equi-joined back; the five moments collapse in one hash-agg; rho = shared ÷/×/sqrt template",
    "q210_retrieval_eval" -> "retrieval eval: rides q125's bounded-heap ranking; judgments join k×Q rows to the broadcast query frame; the relevance-total arm is a lang-grain count against ≤Q broadcast rows",
    "q212_dominant_direction" -> "PCA direction: the fit (power iteration) ran at build time over the collected gram triangle; the SERVED plan is a zero-shuffle scan-stage integer dot against the broadcast direction literal",
    "q218_tpch_q1" -> "TPC-H Q1: ONE full-fact scan into ONE map-side-combinable codegen hash-agg (partial→final) at 2-key grain; shipdate cut is a PushedFilter; averages are post-aggregate projections from the shared Q1Derived template",
    "q220_tpch_q15" -> "TPC-H Q15: quarterly supplier revenue aggregated ONCE (date PushedFilter → suppkey exchange); the 1-row max broadcasts back over the view (no second lineitem scan); supplier names broadcast",
    "q221_tpch_q17" -> "TPC-H Q17: correlated scalar-average decorrelated — per-part (count, Σqty) joins back at part grain; BOTH legs semi-cut by the broadcast brand filter before the partkey shuffle; threshold is the exact cross-multiply, never a float mean",
    "q222_tpch_q19" -> "TPC-H Q19: the disjunction's quantity hull is a PushedFilter on the lineitem scan (Catalyst can't extract it from the OR); brand/size hull prunes part before the broadcast; the full disjunction is the join residual",
    "q223_tpch_q20" -> "TPC-H Q20 shape: part broadcasts semi into the fact BEFORE the (suppkey, partkey) aggregate; the HAVING-sparse qualifying set semi-cuts supplier — a double-nested semi chain, one 2-key exchange",
    "q225_residual_norms" -> "residual norms: fit shared with q212 (driver-side, collected triangle); the SERVED plan is two scan-stage integer dots (norm2, proj) against the broadcast direction literal plus the shared-template IEEE projection — zero shuffles",
    "q228_tpch_q2" -> "TPC-H Q2: region slice of supplier broadcasts; ONE lineitem scan and ONE partkey exchange feed both the (part,supplier,cost) distinct (partkey clustering satisfies the wider grouping) and the per-partkey window min — the min-rejoin collapses to filter-on-window, no second distinct subtree (round-15 fix); part joins UNHINTED (AQE: BHJ at fixture, SMJ past broadcast size); top-100 is TakeOrderedAndProject",
    "q229_tpch_q4" -> "TPC-H Q4: correlated EXISTS as an orderkey-equi LEFT SEMI with the shipdate-vs-orderdate comparison as join residual — never a per-row subquery; the quarter cut is a PushedFilter on the orders scan",
    "q230_tpch_q9" -> "TPC-H Q9: widget cut prunes part before its partkey join; supplier→nation broadcasts; ONE orderkey exchange joins orders; signed profit accumulates in DECIMAL(38,0) (nation×year grain is corpus-sized at 100 TB)",
    "q231_tpch_q11" -> "TPC-H Q11: region slice broadcasts semi into the fact; ONE partkey exchange; the 1-row (Σ, n) frame broadcasts back over the part-grain aggregate; threshold is the DECIMAL(38,0) cross-multiply, never a float fraction",
    "q232_tpch_q16" -> "TPC-H Q16: ONE pair-grain distinct exchange (the measure is defined over distinct pairs), complaint set broadcast LeftAnti, part at partkey grain, then a (brand, type, size) count-distinct re-aggregate",
    "q233_tpch_q21" -> "TPC-H Q21: EXISTS + NOT-EXISTS as orderkey-equi semi/anti joins with the suppkey inequality as residual (q198's rule); the late pair set is persisted ONCE (InMemoryTableScan on the probe base and the anti build — the join+distinct subtree is never rebuilt, round-15 fix); top-100 is TakeOrderedAndProject",
    "q234_tpch_q22" -> "TPC-H Q22: the 1-row (Σ, n) positive-balance frame broadcasts over the customer scan; the scalar-average compares as the exact integer cross-multiply; no-recent-orders is a custkey-equi LeftAnti against the date-pruned orders projection",
    "q235_minhash_accuracy" -> "minhash estimator audit: q41's plan minus the τ filter — one capped (band, bsig) shuffle with signatures + hashed sets riding it; est32 and exact Jaccard are both computed map-side per bucket pair, the pair-dedup shuffle carries 24 bytes",
    "q236_robust_mad" -> "robust MAD gate: ONE corpus scan → map-side-combinable (source, length) aggregate; medians via cumulative windows at value-domain grain (partitioned by source); deviation re-grain and outlier count never touch per-document rows again",
    "q237_brier_score" -> "Brier score: q206's 1-row (mn, den) broadcast frame over the scan, exact integer residual per row, DECIMAL(38,0) SSE in one source-grain hash-agg, the division a post-aggregate shared-template projection",
    "q238_fusion_rbo" -> "fusion RBO: both rankings are ≤k rows per query by construction (q128's bounded legs); the overlap join, suffix-weight broadcast, and per-query fold all run at query grain — nothing corpus-sized past the legs",
    "q239_winsorized_mean" -> "winsorized mean: ONE fact scan → (priority, cents) aggregate; exact-rank p05/p95 via cumulative windows at value-domain grain; the clamp and DECIMAL(38,0) sum run on the reduced grain; boundary tables broadcast",
    "q240_topk_churn" -> "top-k churn: ONE event scan → (day, user) hash-agg; per-day top-5 collapses through the graft_topk bounded heap (O(k) state per day — never a per-day ranking sort); day-pair RBO at ≤#days×k grain with the broadcast weight table",
    "q241_brier_decomposition" -> "Murphy decomposition: one corpus scan → decile-grain hash-agg; per-bin terms are fixed shared IEEE DAGs; the bin-ordered folds run over ≤10-element arrays; three 1-row broadcast crosses, nothing corpus-sized after the bin aggregate",
    "q242_ann_rank_fidelity" -> "ANN rank fidelity: both legs are the audited q50/q51 plans (broadcast query batch, k-centroid probe, bounded heaps); the overlap join, weight broadcast, and per-query fold all run at ≤Q×k grain",
    "q243_gains_table" -> "gains table: one corpus scan → decile hash-agg; the best-first cumulative is an intentional global window over the ≤10-row decile grain; capture/lift are post-aggregate shared-template projections",
    "q244_calibration_error" -> "ECE/MCE: one corpus scan → decile hash-agg; ECE folds the ≤10 bin terms in bin order (cross-engine-exact ordered sum), MCE is an order-free max; two 1-row broadcast crosses",
    "q246_corpus_sink_roundtrip" -> "CorpusSink round-trip: ONE documents scan into the salted lang-partitioned write (shard column exists only to spread the exchange, dropped before the files), read-back aggregates at lang grain — per-partition sorted-digest sha2, file-count bound as a post-aggregate predicate")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# Physical plans of the scale-critical queries\n\n")
    sb.append("Generated by `sbt \"Test/runMain graft.PlanDump\"` — regenerate after\n")
    sb.append("plan-shape changes. `PlanSpec` asserts the load-bearing properties\n")
    sb.append("(broadcast/SMJ choice, pushdown, pruning, codegen, no unintended\n")
    sb.append("CartesianProduct/BNLJ) on every catalog query; this file is the\n")
    sb.append("human-readable audit trail.\n")
    Audited.foreach { case (name, note) =>
      // per-entry cache isolation: an earlier entry's persist must not
      // rewrite a later entry's dumped plan via useCachedData
      spark.sharedState.cacheManager.clearCache()
      val df = queries.Catalog.all(name).build(spark, sfDir)
      val scans = PlanLint.renderScanCounts(
        PlanLint.factScanCounts(df.queryExecution.optimizedPlan))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n$note\n\nscans: $scans\n\n```\n$plan```\n")
    }
    // Fact-scan count pins for EVERY catalog entry (round-16 verdict
    // item 2): PlanSpec asserts these exact counts, so any regression
    // that adds a fact re-scan fails the suite even when the duplicated
    // subtree is not canonically equal (the shape the dup lint can't
    // key on).
    sb.append("\n## Fact-scan counts (all catalog entries)\n\n")
    sb.append("One line per entry: how many times each fact table's file is\n")
    sb.append("scanned in the optimized plan (distinct cache builds counted\n")
    sb.append("once, cache reads free; `-` = no fact scan). Asserted exactly\n")
    sb.append("by PlanSpec — regenerate this file after intentional plan\n")
    sb.append("changes.\n\n```\n")
    queries.Catalog.all.keys.toSeq.sorted.foreach { name =>
      spark.sharedState.cacheManager.clearCache()
      val df = queries.Catalog.all(name).build(spark, sfDir)
      val scans = PlanLint.renderScanCounts(
        PlanLint.factScanCounts(df.queryExecution.optimizedPlan))
      sb.append(s"$name $scans\n")
    }
    sb.append("```\n")
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote ${Audited.size} plans + " +
      s"${queries.Catalog.all.size} scan-count pins to $out")
    spark.stop()
  }
}
