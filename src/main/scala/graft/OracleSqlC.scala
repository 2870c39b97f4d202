package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import OracleFns._
import OracleFnsTrained._

/** corpus-curation/ANN/text-audit oracle SQL (split from SparkEntry - part C).
  *
  * Same package, no behavior change: [[SparkEntry.oracleSql]] is the
  * concatenation of the four parts; shared SQL builders live in
  * [[OracleFns]].
  */
private[graft] object OracleSqlC {
  private[graft] val sql: Map[String, String] = Map(

    // Stupid-backoff bigram scoring: pair counts, the vocab cut, and
    // which branch each token takes (first / seen-pair / backoff) are
    // all exact-integer decisions, so both engines walk the same
    // branches; ln drift + sum regrouping absorbed by the rounding.
    "lm_bigram_cross_entropy" ->
      s"""WITH $bigramCeCtes
        |SELECT d.doc_id, CAST(COALESCE(nt, 0) AS INTEGER) AS n_tokens,
        |  COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS cross_entropy
        |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    "lm_kn_cross_entropy" ->
      s"""WITH $knCeCtes
        |SELECT d.doc_id, CAST(COALESCE(nt, 0) AS INTEGER) AS n_tokens,
        |  COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS cross_entropy
        |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    // D80: the train_split CASE gates which docs feed the model CTEs
    // (train fold) and which get scored (val fold); the scoring
    // branches and association are lm_bigram's. The split joins at
    // the DOC level once and rides the token explosion as a column —
    // joining the inlined hash chain against token rows made DuckDB
    // re-evaluate it per probe and OOM.
    "holdout_perplexity" ->
      s"""WITH h AS (
        |  SELECT doc_id, $xxhBucket AS bucket
        |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")})),
        |sp AS (
        |  SELECT doc_id, CASE WHEN bucket < 900000 THEN 0
        |                      WHEN bucket < 950000 THEN 1 ELSE 2 END AS split
        |  FROM h),
        |d0 AS (
        |  SELECT d.doc_id, sp.split, CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\\s+')
        |    ELSE CAST([] AS VARCHAR[]) END AS tk
        |  FROM documents d JOIN sp ON sp.doc_id = d.doc_id),
        |tok AS (
        |  SELECT doc_id, split,
        |    unnest(list_transform(tk, (w, i) -> struct_pack(i := i, w := w))) AS s
        |  FROM d0),
        |tw AS (SELECT doc_id, split, s.i AS i, s.w AS w FROM tok),
        |twt AS (SELECT doc_id, i, w FROM tw WHERE split = 0),
        |cnt AS (SELECT w, COUNT(*) AS c FROM twt GROUP BY w),
        |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 64),
        |dn AS (SELECT CAST((SELECT SUM(c) FROM cnt)
        |  + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS d),
        |laggedt AS (
        |  SELECT doc_id, i, w,
        |    lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM twt),
        |pc AS (
        |  SELECT l.prev AS v, l.w AS w, COUNT(*) AS c
        |  FROM laggedt l
        |  JOIN top tv ON tv.w = l.prev JOIN top tc ON tc.w = l.w
        |  WHERE l.prev IS NOT NULL GROUP BY l.prev, l.w),
        |laggedv AS (
        |  SELECT doc_id, i, w,
        |    lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM tw WHERE split = 1),
        |lp AS (
        |  SELECT l.doc_id,
        |    CASE WHEN l.prev IS NULL THEN
        |      COALESCE(ln(CAST(tc.c + 1 AS DOUBLE) / d), ln(1.0 / d))
        |    ELSE
        |      COALESCE(ln(CAST(pc.c AS DOUBLE) / CAST(tv.c AS DOUBLE)),
        |        ln(0.4) + COALESCE(ln(CAST(tc.c + 1 AS DOUBLE) / d), ln(1.0 / d)))
        |    END AS lnS
        |  FROM laggedv l
        |  LEFT JOIN top tc ON tc.w = l.w
        |  LEFT JOIN top tv ON tv.w = l.prev
        |  LEFT JOIN pc ON pc.v = l.prev AND pc.w = l.w
        |  CROSS JOIN dn),
        |s AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnS) AS sl
        |      FROM lp GROUP BY doc_id)
        |SELECT d.doc_id, CAST(COALESCE(nt, 0) AS INTEGER) AS n_tokens,
        |  COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS cross_entropy
        |FROM (SELECT doc_id FROM d0 WHERE split = 1) d
        |LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // Perplexity filter: the bigram CE pipeline above + a per-language
    // exact-integer rank cut on the rounded score (id tiebreak), so
    // both engines place the 70% boundary identically.
    "perplexity_filter" -> perplexityFilterSql,

    // E12: thresholds derived from the same replay (max kept CE per
    // language), the <= rule applied identically — boundary ties are
    // defined the same way in both engines
    "stream_perplexity_gate" ->
      s"""WITH pf AS (${perplexityFilterSql.replace("ORDER BY doc_id", "")}),
        |thr AS (SELECT lang, max(cross_entropy) AS max_ce
        |        FROM pf WHERE kept GROUP BY lang)
        |SELECT p.doc_id, p.lang, p.cross_entropy
        |FROM pf p JOIN thr t
        |  ON p.lang = t.lang AND p.cross_entropy <= t.max_ce
        |ORDER BY p.doc_id""".stripMargin,

    // D74: exact 30-char windows on both sides, joined on the gram
    // string — pure substring algebra identical in ANSI SQL (the
    // Spark side's rolling-hash nomination is an optimization the
    // exact verify erases from the result).
    "decontamination_char" ->
      """WITH cg AS (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 30) AS gram
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, greatest(len(text) - 28, 1))) AS i
        |        FROM documents WHERE doc_id % 10 <> 0)),
        |bg AS (
        |  SELECT DISTINCT substr(text, CAST(i AS INTEGER), 30) AS gram
        |  FROM (SELECT text,
        |          unnest(range(1, greatest(len(text) - 28, 1))) AS i
        |        FROM documents WHERE doc_id % 10 = 0))
        |SELECT doc_id, COUNT(*) AS n_shared_grams
        |FROM cg JOIN bg USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Exact char-level span dedup: positions covered by a repeated
    // substring of length >= 30 equal positions covered by a repeated
    // exact-30 gram (the suffix-array reduction — SuffixDedup scaladoc),
    // and gram counting / coverage / positional rewrite are plain
    // integer-and-substring algebra identical in ANSI SQL.
    "dedup_char_spans" ->
      """WITH occ AS (
        |  SELECT doc_id,
        |    unnest(range(1, greatest(len(text) - 28, 1))) AS pos,
        |    unnest(list_transform(range(1, greatest(len(text) - 28, 1)),
        |      i -> substr(text, CAST(i AS INTEGER), 30))) AS gram
        |  FROM documents),
        |hot AS (SELECT gram FROM occ GROUP BY gram HAVING COUNT(*) >= 2),
        |cov AS (
        |  SELECT doc_id, list(DISTINCT cp) AS cov FROM (
        |    SELECT doc_id, unnest(range(pos, pos + 30)) AS cp
        |    FROM occ JOIN hot USING (gram))
        |  GROUP BY doc_id),
        |fin AS (
        |  SELECT d.doc_id, d.text,
        |    -- array_to_string([]) is NULL in duckdb, not '' — coalesce
        |    COALESCE(array_to_string(list_transform(
        |      list_filter(range(1, len(text) + 1),
        |        i -> NOT list_contains(COALESCE(cov, CAST([] AS BIGINT[])), i)),
        |      i -> substr(text, CAST(i AS INTEGER), 1)), ''), '') AS clean_text
        |  FROM documents d LEFT JOIN cov USING (doc_id))
        |SELECT doc_id, clean_text,
        |  CAST(len(text) - len(clean_text) AS INTEGER) AS n_removed
        |FROM fin ORDER BY doc_id""".stripMargin,

    "sequence_pack" ->
      """SELECT doc_id, doc_id % 8 AS bucket,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |  CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)) OVER (
        |    PARTITION BY doc_id % 8 ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS start_offset,
        |  CAST(FLOOR((SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)) OVER (
        |    PARTITION BY doc_id % 8 ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - len(string_split_regex(trim(text), '\s+'))) / 512.0) AS BIGINT) AS shard
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the NFD fold mirrored: same (neglen, id) sort, same left fold.
    // The accumulator is ONE FLAT BIGINT list — [fill, shard, (id,
    // len, shard, off)×docs] — because a struct accumulator silently
    // drops its LIST field between list_reduce steps in this DuckDB
    // (scalar fields accumulate, list fields reset); the flat-list
    // fold is the same proven shape as vocab_tokenize_ids. All-integer
    // arithmetic — exact.
    "sequence_pack_nextfit" ->
      s"""WITH $nextFitChain
         |SELECT doc_id, bucket, n_tokens, shard, "offset"
         |FROM pk ORDER BY doc_id""".stripMargin,

    // D73: the waste ledger of the D43 packer — shard counts, token
    // mass, capacity and utilization per bucket, all exact integers
    // over the SAME fold chain (utilization is one divide, 6-dp).
    "packing_efficiency" ->
      s"""WITH $nextFitChain
         |SELECT bucket,
         |  CAST(MAX(shard) + 1 AS BIGINT) AS n_shards,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST((MAX(shard) + 1) * 512 AS BIGINT) AS capacity_tokens,
         |  CAST((MAX(shard) + 1) * 512 - SUM(n_tokens) AS BIGINT)
         |    AS waste_tokens,
         |  ROUND(CAST(SUM(n_tokens) AS DOUBLE)
         |    / CAST((MAX(shard) + 1) * 512 AS DOUBLE), 6) AS utilization
         |FROM pk GROUP BY bucket ORDER BY bucket""".stripMargin,

    "source_quota" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn <= 12 ORDER BY source, doc_id""".stripMargin,

    "ann_bruteforce_topk" -> bruteForceOracle,

    // D87: the brute-force cosine chain (bit-exact IEEE folds, see
    // bruteForceOracle) with the τ filter BEFORE the rank window —
    // identical cos bits make the cut decision engine-invariant
    // per-corpus-row argmax over the bench: the Spark fold keeps the
    // FIRST max in bid-ascending order = ORDER BY cos DESC, bid pick;
    // cosine bits are the D6 fold, so the tau cut cannot diverge
    "decontamination_semantic" ->
      """WITH b AS (
        |  SELECT vec_id AS bid, embedding AS bv FROM embeddings
        |  WHERE vec_id % 100 = 0),
        |c AS (
        |  SELECT vec_id AS id, embedding AS v FROM embeddings
        |  WHERE vec_id % 100 <> 0),
        |s AS (
        |  SELECT id, bid,
        |    list_reduce(list_transform(range(1, len(v) + 1),
        |      i -> CAST(v[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE)),
        |      (a, x) -> a + x) AS dot,
        |    list_reduce(list_transform(range(1, len(v) + 1),
        |      i -> CAST(v[i] AS DOUBLE) * CAST(v[i] AS DOUBLE)),
        |      (a, x) -> a + x) AS na,
        |    list_reduce(list_transform(range(1, len(v) + 1),
        |      i -> CAST(bv[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE)),
        |      (a, x) -> a + x) AS nb
        |  FROM c CROSS JOIN b),
        |sc AS (
        |  SELECT id, bid,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
        |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM s),
        |r AS (
        |  SELECT id, bid, cos,
        |    row_number() OVER (PARTITION BY id ORDER BY cos DESC, bid) AS rk
        |  FROM sc)
        |SELECT id, bid AS bench_id, cos AS max_cos,
        |  (cos >= 0.35) AS contaminated
        |FROM r WHERE rk = 1 ORDER BY id""".stripMargin,

    "hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |s AS (
        |  SELECT qid, e.vec_id AS id,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS dot,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS na,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS nb
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |c AS (
        |  SELECT qid, id,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
        |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM s),
        |r AS (
        |  SELECT qid, id, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
        |  FROM c WHERE cos < 0.35)
        |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,

    "ann_matryoshka_report" -> matryoshkaOracle(16, 40, 10),

    "mmr_diversified_topk" -> mmrOracle(10, 50),

    // RRF fusion of the two already-oracled legs: BM25 rank list ×
    // dense-cosine rank list (query vector 0), fused as
    // Σ 1/(60+rank) with absent legs contributing 0. Ranks are exact
    // integers, the sum is a fixed two-term double fold, and the
    // 9-dp round runs before ORDER BY on both sides — the cut cannot
    // diverge.
    "hybrid_search_rrf" ->
      s"""WITH bm AS (${bm25Oracle(
             graft.queries.WarehouseQueries.Bm25Terms, 50, 1.2, 0.75)}),
        |bmr AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
        |      AS bm25_rank
        |  FROM bm),
        |bf AS ($bruteForceOracle),
        |dr AS (SELECT id AS doc_id, rk AS dense_rank FROM bf WHERE qid = 0),
        |f AS (
        |  SELECT COALESCE(bmr.doc_id, dr.doc_id) AS doc_id,
        |    bm25_rank, dense_rank
        |  FROM bmr FULL OUTER JOIN dr ON bmr.doc_id = dr.doc_id)
        |SELECT doc_id, bm25_rank, dense_rank,
        |  round((CASE WHEN bm25_rank IS NULL THEN 0.0
        |              ELSE 1.0 / (60.0 + CAST(bm25_rank AS DOUBLE)) END)
        |      + (CASE WHEN dense_rank IS NULL THEN 0.0
        |              ELSE 1.0 / (60.0 + CAST(dense_rank AS DOUBLE)) END), 9)
        |    AS rrf
        |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // The capstone composition, end to end in SQL: URL-level dedup
    // (round 17 — see corpusPipelineChain's corp0→corp note), quality
    // formula, exact dedup (min-id per text), near-dup transitive closure (the
    // engine's LSH candidates are complete on gate data at the 0.8
    // bar — same argument as dedup_incremental), 8-gram
    // decontamination against the eval slice, language id, and the
    // portable-XXH64 hash split. Every stage is the already-oracled
    // formulation; their composition oracles the whole pipeline.
    "corpus_pipeline" ->
      s"""WITH RECURSIVE
        |$corpusPipelineChain,
        |lang AS (
        |  SELECT doc_id, $langCase AS lang
        |  FROM (
        |    SELECT doc_id,
        |      len(list_filter(tk, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS he,
        |      len(list_filter(tk, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS hf,
        |      len(list_filter(tk, x -> list_contains(['der','die','und','das','ein','nicht'], x))) AS hd,
        |      len(list_filter(tk, x -> list_contains(['el','los','y','que','un','una','en'], x))) AS hs
        |    FROM clean)),
        |hb AS (
        |  SELECT doc_id, $xxhBucket AS bucket
        |  FROM (${xxh64Nested("SELECT doc_id FROM clean", "doc_id")}))
        |SELECT l.doc_id, l.lang,
        |  CASE WHEN hb.bucket < 900000 THEN 0
        |       WHEN hb.bucket < 950000 THEN 1 ELSE 2 END AS split
        |FROM lang l JOIN hb USING (doc_id)
        |ORDER BY l.doc_id""".stripMargin,

    // D72: the same CTE chain, counted per stage. Default config keeps
    // everything after decontamination (no quota, keep-all mixture),
    // so stages 5-7 mirror stage 4's count — exactly what the Spark
    // audit reports for the identity stages.
    "pipeline_audit" ->
      s"""WITH RECURSIVE
        |$corpusPipelineChain,
        |cnts AS (
        |  SELECT '0_input' AS stage, 0 AS stage_order,
        |    (SELECT COUNT(*) FROM corp0) AS rows_out
        |  UNION ALL SELECT '0b_url_dedup', 1, (SELECT COUNT(*) FROM corp)
        |  UNION ALL SELECT '1_quality_gate', 2, (SELECT COUNT(*) FROM qual)
        |  UNION ALL SELECT '2_exact_dedup', 3, (SELECT COUNT(*) FROM exact)
        |  UNION ALL SELECT '3_near_dedup', 4, (SELECT COUNT(*) FROM reps)
        |  UNION ALL SELECT '4_decontaminated', 5, (SELECT COUNT(*) FROM clean)
        |  UNION ALL SELECT '5_quota_capped', 6, (SELECT COUNT(*) FROM clean)
        |  UNION ALL SELECT '6_mixture_sampled', 7, (SELECT COUNT(*) FROM clean)
        |  UNION ALL SELECT '7_final', 8, (SELECT COUNT(*) FROM clean))
        |SELECT stage, CAST(stage_order AS INTEGER) AS stage_order,
        |  CAST(rows_out AS BIGINT) AS rows_out,
        |  CAST(COALESCE(lag(rows_out) OVER (ORDER BY stage_order),
        |    rows_out) - rows_out AS BIGINT) AS rows_dropped
        |FROM cnts ORDER BY stage_order""".stripMargin,

    // Deterministic order: sort by the portable XXH64 of the doc id.
    "training_order" ->
      s"""SELECT doc_id, $xxhSigned AS sort_key
        |FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")})
        |ORDER BY sort_key, doc_id""".stripMargin,

    // the bucket-offset id scheme is bit-identical to a global
    // row_number over (sort_key, doc_id) — the oracle states the
    // specification the operator avoids paying for
    "dense_ids" ->
      s"""WITH h AS (
        |  SELECT doc_id, $xxhSigned AS sort_key
        |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")}))
        |SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY sort_key, doc_id) - 1 AS BIGINT)
        |    AS gid
        |FROM h ORDER BY doc_id""".stripMargin,

    "train_split" ->
      s"""WITH h AS (
        |  SELECT doc_id, $xxhBucket AS bucket
        |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")})),
        |sp AS (
        |  SELECT doc_id, CASE WHEN bucket < 900000 THEN 0
        |                      WHEN bucket < 950000 THEN 1 ELSE 2 END AS split
        |  FROM h)
        |SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    "mixture_resample" -> mixtureResampleSql,
    "stream_mixture_gate" -> mixtureResampleSql,

    // E6: the dedup face projects the key set; with the watermark
    // delay past the table's event-time span no state evicts, so the
    // emitted keys equal the global distinct under any batching
    "stream_watermark_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    // E3-multibatch: batch index (event_id % 3, the replay order)
    // dominates event time — the later-load-wins ORDER contract
    "stream_upsert_multibatch" -> streamUpsertMultibatchSql,

    // E3: the upserted table is each user's latest event under the
    // (ts, event_id) total order — the keep-latest the merge applies
    "stream_upsert_latest" ->
      """SELECT user_id, event_id, event_type, ts, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    // Same constants at planes=8 with the 1-bit multi-probe: a pair is
    // a candidate iff its sign signatures differ in <= 1 bit
    // (bit_count(xor(...))), then the exact cosine fold decides.
    "dedup_embedding_cosine" ->
      s"""WITH s AS (SELECT ${hyperMatrix(8)} AS m),
        |b AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    CAST(${hyperBucketExpr("embedding", 8)} AS BIGINT) AS bucket
        |  FROM embeddings, s),
        |pr AS (
        |  SELECT a.id AS id_a, a.vec AS vec_a, b2.id AS id_b, b2.vec AS vec_b
        |  FROM b a JOIN b b2
        |    ON a.id < b2.id AND bit_count(xor(a.bucket, b2.bucket)) <= 1),
        |sc AS (
        |  SELECT id_a, id_b,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(vec_a[i] AS DOUBLE) * CAST(vec_b[i] AS DOUBLE)), (a, b) -> a + b) AS dot,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(vec_a[i] AS DOUBLE) * CAST(vec_a[i] AS DOUBLE)), (a, b) -> a + b) AS na,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(vec_b[i] AS DOUBLE) * CAST(vec_b[i] AS DOUBLE)), (a, b) -> a + b) AS nb
        |  FROM pr),
        |c AS (
        |  SELECT id_a, id_b,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM sc)
        |SELECT id_a, id_b, cos FROM c WHERE cos >= 0.35 ORDER BY id_a, id_b""".stripMargin,

    // Bucketing IS computable on any engine: the hyperplane signs are
    // bit0 of the public xxhash64 chain, embedded via hyperSigns, and
    // projections/cosines mirror the kernels' left-to-right double
    // folds — bucketing, candidates, and scores reproduce bit-for-bit
    // (planes=4, probeBits=0 home-bucket candidates).
    "ann_lsh_topk" ->
      s"""WITH s AS (SELECT ${hyperMatrix(4)} AS m),
        |cb AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    ${hyperBucketExpr("embedding", 4)} AS bucket
        |  FROM embeddings, s),
        |qb AS (
        |  SELECT vec_id AS qid, embedding AS qv,
        |    ${hyperBucketExpr("embedding", 4)} AS bucket
        |  FROM embeddings, s WHERE vec_id < 5),
        |sc AS (
        |  SELECT qid, cb.id AS id,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(cb.vec[i] AS DOUBLE)), (a, b) -> a + b) AS dot,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), (a, b) -> a + b) AS na,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(cb.vec[i] AS DOUBLE) * CAST(cb.vec[i] AS DOUBLE)), (a, b) -> a + b) AS nb
        |  FROM cb JOIN qb USING (bucket) WHERE cb.id <> qb.qid),
        |c AS (
        |  SELECT qid, id,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM sc),
        |r AS (
        |  SELECT qid, id, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
        |  FROM c)
        |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // Same bit-exactness argument as ann_bruteforce_topk, extended
    // through the quantization round-trip: round() (HALF_UP vs C
    // round-half-away) agrees on every exact double, and each
    // double↔float cast is the same IEEE correctly-rounded operation
    // in both engines — so the dequantized corpus, and therefore every
    // cosine, reproduces exactly.
    "ann_quantized_topk" ->
      """WITH base AS (
        |  SELECT vec_id AS id, embedding,
        |    list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
        |      (a, b) -> greatest(a, b)) / 127.0 AS s
        |  FROM embeddings),
        |quant AS (
        |  SELECT id,
        |    CAST(s AS FLOAT) AS sf,
        |    list_transform(embedding, x ->
        |      CASE WHEN s = 0 THEN CAST(0 AS TINYINT)
        |           ELSE CAST(round(CAST(x AS DOUBLE) / s) AS TINYINT) END) AS q
        |  FROM base),
        |dq AS (
        |  SELECT id,
        |    list_transform(q, x ->
        |      CAST(CAST(x AS DOUBLE) * CAST(sf AS DOUBLE) AS FLOAT)) AS vec
        |  FROM quant),
        |qs AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |s AS (
        |  SELECT qid, d.id AS id,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(d.vec[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS dot,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS na,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(d.vec[i] AS DOUBLE) * CAST(d.vec[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS nb
        |  FROM dq d CROSS JOIN qs WHERE d.id <> qs.qid),
        |c AS (
        |  SELECT qid, id,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
        |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM s),
        |r AS (
        |  SELECT qid, id, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
        |  FROM c)
        |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,

    "decontamination" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])) AS gs
        |  FROM t),
        |ex AS (SELECT doc_id, unnest(gs) AS gram FROM g)
        |SELECT e.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
        |FROM ex e JOIN (SELECT * FROM ex WHERE doc_id % 10 = 0) b
        |  ON e.gram = b.gram AND e.doc_id <> b.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "decontamination_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])) AS gs
        |  FROM t),
        |bg AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 10 = 0),
        |ex AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id % 10 <> 0),
        |sh AS (SELECT e.doc_id, COUNT(*) AS c FROM ex e JOIN bg USING (gram) GROUP BY 1)
        |SELECT g.doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(s.c, 0) AS BIGINT) AS n_shared,
        |  CAST(COALESCE(s.c, 0) AS DOUBLE) / GREATEST(len(gs), 1) AS overlap_frac
        |FROM g LEFT JOIN sh s USING (doc_id)
        |WHERE g.doc_id % 10 <> 0 ORDER BY g.doc_id""".stripMargin,

    // PSI drift: exact integer counts, add-one smoothing over the
    // union bucket count, single divides, one ln absorbed by 6-dp
    "corpus_drift" -> corpusDriftSql,
    // the E14 stream face merges additive per-batch counts through the
    // SAME psiFromCounts tree — one SQL proves both
    "stream_drift_psi" -> corpusDriftSql,

    "ngram_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])) AS gs
        |  FROM t),
        |e AS (SELECT doc_id, unnest(gs) AS gram FROM g),
        |sh AS (SELECT gram FROM e GROUP BY gram HAVING COUNT(*) >= 2),
        |pd AS (SELECT e.doc_id, COUNT(*) AS c FROM e JOIN sh USING (gram) GROUP BY 1)
        |SELECT g.doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(p.c, 0) AS BIGINT) AS n_dup,
        |  CAST(COALESCE(p.c, 0) AS DOUBLE) / GREATEST(len(gs), 1) AS dup_frac
        |FROM g LEFT JOIN pd p USING (doc_id)
        |ORDER BY g.doc_id""".stripMargin,

    // trigram leg tokenizes the FULLY-whitespace-trimmed text (tk2) —
    // the codegen shingle kernel's boundary behavior on any input; the
    // n_tokens/top-token stats keep the house split(trim) tokens (tk)
    "text_repetition_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
        |    string_split_regex(
        |      regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS tk2
        |  FROM documents),
        |tg AS (
        |  SELECT doc_id, CAST(len(tk) AS INTEGER) AS n_tokens,
        |    list_transform(range(1, greatest(len(tk2) - 1, 1)),
        |      i -> tk2[i] || ' ' || tk2[i+1] || ' ' || tk2[i+2]) AS g
        |  FROM t),
        |dup AS (
        |  SELECT doc_id, n_tokens,
        |    CASE WHEN len(g) = 0 THEN 0.0
        |         ELSE CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
        |              / CAST(len(g) AS DOUBLE) END AS dup_trigram_frac
        |  FROM tg),
        |top AS (
        |  SELECT doc_id, MAX(c) AS top_c FROM (
        |    SELECT doc_id, tok, COUNT(*) AS c FROM (
        |      SELECT doc_id, unnest(tk) AS tok FROM t)
        |    GROUP BY doc_id, tok)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens, dup_trigram_frac,
        |  CAST(top_c AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac
        |FROM dup JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS INTEGER) AS n_subtokens,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens, u / n AS uniq_ratio,
        |  0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |    + 0.2 * least((h / n) * 8.0, 1.0) AS quality
        |FROM c ORDER BY doc_id""".stripMargin,

    // D111: exact integer pair/unigram censuses; PMI is ONE ln over a
    // pinned-association double ratio (c_vw·N·N / (N_pair·c_v) / c_w),
    // 6-dp round absorbing libm-ulp ln drift (the BM25/LM argument)
    "pmi_collocations" ->
      """WITH t AS (
        |  SELECT CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\s+')
        |    ELSE [] END AS tk
        |  FROM documents),
        |pr AS (
        |  SELECT unnest(list_transform(range(1, len(tk)),
        |    i -> [tk[i], tk[i+1]])) AS p
        |  FROM t),
        |pc AS (SELECT p[1] AS v, p[2] AS w, COUNT(*) AS c_vw
        |  FROM pr GROUP BY 1, 2),
        |uc AS (SELECT x, COUNT(*) AS c_x FROM (
        |    SELECT unnest(tk) AS x FROM t) GROUP BY 1),
        |tot AS (SELECT
        |    (SELECT CAST(SUM(c_x) AS BIGINT) FROM uc) AS n_tok,
        |    (SELECT CAST(SUM(c_vw) AS BIGINT) FROM pc) AS n_pair),
        |s AS (SELECT v, w, c_vw, cv.c_x AS c_v, cw.c_x AS c_w, n_tok, n_pair
        |  FROM pc JOIN uc cv ON cv.x = pc.v JOIN uc cw ON cw.x = pc.w
        |  CROSS JOIN tot WHERE c_vw >= 5)
        |SELECT v, w, c_vw, c_v, c_w,
        |  round(ln(CAST(c_vw AS DOUBLE) * CAST(n_tok AS DOUBLE)
        |      * CAST(n_tok AS DOUBLE)
        |    / (CAST(n_pair AS DOUBLE) * CAST(c_v AS DOUBLE))
        |    / CAST(c_w AS DOUBLE)), 6) AS pmi
        |FROM s ORDER BY pmi DESC, v, w LIMIT 50""".stripMargin,

    // D112: the D9 quality CTE (already hash-green) bridges to
    // micro-unit BIGINT weights; Σw, Σw² exact HUGEINT (the plan's
    // decimal(38,0)); ESS/deff one IEEE evaluation per source
    "weighted_ess" ->
      """WITH t AS (
        |  SELECT source, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents),
        |c AS (
        |  SELECT source,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |w AS (
        |  SELECT source, CAST(round(
        |    (0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0, 0)
        |    AS BIGINT) AS wu
        |  FROM c),
        |a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    SUM(CAST(wu AS HUGEINT)) AS sw,
        |    SUM(CAST(wu AS HUGEINT) * CAST(wu AS HUGEINT)) AS sww
        |  FROM w GROUP BY 1)
        |SELECT source, n_rows,
        |  CASE WHEN sww > 0 THEN round(
        |    CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE), 6)
        |  END AS ess,
        |  CASE WHEN sw > 0 THEN round(
        |    CAST(n_rows AS DOUBLE) * CAST(sww AS DOUBLE)
        |      / (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)), 6)
        |  END AS design_effect
        |FROM a ORDER BY source""".stripMargin,

    "text_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    len(list_filter(tk, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS he,
        |    len(list_filter(tk, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS hf,
        |    len(list_filter(tk, x -> list_contains(['der','die','und','das','ein','nicht'], x))) AS hd,
        |    len(list_filter(tk, x -> list_contains(['el','los','y','que','un','una','en'], x))) AS hs
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN greatest(he, hf, hd, hs) = 0 THEN 'und'
        |       WHEN he = greatest(he, hf, hd, hs) THEN 'en'
        |       WHEN hf = greatest(he, hf, hd, hs) THEN 'fr'
        |       WHEN hd = greatest(he, hf, hd, hs) THEN 'de'
        |       ELSE 'es' END AS pred_lang
        |FROM h ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, list_reduce(
        |    list_transform(range(1, length(text) + 1),
        |      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // D54: the naive global running-sum window IS the oracle — the
    // operator's bucket decomposition evaluates the same window
    // bucket-wise, so the kept sets match exactly. Budget = half the
    // total token mass, computed in-query on both sides.
    "token_budget_select" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |s AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |    0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0) AS quality
        |  FROM c),
        |r AS (SELECT *, SUM(n_tokens) OVER (
        |    ORDER BY CAST(floor(quality * 100) AS BIGINT) DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM s)
        |SELECT doc_id, n_tokens, quality,
        |  cum <= (SELECT SUM(n_tokens) // 2 FROM s) AS kept
        |FROM r ORDER BY doc_id""".stripMargin,

    // C43: weights are integer µs, weighted mass in DECIMAL (exact,
    // associative), TWAP = one double divide of two exact aggregates.
    "events_twap" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, ts, value,
        |    lead(ts) OVER (PARTITION BY user_id, date_trunc('day', ts)
        |                   ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |w AS (
        |  SELECT user_id, day, COUNT(*) AS n_gaps,
        |    SUM(CAST(value AS DECIMAL(18,2))
        |        * (epoch_us(nxt) - epoch_us(ts))) AS vw,
        |    CAST(SUM(epoch_us(nxt) - epoch_us(ts)) AS BIGINT) AS tw
        |  FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT user_id, day, n_gaps,
        |  CAST(vw AS DOUBLE) / CAST(tw AS DOUBLE) AS twap
        |FROM w ORDER BY user_id, day""".stripMargin,

    // D59: all-integer class sizes; the broadcast join back is the
    // window twin COUNT(*) OVER (PARTITION BY qid) — row-identical.
    "k_anonymity_audit" ->
      """SELECT doc_id, lang, source, n_chars // 100 AS len_bucket,
        |  COUNT(*) OVER (PARTITION BY lang, source, n_chars // 100)
        |    AS class_size,
        |  COUNT(*) OVER (PARTITION BY lang, source, n_chars // 100) < 5
        |    AS at_risk
        |FROM documents ORDER BY doc_id""".stripMargin,

    // D85: the canonical form is the same chain both engines own
    // natively (NFC, lower, \s+ collapse, trim); gate text is
    // all-ASCII so NFC is engine-invariant by construction, and the
    // JVM-vs-utf8proc unicode agreement is spec-pinned separately
    "dedup_unicode" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(lower(nfc_normalize(text)),
        |      '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |c AS (SELECT norm, MIN(doc_id) AS canonical_id FROM n GROUP BY 1)
        |SELECT n.doc_id, c.canonical_id,
        |  n.doc_id <> c.canonical_id AS is_dup,
        |  n.text <> n.norm AS changed
        |FROM n JOIN c USING (norm) ORDER BY n.doc_id""".stripMargin,

    // D88: both sides build the identical page (escape & first, then
    // angle brackets) and run the identical RE2-safe extraction chain
    // (no backreferences; (?is)/(?s) inline flags, &amp; decoded last)
    "html_extract" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    '<html><head><title></title>' ||
        |    '<script type="text/javascript">var x = 1 < 2 && 3 > 2;</script>' ||
        |    '<style>p { color: red; }</style></head>' ||
        |    '<body><!-- boilerplate --><p>' ||
        |    replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'),
        |      '>', '&gt;') ||
        |    '</p><br/><div class="footer">visit &amp; read</div></body></html>'
        |      AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, CAST(length(html) AS BIGINT) AS n_chars_html,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '<[^>]+>', ' ', 'g') AS stripped
        |  FROM p)
        |SELECT doc_id, n_chars_html,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(stripped,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&nbsp;', ' '), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS extracted
        |FROM x ORDER BY doc_id""".stripMargin,

    // D86: the proven split chain + range starts + 1-based inclusive
    // list slice (both engines clamp the tail identically)
    "chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents),
        |s AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0),
        |e AS (SELECT doc_id, tk, n,
        |    unnest(range(0, n, 96)) AS start FROM s)
        |SELECT doc_id,
        |  CAST(start // 96 AS BIGINT) AS chunk_id,
        |  CAST(start AS BIGINT) AS start,
        |  CAST(len(tk[start + 1 : least(start + 128, n)]) AS BIGINT)
        |    AS n_tokens,
        |  array_to_string(tk[start + 1 : least(start + 128, n)], ' ')
        |    AS chunk_text
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin,

    // D79: the quality/repetition doubles reuse their oracle-proven
    // expression trees, lift to integer micro-units (the Doremi round
    // idiom), and every sum is exact-integer; the Pearson chain is the
    // literal double-op mirror of the engine's, over sums that are
    // exactly double-representable at gate scale
    "signal_correlation" -> signalCorrelationSql,
    // E21 stream face: merged additive stats + same finisher
    "stream_signal_matrix" -> signalCorrelationSql,

    // D78: all-integer class/distinct counts; sum-over-cells ==
    // class size, count-of-cells == distinct sensitive values
    "l_diversity_audit" ->
      """SELECT source, n_chars // 100 AS len_bucket,
        |  COUNT(*) AS class_size,
        |  COUNT(DISTINCT lang) AS n_sensitive,
        |  COUNT(DISTINCT lang) >= 2 AS l_diverse
        |FROM documents GROUP BY 1, 2
        |ORDER BY source, len_bucket""".stripMargin,

    // D93: ordered-EMD t-closeness — the cumulative difference is the
    // INTEGER (ng·cn − nc·cm) accumulated exactly (HUGEINT mirrors
    // decimal(38,0)); the published t is ONE double divide, and the
    // flag compares the 6-dp-rounded t so both engines cut identically
    "t_closeness_audit" ->
      """WITH b AS (SELECT lang, source, n_chars // 200 AS a
        |  FROM documents),
        |ca AS (SELECT lang, source, a, COUNT(*) AS n FROM b GROUP BY 1,2,3),
        |ga AS (SELECT a, COUNT(*) AS m FROM b GROUP BY 1),
        |cl AS (SELECT lang, source, SUM(n) AS nc FROM ca GROUP BY 1, 2),
        |t AS (SELECT CAST(SUM(m) AS BIGINT) AS ng, COUNT(*) AS nb FROM ga),
        |grid AS (SELECT cl.lang, cl.source, cl.nc, ga.a, ga.m,
        |    COALESCE(ca.n, 0) AS n
        |  FROM cl CROSS JOIN ga LEFT JOIN ca
        |    ON ca.lang = cl.lang AND ca.source = cl.source AND ca.a = ga.a),
        |cum AS (SELECT lang, source, nc, a,
        |    SUM(n) OVER w AS cn, SUM(m) OVER w AS cm
        |  FROM grid WINDOW w AS (PARTITION BY lang, source ORDER BY a
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT lang, source, nc, ng, nb,
        |    CAST(SUM(ABS(CAST(ng AS HUGEINT) * cn
        |      - CAST(nc AS HUGEINT) * cm)) AS DOUBLE) AS sn
        |  FROM cum CROSS JOIN t GROUP BY 1, 2, 3, 4, 5)
        |SELECT lang, source, CAST(nc AS BIGINT) AS class_size,
        |  CASE WHEN nb <= 1 THEN 0.0 ELSE
        |    round(sn / (CAST(nc AS DOUBLE) * ng * (nb - 1)), 6) END AS t_emd,
        |  (CASE WHEN nb <= 1 THEN 0.0 ELSE
        |    round(sn / (CAST(nc AS DOUBLE) * ng * (nb - 1)), 6) END) <= 0.2
        |    AS t_close
        |FROM s ORDER BY lang, source""".stripMargin,

    // D96: micro-unit score sums, integer bins/positives; mean, frac
    // and gap are one divide each
    "quality_calibration" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |q AS (
        |  SELECT doc_id, text, tk,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |v AS (
        |  SELECT doc_id,
        |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT)
        |      AS qm,
        |    (len(tk) BETWEEN 40 AND 100000
        |      AND CAST(len(regexp_replace(trim(text), '\s+', '', 'g'))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) BETWEEN 3.0 AND 5.0
        |      AND CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) >= 0.8
        |      AND len(list_filter(tk, w -> list_contains(
        |            ['the', 'a', 'of', 'to', 'and'], w))) >= 1) AS keep
        |  FROM q),
        |b AS (SELECT
        |    CAST(least(floor(qm / 100000.0), 9.0) AS BIGINT) AS bin,
        |    qm, CASE WHEN keep THEN 1 ELSE 0 END AS pos FROM v),
        |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(qm) AS sq, SUM(pos) AS np FROM b GROUP BY 1)
        |SELECT bin, n,
        |  round(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
        |    AS mean_pred,
        |  round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
        |  round(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
        |    - CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gap
        |FROM g ORDER BY bin""".stripMargin,

    // D113: the D96 bin chain + the minimax closed form (≡ PAV) —
    // every avg(h..j) is one IEEE divide of exact prefix-sum
    // differences, so the min/max lattice compares identical doubles
    "quality_isotonic" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |q AS (
        |  SELECT doc_id, text, tk,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |v AS (
        |  SELECT doc_id,
        |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT)
        |      AS qm,
        |    (len(tk) BETWEEN 40 AND 100000
        |      AND CAST(len(regexp_replace(trim(text), '\s+', '', 'g'))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) BETWEEN 3.0 AND 5.0
        |      AND CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) >= 0.8
        |      AND len(list_filter(tk, w -> list_contains(
        |            ['the', 'a', 'of', 'to', 'and'], w))) >= 1) AS keep
        |  FROM q),
        |b AS (SELECT
        |    CAST(least(floor(qm / 100000.0), 9.0) AS BIGINT) AS bin,
        |    CASE WHEN keep THEN 1 ELSE 0 END AS pos FROM v),
        |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(pos) AS BIGINT) AS np FROM b GROUP BY 1),
        |ii AS (SELECT bin, n, np,
        |    ROW_NUMBER() OVER (ORDER BY bin) AS i,
        |    CAST(SUM(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
        |    CAST(SUM(np) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cp
        |  FROM g),
        |lo AS (SELECT i AS h, cn - n AS cn0, cp - np AS cp0 FROM ii),
        |hi AS (SELECT i AS j, cn AS cnj, cp AS cpj FROM ii),
        |pr AS (SELECT h, j,
        |    CAST(cpj - cp0 AS DOUBLE) / CAST(cnj - cn0 AS DOUBLE) AS a
        |  FROM lo JOIN hi ON h <= j),
        |mm AS (SELECT pr.h, k.i AS k, MIN(a) AS m
        |  FROM pr JOIN ii k ON k.i >= pr.h AND k.i <= pr.j GROUP BY 1, 2),
        |ft AS (SELECT k, MAX(m) AS fit FROM mm GROUP BY 1)
        |SELECT bin, n,
        |  CASE WHEN n > 0 THEN
        |    round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS frac_pos,
        |  round(fit, 6) AS fit_isotonic
        |FROM ii JOIN ft ON ft.k = ii.i ORDER BY bin""".stripMargin,

    // D116: integer PageRank over the word co-occurrence graph —
    // unrolled CTEs, VARCHAR node ids, exact BIGINT ranks
    "keyword_textrank" -> keywordTextRankOracle(iters = 10, k = 30),

    // D115: the D53 paragraph CTEs re-aggregated per source; dup
    // detection by para text ≡ the plan's sha2 digests
    // (collision-free), frac one IEEE divide of exact counts
    "dup_mass_by_source" ->
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |paras AS (
        |  SELECT t.doc_id, i.i AS para_idx,
        |    array_to_string(tk[(i.i*12+1):(i.i*12+12)], ' ') AS para
        |  FROM toks t JOIN range(0, 16) AS i(i)
        |    ON i.i < CAST(ceil(len(tk)/12.0) AS BIGINT)),
        |dup AS (SELECT para FROM paras
        |  GROUP BY para HAVING COUNT(DISTINCT doc_id) >= 2),
        |pd AS (SELECT doc_id, COUNT(*) AS np,
        |    SUM(CASE WHEN para IN (SELECT para FROM dup)
        |      THEN 1 ELSE 0 END) AS nd
        |  FROM paras GROUP BY doc_id),
        |g AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(np) AS BIGINT) AS n_paras,
        |    CAST(SUM(nd) AS BIGINT) AS n_dup_paras
        |  FROM documents d JOIN pd ON pd.doc_id = d.doc_id
        |  GROUP BY d.source)
        |SELECT source, n_docs, n_paras, n_dup_paras,
        |  CASE WHEN n_paras > 0 THEN round(
        |    CAST(n_dup_paras AS DOUBLE) / CAST(n_paras AS DOUBLE), 6)
        |  END AS dup_frac
        |FROM g ORDER BY source""".stripMargin,

    // D114: frequency-of-frequencies over the word-count frame;
    // every statistic exact integers + one IEEE divide
    "good_turing_vocab" ->
      """WITH t AS (
        |  SELECT CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\s+')
        |    ELSE [] END AS tk
        |  FROM documents),
        |cnt AS (SELECT w, COUNT(*) AS c FROM (
        |    SELECT unnest(tk) AS w FROM t) GROUP BY w),
        |fof AS (SELECT c AS freq, COUNT(*) AS n_types FROM cnt
        |  GROUP BY 1),
        |a AS (SELECT
        |    CAST(COALESCE(SUM(n_types), 0) AS BIGINT) AS vocab_size,
        |    CAST(COALESCE(SUM(CAST(freq AS HUGEINT)
        |      * CAST(n_types AS HUGEINT)), 0) AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(SUM(CASE WHEN freq = 1 THEN n_types END), 0)
        |      AS BIGINT) AS n_hapax,
        |    CAST(COALESCE(SUM(CASE WHEN freq = 2 THEN n_types END), 0)
        |      AS BIGINT) AS n_dis
        |  FROM fof)
        |SELECT vocab_size, n_tokens, n_hapax, n_dis,
        |  CASE WHEN n_tokens > 0 THEN round(
        |    CAST(n_hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |  END AS p_unseen,
        |  round(CAST(vocab_size AS DOUBLE)
        |    + CAST(n_hapax AS DOUBLE) * (CAST(n_hapax AS DOUBLE) - 1.0)
        |      / (2.0 * (CAST(n_dis AS DOUBLE) + 1.0)), 6) AS chao1_vocab
        |FROM a""".stripMargin,

    // D97: exact-integer probability ratios, ln inside each term,
    // three pinned sorted folds (cells, both margins)
    "lang_source_mi" ->
      """WITH cells AS (SELECT lang AS x, source AS y, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |rx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY 1),
        |cy AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
        |term AS (SELECT cells.x, cells.y,
        |    (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
        |          / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) / ln(2)) AS tt
        |  FROM cells JOIN rx USING (x) JOIN cy USING (y) CROSS JOIN t),
        |mi AS (SELECT list_reduce(list_prepend(0.0,
        |    list(tt ORDER BY x, y)), (a, b) -> a + b) AS mi_raw FROM term),
        |hx AS (SELECT list_reduce(list_prepend(0.0, list(
        |    -(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (ln(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE)) / ln(2))
        |    ORDER BY x)), (a, b) -> a + b) AS hx_raw
        |  FROM rx CROSS JOIN t),
        |hy AS (SELECT list_reduce(list_prepend(0.0, list(
        |    -(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (ln(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE)) / ln(2))
        |    ORDER BY y)), (a, b) -> a + b) AS hy_raw
        |  FROM cy CROSS JOIN t)
        |SELECT n, round(mi_raw, 6) AS mi_bits,
        |  round(hx_raw, 6) AS h_x, round(hy_raw, 6) AS h_y,
        |  CASE WHEN least(hx_raw, hy_raw) > 0.0 THEN
        |    round(mi_raw / least(hx_raw, hy_raw), 6)
        |  END AS nmi
        |FROM t CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,

    // C73: exact integer co/item/basket counts; confidence and lift
    // are one divide each; total order on the rounded lift
    "association_rules" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |t AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM lp),
        |i AS (SELECT pk, COUNT(*) AS cnt FROM lp GROUP BY 1),
        |co AS (SELECT a.pk AS u, b.pk AS v, COUNT(*) AS support
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk <> b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT u, v, support,
        |  round(CAST(support AS DOUBLE) / CAST(iu.cnt AS DOUBLE), 6)
        |    AS confidence,
        |  round(CAST(support AS DOUBLE) * CAST(n_orders AS DOUBLE)
        |    / (CAST(iu.cnt AS DOUBLE) * CAST(iv.cnt AS DOUBLE)), 6) AS lift
        |FROM co JOIN i iu ON iu.pk = u JOIN i iv ON iv.pk = v
        |CROSS JOIN t
        |ORDER BY lift DESC, u, v LIMIT 50""".stripMargin,

    // D95: byte entropy over the char histogram (ASCII corpus: chars
    // ≡ bytes), terms folded in ascending byte order mirroring the
    // kernel's pinned left-fold; ln(p)/ln(2) composed identically,
    // the libm ulp absorbed by round 6
    "char_entropy" ->
      """WITH ch AS (
        |  SELECT d.doc_id, substr(d.text, i.i + 1, 1) AS c
        |  FROM documents d JOIN range(0, 1024) AS i(i)
        |    ON i.i < length(d.text)),
        |hist AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(SUM(k) AS DOUBLE) AS n
        |  FROM hist GROUP BY 1),
        |terms AS (SELECT h.doc_id, h.c,
        |    -((CAST(h.k AS DOUBLE) / t.n)
        |      * (ln(CAST(h.k AS DOUBLE) / t.n) / ln(2))) AS tt
        |  FROM hist h JOIN tot t USING (doc_id)),
        |e AS (SELECT doc_id,
        |    round(list_reduce(list_prepend(0.0, list(tt ORDER BY c)),
        |      (a, b) -> a + b), 6) AS entropy
        |  FROM terms GROUP BY doc_id)
        |SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) AS n_bytes,
        |  COALESCE(e.entropy, 0.0) AS entropy,
        |  COALESCE(e.entropy, 0.0) BETWEEN 2.0 AND 6.0 AS keep
        |FROM documents d LEFT JOIN e USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // D94: both raters replayed (quality micro-units — the bootstrap
    // convention — and the Gopher rules), contingency cells exact
    // integers, po/pe/kappa one IEEE evaluation each
    "rater_kappa" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |q AS (
        |  SELECT doc_id, text, tk,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |v AS (
        |  SELECT doc_id,
        |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT)
        |      >= 500000 AS ra,
        |    (len(tk) BETWEEN 40 AND 100000
        |      AND CAST(len(regexp_replace(trim(text), '\s+', '', 'g'))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) BETWEEN 3.0 AND 5.0
        |      AND CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) >= 0.8
        |      AND len(list_filter(tk, w -> list_contains(
        |            ['the', 'a', 'of', 'to', 'and'], w))) >= 1) AS rb
        |  FROM q),
        |c AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN COALESCE(ra, false) AND COALESCE(rb, false)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |    CAST(SUM(CASE WHEN COALESCE(ra, false) AND NOT COALESCE(rb, false)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |    CAST(SUM(CASE WHEN NOT COALESCE(ra, false) AND COALESCE(rb, false)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |    CAST(SUM(CASE WHEN NOT COALESCE(ra, false)
        |      AND NOT COALESCE(rb, false) THEN 1 ELSE 0 END) AS BIGINT) AS n00
        |  FROM v),
        |k AS (SELECT n, n11, n10, n01, n00,
        |    CAST(n11 + n00 AS DOUBLE) / n AS po,
        |    (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
        |      + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
        |  FROM c)
        |SELECT n, n11, n10, n01, n00,
        |  CASE WHEN n > 0 THEN round(po, 6) END AS po,
        |  CASE WHEN n > 0 THEN round(pe, 6) END AS pe,
        |  CASE WHEN n > 0 AND pe < 1.0 THEN
        |    round((po - pe) / (1.0 - pe), 6) END AS kappa
        |FROM k""".stripMargin,

    // D68: the Laplace mechanism replayed bit for bit — dense release
    // index over the sorted histogram, portable-XXH64 of the index,
    // top 53 bits → uniform, inverse CDF → deviate; the one `ln` is
    // absorbed by the 6-dp rounding both engines apply (the BM25/LM
    // oracle argument).
    "dp_noisy_counts" -> {
      val inner = xxh64Nested(
        """SELECT lang, source, n_true,
          |  CAST(ROW_NUMBER() OVER (ORDER BY lang, source) AS BIGINT)
          |    AS gid
          |FROM (SELECT lang, source, COUNT(*) AS n_true
          |      FROM documents GROUP BY 1, 2)""".stripMargin, "gid")
      s"""WITH u AS (
         |  SELECT lang, source, n_true,
         |    (CAST(hout // 2048 AS DOUBLE) + 0.5) / 9007199254740992.0
         |      AS uu
         |  FROM ($inner))
         |SELECT lang, source, n_true,
         |  ROUND(CAST(n_true AS DOUBLE) + CASE WHEN uu < 0.5
         |    THEN 1.0 * ln(2.0 * uu)
         |    ELSE -1.0 * ln(2.0 * (1.0 - uu)) END, 6) AS noisy_count
         |FROM u ORDER BY lang, source""".stripMargin
    },
  )
}
