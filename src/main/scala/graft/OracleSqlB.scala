package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import OracleFns._
import OracleFnsTrained._

/** relational/window/dedup/LM oracle SQL (split from SparkEntry - part B).
  *
  * Same package, no behavior change: [[SparkEntry.oracleSql]] is the
  * concatenation of the four parts; shared SQL builders live in
  * [[OracleFns]].
  */
private[graft] object OracleSqlB {
  private[graft] val sql: Map[String, String] = Map(

    "semi_join_exists" ->
      """SELECT * FROM (
        |  SELECT 'with_orders' AS bucket, COUNT(*) AS n FROM customer c
        |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  UNION ALL
        |  SELECT 'without_orders' AS bucket, COUNT(*) AS n FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |) ORDER BY bucket""".stripMargin,

    "distinct_counts" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem""".stripMargin,

    "events_time_buckets" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "rollup_totals" -> s"""SELECT l_returnflag, l_linestatus,
        |  ${dsum("l_quantity")} AS sum_qty, COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "events_range_join" ->
      """WITH w AS (
        |  SELECT DISTINCT
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 8 HOUR AS win_lo,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 18 HOUR AS win_hi
        |  FROM events)
        |SELECT win_lo, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w JOIN events e ON e.ts >= w.win_lo AND e.ts < w.win_hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "price_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // The bloom pre-filter only removes rows the join would drop, so
    // the oracle is the PLAIN join — exactness of the pruned plan is
    // the point being checked.
    "bloom_prune_join" -> s"""SELECT s_name, $revenueSum AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    // Clustering is a pure reordering: the filtered aggregate over the
    // z-ordered copy must equal the same query on the raw table.
    "zorder_layout" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events
        |WHERE user_id BETWEEN 10 AND 60 AND value BETWEEN 5.0 AND 40.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The histogram pre-agg is exactly mergeable (integer bucket
    // counts), so the merged cumulative histogram — and the bucket
    // each quantile lands in — is deterministic in both engines.
    "histogram_preagg_quantiles" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |merged AS (SELECT bucket, SUM(n) AS n FROM daily GROUP BY bucket),
        |cum AS (
        |  SELECT bucket,
        |    SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(n) OVER () AS total
        |  FROM merged),
        |qs AS (SELECT CAST(q AS DOUBLE) AS q
        |       FROM (VALUES (0.5),(0.9),(0.99)) t(q))
        |SELECT q, CAST(MIN(bucket) * 10.0 AS DOUBLE) AS value_at_q
        |FROM cum, qs WHERE cum >= q * total
        |GROUP BY q ORDER BY q""".stripMargin,

    // Discrete quantile: least length whose cumulative count reaches
    // q*N; the integer cumulative count compares against the same IEEE
    // double product in both engines.
    "text_length_quantiles_exact" ->
      """WITH c AS (
        |  SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars),
        |cum AS (
        |  SELECT n_chars,
        |    SUM(cnt) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(cnt) OVER () AS n
        |  FROM c),
        |qs AS (SELECT CAST(q AS DOUBLE) AS q
        |       FROM (VALUES (0.25),(0.5),(0.75),(0.95),(0.99)) t(q))
        |SELECT q, MIN(n_chars) AS len_q
        |FROM cum, qs WHERE cum >= q * n
        |GROUP BY q ORDER BY q""".stripMargin,

    "length_quantiles_by_lang" ->
      """WITH c AS (
        |  SELECT lang, n_chars, COUNT(*) AS cnt FROM documents
        |  GROUP BY lang, n_chars),
        |cum AS (
        |  SELECT lang, n_chars,
        |    SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(cnt) OVER (PARTITION BY lang) AS n
        |  FROM c),
        |qs AS (SELECT CAST(q AS DOUBLE) AS q
        |       FROM (VALUES (0.5),(0.9)) t(q))
        |SELECT lang, q, MIN(n_chars) AS len_q
        |FROM cum, qs WHERE cum >= q * n
        |GROUP BY lang, q ORDER BY lang, q""".stripMargin,

    "events_click_attribution" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts, p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts >= c.ts
        |  AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "events_click_attribution_outer" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts, p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts >= c.ts
        |  AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "pivot_segments" ->
      """SELECT n_name,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS "AUTOMOBILE",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS "BUILDING",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS "FURNITURE",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS "HOUSEHOLD",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS "MACHINERY"
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "setop_except" ->
      """SELECT o_orderkey FROM orders
        |EXCEPT
        |SELECT l_orderkey AS o_orderkey FROM lineitem WHERE l_quantity >= 45
        |ORDER BY o_orderkey""".stripMargin,

    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
        |  CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS INTEGER) AS n_norm_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |n AS (
        |  SELECT doc_id, toks,
        |    greatest(CAST(ceil((len(toks) - 32) / 24.0) AS INTEGER) + 1, 1) AS nc
        |  FROM t),
        |e AS (
        |  SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_idx FROM n)
        |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        |  array_to_string(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ') AS chunk_text,
        |  CAST(len(string_split(array_to_string(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' '), ' ')) AS INTEGER) AS n_chunk_tokens
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    // coin, cut start, and cut length all derive from the portable
    // XXH64 of the doc id with integer mod/div chains — exact in both
    // engines (the floor(h/n) double division is exact at these
    // magnitudes: true non-integer quotients sit ≥ 1/n from any
    // integer, ~8 orders above the ulp)
    "fim_transform" ->
      s"""WITH hx AS (${xxh64Nested("SELECT doc_id, text FROM documents", "doc_id")}),
         |j AS (
         |  SELECT doc_id, text,
         |    ((($xxhSigned) % 1000000) + 1000000) % 1000000 AS hb,
         |    len(text) AS n, greatest(len(text), 2) AS ns
         |  FROM hx),
         |c AS (
         |  SELECT doc_id, text, hb, n,
         |    1 + (hb % ns) AS a,
         |    ((hb // ns) % (ns - (1 + (hb % ns)) + 2)) AS lm
         |  FROM j)
         |SELECT doc_id,
         |  (hb % 2 = 0 AND n >= 2) AS fim_applied,
         |  CASE WHEN hb % 2 = 0 AND n >= 2
         |    THEN '<PRE>' || substr(text, 1, CAST(a - 1 AS INTEGER))
         |      || '<SUF>' || substr(text, CAST(a + lm AS INTEGER),
         |           CAST(n - a - lm + 1 AS INTEGER))
         |      || '<MID>' || substr(text, CAST(a AS INTEGER), CAST(lm AS INTEGER))
         |    ELSE text END AS fim_text
         |FROM c ORDER BY doc_id""".stripMargin,

    // single int/int -> double divisions are correctly rounded in both
    // engines; every count is exact
    "gopher_quality" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS ws,
        |    len(regexp_replace(trim(text), '\s+', '', 'g')) AS n_chars
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS INTEGER) AS n_words,
        |    CAST(n_chars AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS mean_word_len,
        |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS alpha_frac,
        |    CAST(len(list_filter(ws,
        |      w -> list_contains(['the', 'a', 'of', 'to', 'and'], w))) AS INTEGER)
        |      AS stop_hits
        |  FROM s)
        |SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
        |  (n_words BETWEEN 40 AND 100000
        |    AND mean_word_len BETWEEN 3.0 AND 5.0
        |    AND alpha_frac >= 0.8 AND stop_hits >= 1) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "text_blocklist" ->
      """SELECT doc_id, CAST(n_hits AS INTEGER) AS n_hits, (n_hits = 0) AS keep
        |FROM (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> list_contains(['slow', 'dup', 'big'], t))) AS n_hits
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "text_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    // D90: both engines build the same card-shaped candidate (check
    // digit solved from the Luhn fold), extract 13-16 digit runs,
    // validate, and replace-fold only the valid ones; the fold is
    // exact integer arithmetic so the verdicts cannot diverge
    "text_redact_luhn" ->
      """WITH g AS (
        |  SELECT doc_id, text,
        |    '400000' || lpad(CAST((doc_id * 37 + 11) % 1000000000 AS VARCHAR),
        |      9, '0') AS p15
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, text, p15,
        |    list_reduce(list_transform(range(1, 17),
        |      i -> CASE WHEN i % 2 = 0 THEN
        |             CASE WHEN 2 * (ascii(substr(p15 || '0', 17 - i, 1)) - 48) > 9
        |                  THEN 2 * (ascii(substr(p15 || '0', 17 - i, 1)) - 48) - 9
        |                  ELSE 2 * (ascii(substr(p15 || '0', 17 - i, 1)) - 48) END
        |           ELSE ascii(substr(p15 || '0', 17 - i, 1)) - 48 END),
        |      (a, b) -> a + b) AS ts
        |  FROM g),
        |e AS (
        |  SELECT doc_id,
        |    substr(text, 1, 30) || ' card ' || p15 ||
        |      CAST(CASE WHEN doc_id % 2 = 0 THEN (10 - ts % 10) % 10
        |           ELSE ((10 - ts % 10) % 10 + 5) % 10 END AS VARCHAR) ||
        |      ' ref 12345 end' AS emb
        |  FROM t),
        |c AS (
        |  SELECT doc_id, emb,
        |    regexp_extract_all(emb, '[0-9]{13,16}') AS cands
        |  FROM e),
        |v AS (
        |  SELECT doc_id, emb, cands,
        |    list_filter(cands, cd ->
        |      list_reduce(list_transform(range(1, len(cd) + 1),
        |        i -> CASE WHEN i % 2 = 0 THEN
        |               CASE WHEN 2 * (ascii(substr(cd, len(cd) - i + 1, 1)) - 48) > 9
        |                    THEN 2 * (ascii(substr(cd, len(cd) - i + 1, 1)) - 48) - 9
        |                    ELSE 2 * (ascii(substr(cd, len(cd) - i + 1, 1)) - 48) END
        |             ELSE ascii(substr(cd, len(cd) - i + 1, 1)) - 48 END),
        |        (a, b) -> a + b) % 10 = 0) AS vc
        |  FROM c)
        |SELECT doc_id, CAST(len(cands) AS INTEGER) AS n_candidates,
        |  CAST(len(vc) AS INTEGER) AS n_valid,
        |  list_reduce(list_prepend(emb, vc),
        |    (txt, cd) -> replace(txt, cd, '<CC>')) AS redacted
        |FROM v ORDER BY doc_id""".stripMargin,

    "vocab_top_words" ->
      """SELECT word, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
        |GROUP BY word ORDER BY freq DESC, word LIMIT 50""".stripMargin,

    // regression sums are explicit left folds over the rank-sorted
    // ≤K list on BOTH engines (fixed double-add order); ln/round
    // parity per the BM25 precedent
    // D62b: same point CTEs as zipf_fit; slopes round to 6 dp BEFORE
    // the lower-middle order statistic, so the selection can't
    // diverge on a ulp; range bounds mirror the engine's guarded
    // ascending sequences
    "zipf_theil_sen" ->
      """WITH v AS (
        |  SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |    FROM documents)
        |  GROUP BY word ORDER BY freq DESC, word LIMIT 200),
        |r AS (
        |  SELECT CAST(rank AS DOUBLE) AS rank,
        |    ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        |  FROM (SELECT freq, word,
        |      row_number() OVER (ORDER BY freq DESC, word) AS rank FROM v)),
        |l AS (SELECT list_sort(list([rank, x, y])) AS a FROM r),
        |sl AS (
        |  SELECT CAST(len(a) AS BIGINT) AS n_types,
        |    flatten(list_transform(range(1, len(a)), i ->
        |      list_transform(range(i + 1, len(a) + 1), j ->
        |        round((a[j][3] - a[i][3]) / (a[j][2] - a[i][2]), 6)))) AS ss
        |  FROM l)
        |SELECT n_types, CAST(len(ss) AS BIGINT) AS n_pairs,
        |  list_sort(ss)[CAST((len(ss) + 1) // 2 AS INTEGER)]
        |    AS slope_theil_sen
        |FROM sl""".stripMargin,

    "zipf_fit" ->
      """WITH v AS (
        |  SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |    FROM documents)
        |  GROUP BY word ORDER BY freq DESC, word LIMIT 200),
        |r AS (
        |  SELECT CAST(rank AS DOUBLE) AS rank,
        |    ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        |  FROM (SELECT freq, word,
        |      row_number() OVER (ORDER BY freq DESC, word) AS rank FROM v)),
        |l AS (SELECT list_sort(list([rank, x, y])) AS a FROM r),
        |s AS (SELECT CAST(len(a) AS DOUBLE) AS n,
        |  list_reduce([0.0] || list_transform(a, e -> e[2]),
        |    (p, q) -> p + q) AS sx,
        |  list_reduce([0.0] || list_transform(a, e -> e[3]),
        |    (p, q) -> p + q) AS sy,
        |  list_reduce([0.0] || list_transform(a, e -> e[2] * e[3]),
        |    (p, q) -> p + q) AS sxy,
        |  list_reduce([0.0] || list_transform(a, e -> e[2] * e[2]),
        |    (p, q) -> p + q) AS sxx,
        |  list_reduce([0.0] || list_transform(a, e -> e[3] * e[3]),
        |    (p, q) -> p + q) AS syy
        |  FROM l)
        |SELECT CAST(n AS BIGINT) AS n_types,
        |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
        |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
        |    AS intercept,
        |  round((n*sxy - sx*sy) * (n*sxy - sx*sy)
        |    / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
        |FROM s""".stripMargin,

    // D22's exact-verified join-back: the sketch only nominates; the
    // emitted counts are exact, so the oracle is the exact top-10
    "vocab_heavy_hitters" ->
      """SELECT word, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
        |GROUP BY word ORDER BY freq DESC, word LIMIT 10""".stripMargin,
    // the E10 stream face exact-verifies the merged-sketch slate by
    // the same join-back — slate ≡ batch slate (merge identity +
    // id-pure coins), so the exact top-10 shares D22's oracle
    "stream_trending_words" ->
      """SELECT word, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
        |GROUP BY word ORDER BY freq DESC, word LIMIT 10""".stripMargin,
    // E10-multibatch: three per-batch CMS rows merge by counter sums —
    // identical to one sketch over the union (additive-merge identity,
    // id-pure nomination coins), so the cross-batch merge shares the
    // same exact-verified oracle
    "stream_trending_multibatch" ->
      """SELECT word, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
        |GROUP BY word ORDER BY freq DESC, word LIMIT 10""".stripMargin,

    "topk_per_group_custom" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "topk_rank_ties" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_custkey
        |                 ORDER BY o_totalprice DESC) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk, o_orderkey""".stripMargin,

    "topk_dense_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    dense_rank() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk, o_orderkey""".stripMargin,

    "asof_last_purchase" ->
      """SELECT c.event_id, p.event_id AS last_purchase_id,
        |  p.value AS last_purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w > INTERVAL 4 HOUR
        |         THEN 1 ELSE 0 END AS flag
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, CAST(SUM(flag) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM e)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS t_start, MAX(ts) AS t_end
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    // session_window semantics, verified empirically on Spark 4.1:
    // an event at EXACTLY prev_ts + gap still merges (sessions split
    // only at diff > gap) — the same boundary as C8's lag
    // formulation; start = first ts, end = last ts + gap (exclusive).
    "events_session_window" -> sessionWindowSql,
    "stream_session_windows" -> sessionWindowSql,

    "events_windowed_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "dedup_exact" ->
      """SELECT sha256(text) AS digest, MIN(doc_id) AS canonical_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,

    // D81: every leg replays an already-proven oracle tree at
    // aggregate granularity; counts are integers, the two non-count
    // legs (mean quality micro, zipf slope) mirror their keys' exact
    // association and 6-dp rounds
    "corpus_card" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\s+')
        |    ELSE CAST([] AS VARCHAR[]) END AS tk
        |  FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s FROM t),
        |ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh
        |       WHERE len(s) > 0),
        |prs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |g8 AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])) AS gs
        |  FROM t),
        |ex8 AS (SELECT doc_id, unnest(gs) AS gram FROM g8),
        |cont AS (
        |  SELECT e.doc_id, b.doc_id AS bench_id
        |  FROM ex8 e JOIN (SELECT * FROM ex8 WHERE doc_id % 10 = 0) b
        |    ON e.gram = b.gram AND e.doc_id <> b.doc_id
        |  GROUP BY 1, 2),
        |q AS (
        |  -- UNGUARDED tokens: the engine's qualityScore splits
        |  -- trim(text) directly, so an empty doc is the [''] token
        |  -- (n=1), not [] — the guarded t CTE serves only n_tokens
        |  SELECT CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT) AS qm
        |  FROM (
        |    SELECT CAST(len(tk2) AS DOUBLE) AS n,
        |      CAST(len(list_distinct(tk2)) AS DOUBLE) AS u,
        |      CAST(len(list_filter(tk2, x -> list_contains(
        |        ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |    FROM (SELECT string_split_regex(trim(text), '\s+') AS tk2
        |          FROM documents))),
        |zv AS (
        |  SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |    FROM documents)
        |  GROUP BY word ORDER BY freq DESC, word LIMIT 200),
        |zr AS (
        |  SELECT CAST(rank AS DOUBLE) AS rank,
        |    ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        |  FROM (SELECT freq, word,
        |      row_number() OVER (ORDER BY freq DESC, word) AS rank FROM zv)),
        |zl AS (SELECT list_sort(list([rank, x, y])) AS a FROM zr),
        |zs AS (SELECT CAST(len(a) AS DOUBLE) AS n,
        |  list_reduce([0.0] || list_transform(a, e -> e[2]), (p, q) -> p + q) AS sx,
        |  list_reduce([0.0] || list_transform(a, e -> e[3]), (p, q) -> p + q) AS sy,
        |  list_reduce([0.0] || list_transform(a, e -> e[2] * e[3]), (p, q) -> p + q) AS sxy,
        |  list_reduce([0.0] || list_transform(a, e -> e[2] * e[2]), (p, q) -> p + q) AS sxx
        |  FROM zl)
        |SELECT metric, value FROM (
        |  SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM documents
        |  UNION ALL SELECT 'n_tokens', CAST(SUM(len(tk)) AS DOUBLE) FROM t
        |  UNION ALL SELECT 'docs_lang:' || lang, CAST(COUNT(*) AS DOUBLE)
        |    FROM documents GROUP BY lang
        |  UNION ALL SELECT 'exact_dup_groups', CAST(COUNT(*) AS DOUBLE) FROM
        |    (SELECT sha256(text) FROM documents GROUP BY 1 HAVING COUNT(*) > 1)
        |  UNION ALL SELECT 'neardup_pairs', CAST(COUNT(*) AS DOUBLE) FROM
        |    (SELECT id_a FROM prs WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5)
        |  UNION ALL SELECT 'mean_quality_micro',
        |    round(CAST(SUM(qm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) FROM q
        |  UNION ALL SELECT 'zipf_slope',
        |    round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) FROM zs
        |  UNION ALL SELECT 'contamination_pairs', CAST(COUNT(*) AS DOUBLE)
        |    FROM cont)
        |ORDER BY metric""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
        |  FROM t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
        |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin,

    // D92: clipped (multiset) n-gram overlap per consecutive pair;
    // integer counts under single int->double divides, F1 as the
    // one-divide identity 2o/(na+nb) — no compound rounding
    "rouge_overlap" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.tk AS ta, b.tk AS tb
        |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1),
        |g AS (
        |  SELECT id_a, id_b, ta AS g1a, tb AS g1b,
        |    list_transform(range(1, len(ta)), i -> ta[i] || ' ' || ta[i+1]) AS g2a,
        |    list_transform(range(1, len(tb)), i -> tb[i] || ' ' || tb[i+1]) AS g2b
        |  FROM p),
        |c1a AS (SELECT id_a, id_b, gram, COUNT(*) AS ca FROM
        |  (SELECT id_a, id_b, unnest(g1a) AS gram FROM g) GROUP BY 1, 2, 3),
        |c1b AS (SELECT id_a, id_b, gram, COUNT(*) AS cb FROM
        |  (SELECT id_a, id_b, unnest(g1b) AS gram FROM g) GROUP BY 1, 2, 3),
        |o1 AS (SELECT id_a, id_b, SUM(LEAST(ca, cb)) AS o
        |  FROM c1a JOIN c1b USING (id_a, id_b, gram) GROUP BY 1, 2),
        |c2a AS (SELECT id_a, id_b, gram, COUNT(*) AS ca FROM
        |  (SELECT id_a, id_b, unnest(g2a) AS gram FROM g) GROUP BY 1, 2, 3),
        |c2b AS (SELECT id_a, id_b, gram, COUNT(*) AS cb FROM
        |  (SELECT id_a, id_b, unnest(g2b) AS gram FROM g) GROUP BY 1, 2, 3),
        |o2 AS (SELECT id_a, id_b, SUM(LEAST(ca, cb)) AS o
        |  FROM c2a JOIN c2b USING (id_a, id_b, gram) GROUP BY 1, 2),
        |f AS (
        |  SELECT g.id_a, g.id_b,
        |    CAST(COALESCE(o1.o, 0) AS BIGINT) AS o1v,
        |    CAST(COALESCE(o2.o, 0) AS BIGINT) AS o2v,
        |    CAST(len(g1a) AS BIGINT) AS n1a, CAST(len(g1b) AS BIGINT) AS n1b,
        |    CAST(len(g2a) AS BIGINT) AS n2a, CAST(len(g2b) AS BIGINT) AS n2b
        |  FROM g LEFT JOIN o1 USING (id_a, id_b) LEFT JOIN o2 USING (id_a, id_b))
        |SELECT id_a, id_b,
        |  o1v AS r1_overlap,
        |  CASE WHEN n1a > 0 THEN CAST(o1v AS DOUBLE) / n1a ELSE 0.0 END AS r1_recall,
        |  CASE WHEN n1b > 0 THEN CAST(o1v AS DOUBLE) / n1b ELSE 0.0 END AS r1_precision,
        |  CASE WHEN n1a + n1b > 0 THEN CAST(o1v * 2 AS DOUBLE) / (n1a + n1b)
        |       ELSE 0.0 END AS r1_f1,
        |  o2v AS r2_overlap,
        |  CASE WHEN n2a > 0 THEN CAST(o2v AS DOUBLE) / n2a ELSE 0.0 END AS r2_recall,
        |  CASE WHEN n2b > 0 THEN CAST(o2v AS DOUBLE) / n2b ELSE 0.0 END AS r2_precision,
        |  CASE WHEN n2a + n2b > 0 THEN CAST(o2v * 2 AS DOUBLE) / (n2a + n2b)
        |       ELSE 0.0 END AS r2_f1
        |FROM f ORDER BY id_a""".stripMargin,

    // the dedup_resolve closure feeding the train_split hash CASE on
    // the CLUSTER canonical id — near-dups share a bucket by
    // construction, so they share a split
    "leakage_safe_split" ->
      s"""WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5),
        |und AS (SELECT ida AS src, idb AS dst FROM edges
        |  UNION ALL SELECT idb, ida FROM edges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
        |canon AS (
        |  SELECT d.doc_id,
        |    LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS canonical_id
        |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        |  GROUP BY d.doc_id),
        |h AS (
        |  SELECT doc_id, canonical_id, $xxhBucket AS bucket
        |  FROM (${xxh64Nested("SELECT doc_id, canonical_id FROM canon",
             "canonical_id")}))
        |SELECT doc_id, canonical_id,
        |  CASE WHEN bucket < 900000 THEN 0
        |       WHEN bucket < 950000 THEN 1 ELSE 2 END AS split
        |FROM h ORDER BY doc_id""".stripMargin,

    "dedup_resolve" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5),
        |und AS (SELECT ida AS src, idb AS dst FROM edges
        |  UNION ALL SELECT idb, ida FROM edges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst)
        |SELECT d.doc_id,
        |  LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS canonical_id
        |FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // D17c: the dedup_resolve closure + the D9 quality doubles + a
    // per-cluster rank window (quality desc, id) — kept = rank 1
    "dedup_keep_best" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5),
        |und AS (SELECT ida AS src, idb AS dst FROM edges
        |  UNION ALL SELECT idb, ida FROM edges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
        |cc AS (
        |  SELECT d.doc_id,
        |    LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS canonical_id
        |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        |  GROUP BY d.doc_id),
        |c2 AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |q AS (SELECT doc_id,
        |    0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0) AS quality
        |  FROM c2)
        |SELECT cc.doc_id, cc.canonical_id,
        |  row_number() OVER (PARTITION BY canonical_id
        |    ORDER BY quality DESC, cc.doc_id) = 1 AS kept
        |FROM cc JOIN q ON cc.doc_id = q.doc_id
        |ORDER BY cc.doc_id""".stripMargin,

    // the dedup_resolve closure + two aggregates
    "dedup_cluster_sizes" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5),
        |und AS (SELECT ida AS src, idb AS dst FROM edges
        |  UNION ALL SELECT idb, ida FROM edges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
        |canon AS (
        |  SELECT d.doc_id,
        |    LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS canonical_id
        |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        |  GROUP BY d.doc_id),
        |cl AS (SELECT canonical_id, COUNT(*) AS sz FROM canon GROUP BY canonical_id)
        |SELECT sz AS cluster_size, COUNT(*) AS n_clusters
        |FROM cl GROUP BY sz ORDER BY cluster_size""".stripMargin,

    // Incremental admission, closed-form: even ids = existing corpus,
    // odd ids = incoming. Valid as an oracle because LSH candidate
    // generation is COMPLETE on this data at the gate SF (every true
    // >=0.8-Jaccard pair sits at >=0.9 where the 8x4 band miss
    // probability is ~2e-4 per pair, and dedup_minhash_lsh's row count
    // equals the exact pair count) — so the engine's LSH + verify + CC
    // equals this exact transitive-closure formulation.
    "dedup_incremental" -> dedupIncrementalSql,
    "stream_corpus_admission" -> dedupIncrementalSql,
    "stream_admission_multibatch" -> dedupMultibatchAdmissionSql,

    // SimHash, end to end in portable SQL: XXH64 over each distinct
    // shingle's bytes (the general short-input path — word/4-byte/byte
    // tails; gate shingles are ASCII and < 32 bytes so the 32-byte
    // stripe loop is never entered and is not emitted), 64-bit +/-1
    // voting per doc, and ALL pairs at hamming <= 7 — valid because
    // maxHamming(7) < bands(8) makes the engine's band candidates
    // pigeonhole-complete, so banding is performance-only. List-lambda
    // variables (unlike SQL aliases) don't textually expand, which is
    // what makes the per-word fold writable inline.
    "dedup_simhash" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
        |shd AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(tk) - 1),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
        |  FROM t),
        |dsh AS (SELECT DISTINCT sh FROM shd),
        |$strXxh64Ctes
        |pw AS (SELECT * FROM (VALUES (0, 1), (1, 2), (2, 4), (3, 8), (4, 16), (5, 32), (6, 64), (7, 128), (8, 256), (9, 512), (10, 1024), (11, 2048), (12, 4096), (13, 8192), (14, 16384), (15, 32768), (16, 65536), (17, 131072), (18, 262144), (19, 524288), (20, 1048576), (21, 2097152), (22, 4194304), (23, 8388608), (24, 16777216), (25, 33554432), (26, 67108864), (27, 134217728), (28, 268435456), (29, 536870912), (30, 1073741824), (31, 2147483648), (32, 4294967296), (33, 8589934592), (34, 17179869184), (35, 34359738368), (36, 68719476736), (37, 137438953472), (38, 274877906944), (39, 549755813888), (40, 1099511627776), (41, 2199023255552), (42, 4398046511104), (43, 8796093022208), (44, 17592186044416), (45, 35184372088832), (46, 70368744177664), (47, 140737488355328), (48, 281474976710656), (49, 562949953421312), (50, 1125899906842624), (51, 2251799813685248), (52, 4503599627370496), (53, 9007199254740992), (54, 18014398509481984), (55, 36028797018963968), (56, 72057594037927936), (57, 144115188075855872), (58, 288230376151711744), (59, 576460752303423488), (60, 1152921504606846976), (61, 2305843009213693952), (62, 4611686018427387904), (63, 9223372036854775808)) p(j, pv)),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN v > 0 THEN CAST(pv AS HUGEINT) ELSE 0 END)
        |      - CASE WHEN SUM(CASE WHEN v > 0 AND j = 63 THEN 1 ELSE 0 END) > 0
        |             THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS s
        |  FROM (
        |    SELECT doc_id, j, pv,
        |      SUM(CASE WHEN (hv // CAST(pv AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |    FROM shd JOIN hf USING (sh)
        |    CROSS JOIN pw
        |    GROUP BY doc_id, j, pv)
        |  GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.s, b.s)) <= 7
        |ORDER BY id_a, id_b""".stripMargin,

    // Valid as an oracle for the same reason as dedup_incremental:
    // every true >=0.5-jaccard pair in the gate corpora actually sits
    // at j >= 0.889 (sf0.001 floor; 0.9 at sf0.01), where the 8x4
    // band miss probability (1-j^4)^8 is ~4e-4 and ~2e-4
    // respectively, the pipeline is deterministic, and reported
    // jaccards are the exact verify values — so LSH + verify equals
    // this exact formulation (DedupSpec pins full set equality at
    // sf0.001).
    "dedup_minhash_lsh" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s
        |       WHERE len(sh) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(c AS DOUBLE) / (na + nb - c) AS jaccard
        |FROM pairs WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // b-bit minhash audit: exact pairs (same CTEs/completeness as
    // dedup_minhash_lsh) + a bit-exact replay of the engine signature
    // (XXH64 ∘ splitmix64, signed minima, low-b lanes, Li–König
    // correction). Defaults mirror Dedup.bbitMinhashAudit.
    "dedup_bbit_minhash" -> bbitOracle(8, 4, 4, 0.5),

    // D108: banding recall/precision vs the exact >= 0.5 truth set —
    // the signature replay shared with the b-bit oracle, candidates
    // as row-minima list equality per band
    "dedup_recall_report" -> dedupRecallOracle(8, 4, 0.5),
    "dedup_recall_report_sampled" -> dedupRecallOracle(8, 4, 0.5,
      sampleK = Some(4)),

    // the D2 pair CTEs + a provenance rollup; counts integer,
    // max-jaccard exact selection — hash-stable wherever the pair set
    // is (same completeness argument as dedup_minhash_lsh)
    "dedup_source_matrix" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s
        |       WHERE len(sh) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id_a, id_b, CAST(c AS DOUBLE) / (na + nb - c) AS jaccard
        |  FROM pairs WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5)
        |SELECT least(d1.source, d2.source) AS source_a,
        |  greatest(d1.source, d2.source) AS source_b,
        |  COUNT(*) AS n_pairs, MAX(jaccard) AS max_jaccard
        |FROM j JOIN documents d1 ON d1.doc_id = id_a
        |JOIN documents d2 ON d2.doc_id = id_b
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Span-granular dedup: the covered-position set and the positional
    // rewrite are plain integer/array algebra — identical in ANSI SQL.
    "dedup_repeated_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |occ AS (
        |  SELECT doc_id,
        |    unnest(range(0, greatest(len(tk) - 3, 0))) AS pos,
        |    unnest(list_transform(range(0, greatest(len(tk) - 3, 0)),
        |      i -> array_to_string(list_slice(tk, i + 1, i + 4), ' '))) AS gram
        |  FROM t),
        |hot AS (SELECT gram FROM occ GROUP BY gram HAVING COUNT(*) >= 2),
        |cov AS (
        |  SELECT doc_id, list(DISTINCT cp) AS cov FROM (
        |    SELECT doc_id, unnest(range(pos, pos + 4)) AS cp
        |    FROM occ JOIN hot USING (gram))
        |  GROUP BY doc_id),
        |fin AS (
        |  SELECT t.doc_id,
        |    list_filter(tk, (x, i) ->
        |      NOT list_contains(COALESCE(cov, CAST([] AS BIGINT[])), i - 1)) AS ct,
        |    len(tk) AS nt
        |  FROM t LEFT JOIN cov USING (doc_id))
        |SELECT doc_id,
        |  COALESCE(array_to_string(ct, ' '), '') AS clean_text,
        |  CAST(nt - len(ct) AS INTEGER) AS n_removed
        |FROM fin ORDER BY doc_id""".stripMargin,

    // Unigram LM cross-entropy: counts and the top-64 vocab cut are
    // exact integers (ties on the word), so both engines train the
    // SAME model; only ln can drift (libm ulp) plus double-sum
    // reorder (~1e-13 over ≤1k terms), both absorbed by the 6-dp
    // rounding on the published score — the BM25 oracle argument.
    "lm_cross_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE len(trim(text)) > 0),
        |cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 64),
        |dn AS (
        |  SELECT CAST((SELECT SUM(c) FROM cnt)
        |    + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS d),
        |lp AS (
        |  SELECT t.doc_id,
        |    COALESCE(ln(CAST(tp.c + 1 AS DOUBLE) / d), ln(1.0 / d)) AS lnp
        |  FROM tok t LEFT JOIN top tp USING (w), dn),
        |s AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnp) AS sl
        |      FROM lp GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(nt, 0) AS INTEGER) AS n_tokens,
        |  COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS cross_entropy
        |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    // D69: DoReMi replayed exactly — per-doc CE is the ALREADY
    // 6-dp-rounded D37 value lifted to integer micro-units (ROUND
    // makes the double integer-valued, so the BIGINT cast is exact),
    // per-domain mean is an integer //, and the 10-round
    // exponentiated-gradient fold runs over a source-sorted list():
    // list_reduce left-folds in list order = the operator's
    // driver-side foldLeft in sorted-domain order, so only exp/÷
    // ulps can drift — absorbed by the 6-dp weight rounding.
    "doremi_mix" -> {
      val rounds = (1 to 10).map { k =>
        s"""r$k AS (
           |  SELECT ds, ls, dn, lbar,
           |    list_transform(a, x -> (1.0 - 0.01) * (x / s) + 0.01 / dn)
           |      AS w
           |  FROM (
           |    SELECT ds, ls, dn, lbar, a,
           |      list_reduce(a, (x, y) -> x + y) AS s
           |    FROM (
           |      SELECT ds, ls, dn, lbar,
           |        list_transform(range(1, dn + 1),
           |          i -> w[i] * exp(0.1 * greatest(0.0, ls[i] - lbar)))
           |          AS a
           |      FROM r${k - 1})))""".stripMargin
      }.mkString(",\n")
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
         |  FROM documents WHERE len(trim(text)) > 0),
         |cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
         |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 64),
         |dnm AS (
         |  SELECT CAST((SELECT SUM(c) FROM cnt)
         |    + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS d),
         |lp AS (
         |  SELECT t.doc_id,
         |    COALESCE(ln(CAST(tp.c + 1 AS DOUBLE) / d), ln(1.0 / d)) AS lnp
         |  FROM tok t LEFT JOIN top tp USING (w), dnm),
         |sc AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnp) AS sl
         |       FROM lp GROUP BY doc_id),
         |ce AS (
         |  SELECT d.source,
         |    CAST(ROUND(COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE))
         |      * 1000000.0) AS BIGINT) AS micro
         |  FROM documents d LEFT JOIN sc USING (doc_id)),
         |dom AS (
         |  SELECT source AS domain, COUNT(*) AS n_docs,
         |    CAST(SUM(micro) AS BIGINT) AS sm
         |  FROM ce GROUP BY 1),
         |base AS (
         |  SELECT list(domain ORDER BY domain) AS ds,
         |    list(CAST(sm // n_docs AS DOUBLE) / 1000000.0
         |      ORDER BY domain) AS ls,
         |    COUNT(*) AS dn,
         |    CAST((SELECT CAST(SUM(sm) AS BIGINT)
         |            // CAST(SUM(n_docs) AS BIGINT) FROM dom) AS DOUBLE)
         |      / 1000000.0 AS lbar
         |  FROM dom),
         |r0 AS (
         |  SELECT ds, ls, dn, lbar,
         |    list_transform(ls, x -> 1.0 / dn) AS w
         |  FROM base),
         |$rounds
         |SELECT d.domain, d.n_docs,
         |  CAST(d.sm // d.n_docs AS BIGINT) AS mean_loss_micro,
         |  ROUND(r.w[list_position(r.ds, d.domain)], 6) AS weight
         |FROM dom d, r10 r
         |ORDER BY d.domain""".stripMargin
    },
  )
}
