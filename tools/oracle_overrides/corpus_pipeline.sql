-- Big-factor referee override for corpus_pipeline (same semantics as
-- the committed oracle): the 16-stage pipeline CTE chain (quality
-- filter -> exact dedup -> shingle near-dup edges -> recursive
-- reachability -> decontamination -> lang-id -> hash split) keeps
-- every stage live in DuckDB and spills past the sandbox disk at x10.
-- Each stage becomes a TEMP TABLE dropped as soon as its last
-- consumer ran (the community_labels recipe); stage SQL is the
-- committed oracle text verbatim, with CTE references now reading
-- the temp tables. `reach` stays a recursive CTE but reads the
-- materialized edge list. Executed only via GRAFT_ORACLE_OVERRIDES=1.

CREATE TEMP TABLE corp AS
SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0;
CREATE TEMP TABLE tq AS
SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS tk FROM corp;
DROP TABLE corp;
CREATE TEMP TABLE qual AS
SELECT doc_id, text, tk FROM (
    SELECT doc_id, text, tk,
      CAST(len(tk) AS DOUBLE) AS n,
      CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
      CAST(len(list_filter(tk, x -> list_contains(
        ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS hcnt
    FROM tq)
  WHERE 0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
      + 0.2 * least((hcnt / n) * 8.0, 1.0) >= 0.2;
DROP TABLE tq;
CREATE TEMP TABLE exact AS
SELECT doc_id, text, tk FROM (
    SELECT doc_id, text, tk, MIN(doc_id) OVER (PARTITION BY text) AS cmin
    FROM qual)
  WHERE doc_id = cmin;
DROP TABLE qual;
CREATE TEMP TABLE sh AS
SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s3 FROM exact;
CREATE TEMP TABLE ex AS
SELECT doc_id, len(s3) AS n3, unnest(s3) AS shingle FROM sh WHERE len(s3) > 0;
DROP TABLE sh;
CREATE TEMP TABLE pairs AS
SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
    any_value(a.n3) AS na, any_value(b.n3) AS nb
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
  GROUP BY 1, 2;
DROP TABLE ex;
CREATE TEMP TABLE edges AS
SELECT ida, idb FROM pairs
  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8;
DROP TABLE pairs;
CREATE TEMP TABLE und AS
SELECT ida AS src, idb AS dst FROM edges
  UNION ALL SELECT idb, ida FROM edges;
DROP TABLE edges;
CREATE TEMP TABLE reachmin AS
WITH RECURSIVE reach AS (
SELECT src, dst FROM und
  UNION
  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst
)
SELECT src, MIN(dst) AS mind FROM reach GROUP BY src;
DROP TABLE und;
CREATE TEMP TABLE reps AS
SELECT e.doc_id, e.text, e.tk FROM exact e
  LEFT JOIN reachmin m
    ON m.src = e.doc_id
  WHERE e.doc_id <= COALESCE(m.mind, e.doc_id);
DROP TABLE reachmin;
DROP TABLE exact;
CREATE TEMP TABLE bg AS
SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(tk) - 6),
    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7]))) AS gram
  FROM (SELECT string_split_regex(trim(text), '\s+') AS tk
        FROM documents WHERE doc_id % 10 = 0);
CREATE TEMP TABLE dirty AS
SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 6),
      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7]))) AS gram
    FROM reps) g
  JOIN bg USING (gram);
DROP TABLE bg;
CREATE TEMP TABLE clean AS
SELECT r.doc_id, r.tk FROM reps r
  WHERE r.doc_id NOT IN (SELECT doc_id FROM dirty);
DROP TABLE dirty;
DROP TABLE reps;
CREATE TEMP TABLE lang AS
SELECT doc_id, CASE WHEN greatest(he, hf, hd, hs) = 0 THEN 'und'
         WHEN he = greatest(he, hf, hd, hs) THEN 'en'
         WHEN hf = greatest(he, hf, hd, hs) THEN 'fr'
         WHEN hd = greatest(he, hf, hd, hs) THEN 'de'
         ELSE 'es' END AS lang
  FROM (
    SELECT doc_id,
      len(list_filter(tk, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS he,
      len(list_filter(tk, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS hf,
      len(list_filter(tk, x -> list_contains(['der','die','und','das','ein','nicht'], x))) AS hd,
      len(list_filter(tk, x -> list_contains(['el','los','y','que','un','una','en'], x))) AS hs
    FROM clean);
CREATE TEMP TABLE hb AS
SELECT doc_id, (((CAST(CASE WHEN hout >= 9223372036854775808 THEN hout - 18446744073709551616 ELSE hout END AS BIGINT)) % 1000000) + 1000000) % 1000000 AS bucket
  FROM (SELECT *, xor(CAST(f4 AS HUGEINT), CAST((f4) // 4294967296 AS HUGEINT)) AS hout FROM (SELECT *, (((f3) % 4294967296) * ((1609587929392839161) % 4294967296) + ((((f3) // 4294967296) * ((1609587929392839161) % 4294967296) + ((f3) % 4294967296) * ((1609587929392839161) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS f4 FROM (SELECT *, xor(CAST(f2 AS HUGEINT), CAST((f2) // 536870912 AS HUGEINT)) AS f3 FROM (SELECT *, (((f1) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((f1) // 4294967296) * ((14029467366897019727) % 4294967296) + ((f1) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS f2 FROM (SELECT *, xor(CAST(h2 AS HUGEINT), CAST((h2) // 8589934592 AS HUGEINT)) AS f1 FROM (SELECT *, ((((h1r) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((h1r) // 4294967296) * ((11400714785074694791) % 4294967296) + ((h1r) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) + 9650029242287828579) % 18446744073709551616 AS h2 FROM (SELECT *, (((h1) % 137438953472) * 134217728) + ((h1) // 137438953472) AS h1r FROM (SELECT *, xor(CAST(14440755233413290667 AS HUGEINT), CAST(k3 AS HUGEINT)) AS h1 FROM (SELECT *, (((k2) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((k2) // 4294967296) * ((11400714785074694791) % 4294967296) + ((k2) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS k3 FROM (SELECT *, (((k1) % 8589934592) * 2147483648) + ((k1) // 8589934592) AS k2 FROM (SELECT *, (((xv) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((xv) // 4294967296) * ((14029467366897019727) % 4294967296) + ((xv) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS k1 FROM (SELECT *, CAST(doc_id AS HUGEINT) AS xv FROM (SELECT doc_id FROM clean)))))))))))));
DROP TABLE clean;
SELECT l.doc_id, l.lang,
  CASE WHEN hb.bucket < 900000 THEN 0
       WHEN hb.bucket < 950000 THEN 1 ELSE 2 END AS split
FROM lang l JOIN hb USING (doc_id)
ORDER BY l.doc_id;
