-- Big-factor referee override for fs_jw_linkage (same semantics as the
-- ENGINE's documented capped path): the committed oracle expresses the
-- plain blocked self-join, which equals the engine only while every
-- prefix-8 block is under BlockedLinkage's maxBlock=1000 cap (true at
-- gate/bench scale and x2; false at x10, where oversized blocks fall
-- back to sorted-neighborhood windowing). This override replays the
-- cap EXACTLY as BlockedLinkage.candidatePairs implements it:
--   blocks <= 1000  -> exhaustive within-block pairs (id_a < id_b)
--   blocks  > 1000  -> rank by (name, id) inside the block; pair rows
--                      at rank distance 1..64 (window=64); pair ids
--                      normalized least/greatest with values swapped
-- then scores with the committed oracle's identical FS∘JW weight tree.
-- Executed only via GRAFT_ORACLE_OVERRIDES=1.
CREATE TEMP TABLE p AS
  SELECT p_partkey AS pk, p_name AS name, p_brand AS brand,
         p_type AS ptype, substr(p_name, 1, 8) AS blk
  FROM part;
CREATE TEMP TABLE nn AS SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p;
CREATE TEMP TABLE s1 AS
  SELECT CAST(SUM(cc * cc) AS BIGINT) AS ss_name FROM (
    SELECT COUNT(*) AS cc FROM p GROUP BY name);
CREATE TEMP TABLE s2 AS
  SELECT CAST(SUM(cc * cc) AS BIGINT) AS ss_brand FROM (
    SELECT COUNT(*) AS cc FROM p GROUP BY brand);
CREATE TEMP TABLE s3 AS
  SELECT CAST(SUM(cc * cc) AS BIGINT) AS ss_type FROM (
    SELECT COUNT(*) AS cc FROM p GROUP BY ptype);
CREATE TEMP TABLE sizes AS SELECT blk, COUNT(*) AS bn FROM p GROUP BY blk;
CREATE TEMP TABLE cand AS
  SELECT a.pk AS id_a, b.pk AS id_b, a.name AS val_a, b.name AS val_b
  FROM p a
  JOIN p b ON a.blk = b.blk AND a.pk < b.pk
  JOIN sizes s ON s.blk = a.blk
  WHERE s.bn <= 1000
  UNION ALL
  SELECT least(a.pk, b.pk) AS id_a, greatest(a.pk, b.pk) AS id_b,
    CASE WHEN a.pk <= b.pk THEN a.name ELSE b.name END AS val_a,
    CASE WHEN a.pk <= b.pk THEN b.name ELSE a.name END AS val_b
  FROM (SELECT p.*, row_number() OVER (PARTITION BY p.blk
          ORDER BY p.name, p.pk) AS rnk
        FROM p JOIN sizes s USING (blk) WHERE s.bn > 1000) a
  JOIN (SELECT p.*, row_number() OVER (PARTITION BY p.blk
          ORDER BY p.name, p.pk) AS rnk
        FROM p JOIN sizes s USING (blk) WHERE s.bn > 1000) b
    ON a.blk = b.blk AND b.rnk - a.rnk BETWEEN 1 AND 64;
DROP TABLE sizes;
CREATE TEMP TABLE pr AS
  SELECT c.id_a, c.id_b,
    round(jaro_winkler_similarity(c.val_a, c.val_b), 6) AS jw,
    pa.brand IS NOT DISTINCT FROM pb.brand AS agree_brand,
    pa.ptype IS NOT DISTINCT FROM pb.ptype AS agree_type
  FROM cand c
  JOIN p pa ON pa.pk = c.id_a
  JOIN p pb ON pb.pk = c.id_b;
DROP TABLE cand;
DROP TABLE p;
SELECT id_a, id_b, jw, agree_brand, agree_type,
  round(
    (CASE WHEN jw >= 0.94 THEN ln(0.95 / (CAST(ss_name AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
      WHEN jw >= 0.7 THEN greatest(ln((1.0 - 0.95) / (1.0 - (CAST(ss_name AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))),
        ln(0.95 / (CAST(ss_name AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) - (ln(0.95 / (CAST(ss_name AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) - ln((1.0 - 0.95) / (1.0 - (CAST(ss_name AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))))) * (1.0 - jw) * 4.5)
      ELSE ln((1.0 - 0.95) / (1.0 - (CAST(ss_name AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))) END
    + CASE WHEN agree_brand
      THEN ln(0.9 / (CAST(ss_brand AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
      ELSE ln((1.0 - 0.9) / (1.0 - (CAST(ss_brand AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))) END)
    + CASE WHEN agree_type
      THEN ln(0.85 / (CAST(ss_type AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
      ELSE ln((1.0 - 0.85) / (1.0 - (CAST(ss_type AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))) END, 6)
    AS score
FROM pr CROSS JOIN nn CROSS JOIN s1 CROSS JOIN s2 CROSS JOIN s3
ORDER BY score DESC, id_a, id_b LIMIT 50;
