-- Big-factor referee override for pagerank_personalized (same semantics as the
-- committed unrolled-CTE oracle): DuckDB keeps all 10 rounds' CTEs
-- live and spills past the sandbox disk at x10; materializing each
-- round as a TEMP TABLE and dropping the previous bounds the working
-- set to one round (the community_labels recipe). Executed only by
-- tools/check_each.py's override hook (GRAFT_ORACLE_OVERRIDES=1);
-- the committed driver-gate oracle is unchanged.
CREATE TEMP TABLE cs AS
  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey;
CREATE TEMP TABLE edges AS
  SELECT c AS src, s AS dst FROM cs UNION SELECT s, c FROM cs;
DROP TABLE cs;
CREATE TEMP TABLE nodes AS
  SELECT CAST(c_custkey AS BIGINT) AS id,
    CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(1 AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS w
  FROM customer
  UNION ALL SELECT s_suppkey + 1000000, 0 FROM supplier;
CREATE TEMP TABLE tv AS
  SELECT id,
    CAST((1000000000 * w) // (SELECT SUM(w) FROM nodes) AS BIGINT) AS t
  FROM nodes;
DROP TABLE nodes;
CREATE TEMP TABLE eo AS
  SELECT e.src, e.dst, o.outdeg FROM edges e
  JOIN (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src) o
    USING (src);
DROP TABLE edges;
CREATE TEMP TABLE pr0 AS SELECT id, t AS "rank" FROM tv;
CREATE TEMP TABLE pr1 AS
  SELECT n.id, (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
  FROM tv n LEFT JOIN (
    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
    FROM eo e JOIN pr0 r ON r.id = e.src
    GROUP BY e.dst) s ON s.dst = n.id;
DROP TABLE pr0;
CREATE TEMP TABLE pr2 AS
  SELECT n.id, (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
  FROM tv n LEFT JOIN (
    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
    FROM eo e JOIN pr1 r ON r.id = e.src
    GROUP BY e.dst) s ON s.dst = n.id;
DROP TABLE pr1;
CREATE TEMP TABLE pr3 AS
  SELECT n.id, (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
  FROM tv n LEFT JOIN (
    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
    FROM eo e JOIN pr2 r ON r.id = e.src
    GROUP BY e.dst) s ON s.dst = n.id;
DROP TABLE pr2;
CREATE TEMP TABLE pr4 AS
  SELECT n.id, (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
  FROM tv n LEFT JOIN (
    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
    FROM eo e JOIN pr3 r ON r.id = e.src
    GROUP BY e.dst) s ON s.dst = n.id;
DROP TABLE pr3;
CREATE TEMP TABLE pr5 AS
  SELECT n.id, (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
  FROM tv n LEFT JOIN (
    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
    FROM eo e JOIN pr4 r ON r.id = e.src
    GROUP BY e.dst) s ON s.dst = n.id;
DROP TABLE pr4;
CREATE TEMP TABLE pr6 AS
  SELECT n.id, (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
  FROM tv n LEFT JOIN (
    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
    FROM eo e JOIN pr5 r ON r.id = e.src
    GROUP BY e.dst) s ON s.dst = n.id;
DROP TABLE pr5;
CREATE TEMP TABLE pr7 AS
  SELECT n.id, (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
  FROM tv n LEFT JOIN (
    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
    FROM eo e JOIN pr6 r ON r.id = e.src
    GROUP BY e.dst) s ON s.dst = n.id;
DROP TABLE pr6;
CREATE TEMP TABLE pr8 AS
  SELECT n.id, (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
  FROM tv n LEFT JOIN (
    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
    FROM eo e JOIN pr7 r ON r.id = e.src
    GROUP BY e.dst) s ON s.dst = n.id;
DROP TABLE pr7;
CREATE TEMP TABLE pr9 AS
  SELECT n.id, (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
  FROM tv n LEFT JOIN (
    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
    FROM eo e JOIN pr8 r ON r.id = e.src
    GROUP BY e.dst) s ON s.dst = n.id;
DROP TABLE pr8;
CREATE TEMP TABLE pr10 AS
  SELECT n.id, (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
  FROM tv n LEFT JOIN (
    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
    FROM eo e JOIN pr9 r ON r.id = e.src
    GROUP BY e.dst) s ON s.dst = n.id;
DROP TABLE pr9;
SELECT id, CAST("rank" AS BIGINT) AS "rank" FROM pr10 ORDER BY id;
