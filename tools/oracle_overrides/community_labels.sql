-- Big-factor referee override for community_labels (same semantics as
-- OracleFns.lpaOracle(5), restructured): the unrolled 5-round LPA CTE
-- chain spills >79 GB in DuckDB at x10 because every round's h/b/l
-- stays live; materializing each round as a TEMP TABLE and dropping
-- the previous bounds the working set to one round. Executed only by
-- tools/check_each.py's override hook for on-disk scale sweeps; the
-- committed driver-gate oracle is unchanged.
CREATE TEMP TABLE lp AS
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem;
CREATE TEMP TABLE pr AS
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk;
DROP TABLE lp;
CREATE TEMP TABLE e AS
  SELECT u AS src, v AS dst FROM pr UNION ALL SELECT v, u FROM pr;
DROP TABLE pr;
CREATE TEMP TABLE l0 AS
  SELECT CAST(p_partkey AS BIGINT) AS id,
         CAST(p_partkey AS BIGINT) AS community FROM part;

CREATE TEMP TABLE h1 AS
  SELECT e.src, l.community, COUNT(*) AS c
  FROM e JOIN l0 l ON l.id = e.dst GROUP BY e.src, l.community;
CREATE TEMP TABLE b1 AS
  SELECT src AS id, community AS next FROM (
    SELECT src, community,
      ROW_NUMBER() OVER (PARTITION BY src
        ORDER BY c DESC, community ASC) AS rn
    FROM h1) WHERE rn = 1;
DROP TABLE h1;
CREATE TEMP TABLE l1 AS
  SELECT l.id, COALESCE(b.next, l.community) AS community
  FROM l0 l LEFT JOIN b1 b USING (id);
DROP TABLE b1;
DROP TABLE l0;

CREATE TEMP TABLE h2 AS
  SELECT e.src, l.community, COUNT(*) AS c
  FROM e JOIN l1 l ON l.id = e.dst GROUP BY e.src, l.community;
CREATE TEMP TABLE b2 AS
  SELECT src AS id, community AS next FROM (
    SELECT src, community,
      ROW_NUMBER() OVER (PARTITION BY src
        ORDER BY c DESC, community ASC) AS rn
    FROM h2) WHERE rn = 1;
DROP TABLE h2;
CREATE TEMP TABLE l2 AS
  SELECT l.id, COALESCE(b.next, l.community) AS community
  FROM l1 l LEFT JOIN b2 b USING (id);
DROP TABLE b2;
DROP TABLE l1;

CREATE TEMP TABLE h3 AS
  SELECT e.src, l.community, COUNT(*) AS c
  FROM e JOIN l2 l ON l.id = e.dst GROUP BY e.src, l.community;
CREATE TEMP TABLE b3 AS
  SELECT src AS id, community AS next FROM (
    SELECT src, community,
      ROW_NUMBER() OVER (PARTITION BY src
        ORDER BY c DESC, community ASC) AS rn
    FROM h3) WHERE rn = 1;
DROP TABLE h3;
CREATE TEMP TABLE l3 AS
  SELECT l.id, COALESCE(b.next, l.community) AS community
  FROM l2 l LEFT JOIN b3 b USING (id);
DROP TABLE b3;
DROP TABLE l2;

CREATE TEMP TABLE h4 AS
  SELECT e.src, l.community, COUNT(*) AS c
  FROM e JOIN l3 l ON l.id = e.dst GROUP BY e.src, l.community;
CREATE TEMP TABLE b4 AS
  SELECT src AS id, community AS next FROM (
    SELECT src, community,
      ROW_NUMBER() OVER (PARTITION BY src
        ORDER BY c DESC, community ASC) AS rn
    FROM h4) WHERE rn = 1;
DROP TABLE h4;
CREATE TEMP TABLE l4 AS
  SELECT l.id, COALESCE(b.next, l.community) AS community
  FROM l3 l LEFT JOIN b4 b USING (id);
DROP TABLE b4;
DROP TABLE l3;

CREATE TEMP TABLE h5 AS
  SELECT e.src, l.community, COUNT(*) AS c
  FROM e JOIN l4 l ON l.id = e.dst GROUP BY e.src, l.community;
CREATE TEMP TABLE b5 AS
  SELECT src AS id, community AS next FROM (
    SELECT src, community,
      ROW_NUMBER() OVER (PARTITION BY src
        ORDER BY c DESC, community ASC) AS rn
    FROM h5) WHERE rn = 1;
DROP TABLE h5;
CREATE TEMP TABLE l5 AS
  SELECT l.id, COALESCE(b.next, l.community) AS community
  FROM l4 l LEFT JOIN b5 b USING (id);
DROP TABLE b5;
DROP TABLE l4;
SELECT l.id, l.community, cs.csize
FROM l5 l JOIN (SELECT community, COUNT(*) AS csize
                FROM l5 GROUP BY community) cs USING (community)
ORDER BY l.id
