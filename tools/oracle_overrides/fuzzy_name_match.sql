-- Big-factor referee override for fuzzy_name_match (same semantics as
-- the committed cartesian oracle): all pairs at levenshtein <= 1.
-- The committed oracle expresses the UNCAPPED n^2 comparison and
-- exceeds any referee budget at x10. This override uses FastSS
-- deletion-1 neighborhood blocking — two strings at distance <= 1
-- ALWAYS share a member of each other's deletion-1 neighborhood
-- (equal: the string; substitution at i: delete-at-i; insertion: the
-- shorter string), so the variant equality join yields a candidate
-- SUPERSET and the exact levenshtein verify restores precisely the
-- committed predicate. Provably result-identical at every scale, cost
-- O(n*len) + candidate volume instead of O(n^2).
-- Executed only via GRAFT_ORACLE_OVERRIDES=1.
CREATE TEMP TABLE v AS
  SELECT c_custkey AS id, u.var FROM customer,
    unnest(list_distinct(list_prepend(c_name,
      list_transform(range(1, length(c_name) + 1),
        i -> substr(c_name, 1, i - 1)
          || substr(c_name, i + 1, length(c_name) - i))))) AS u(var);
CREATE TEMP TABLE cand AS
  SELECT DISTINCT a.id AS a_id, b.id AS b_id
  FROM v a JOIN v b ON a.var = b.var AND a.id < b.id;
DROP TABLE v;
SELECT a.c_custkey AS a_id, a.c_name AS a_val,
  b.c_custkey AS b_id, b.c_name AS b_val,
  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
FROM cand
  JOIN customer a ON a.c_custkey = cand.a_id
  JOIN customer b ON b.c_custkey = cand.b_id
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY a_id, b_id;
