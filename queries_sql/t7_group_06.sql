SELECT p_brand, COUNT(*) AS n_rows, MIN(s_name) AS min_sname
FROM lineitem, part, supplier, nation, region
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND p_type = 'MEDIUM' AND r_name = 'ASIA'
GROUP BY p_brand
HAVING COUNT(*) >= 12
