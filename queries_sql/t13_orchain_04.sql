SELECT MIN(p_name) AS min_pname, MIN(r_name) AS min_rname, COUNT(*) AS n_rows
FROM lineitem, part, supplier, nation, region
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND (p_name LIKE '%ea%' OR p_name LIKE '%ot%')
  AND (r_name = 'EUROPE' OR r_name = 'AMERICA')
  AND (l_quantity <= 15 OR l_discount >= 0.08)
