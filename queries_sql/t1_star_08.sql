SELECT MIN(p_name) AS min_pname, MIN(s_name) AS min_sname, COUNT(*) AS n_rows
FROM lineitem, part, supplier, nation, region
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND p_brand = 'Brand#23' AND r_name = 'AMERICA'
  AND l_quantity BETWEEN 30 AND 50
