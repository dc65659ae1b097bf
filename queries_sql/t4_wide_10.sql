SELECT MIN(p_name) AS min_pname, MIN(n_name) AS min_nname,
       MIN(r_name) AS min_rname, COUNT(*) AS n_rows
FROM lineitem, part, supplier, nation, region, orders
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND l_orderkey = o_orderkey
  AND p_size BETWEEN 12 AND 38
  AND o_orderstatus = 'F'
  AND l_discount < 0.06
