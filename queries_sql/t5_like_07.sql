SELECT MIN(p_name) AS min_pname, MIN(o_orderpriority) AS min_prio,
       COUNT(*) AS n_rows
FROM lineitem, part, orders
WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
  AND p_name LIKE '%en%' AND p_name NOT LIKE '%ivory%'
  AND o_orderpriority LIKE '2-%'
