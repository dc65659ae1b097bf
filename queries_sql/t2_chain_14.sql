SELECT MIN(c_name) AS min_cname, MAX(o_orderdate) AS max_odate,
       COUNT(*) AS n_rows
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND c_nationkey = n_nationkey
  AND c_mktsegment = 'HOUSEHOLD'
  AND o_orderdate >= TIMESTAMP '1996-06-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-06-01 00:00:00'
