SELECT MIN(c_name) AS min_cname, MAX(o_orderdate) AS max_odate,
       COUNT(*) AS n_rows
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND c_nationkey = n_nationkey
  AND c_mktsegment = 'FURNITURE'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
