SELECT MIN(c_name) AS min_cname, MAX(o_orderdate) AS max_odate,
       COUNT(*) AS n_rows
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND c_nationkey = n_nationkey
  AND c_mktsegment = 'BUILDING'
  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
