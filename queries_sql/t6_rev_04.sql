SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem, orders, supplier, nation
WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND o_orderpriority = '1-URGENT'
  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
