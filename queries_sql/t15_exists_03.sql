SELECT COUNT(*) AS n_custs, MIN(c_name) AS min_name
FROM customer c
WHERE c.c_mktsegment = 'AUTOMOBILE'
  AND EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_totalprice > 180000
        AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
  AND NOT EXISTS (
      SELECT 1 FROM orders o2
      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
        AND o2.o_totalprice < 5000)
