SELECT c.c_custkey,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
         WHERE o.o_custkey = c.c_custkey
           AND o.o_orderstatus = 'O') AS n_status,
       (SELECT MAX(o2.o_totalprice) FROM orders o2
         WHERE o2.o_custkey = c.c_custkey) AS max_spend
FROM customer c
WHERE c.c_mktsegment = 'BUILDING'
  AND c.c_acctbal > 6000
