SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_no_order,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_matched,
       MIN(c.c_name) AS min_name
FROM customer c
LEFT JOIN orders o
  ON o.o_custkey = c.c_custkey
 AND o.o_orderstatus = 'O'
 AND o.o_totalprice > 150000
WHERE c.c_mktsegment = 'BUILDING'
