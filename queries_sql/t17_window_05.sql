SELECT c_custkey, o_orderkey, rnk,
       CAST(run_cnt AS BIGINT) AS run_cnt, prio_delta
FROM (
    SELECT c.c_custkey, o.o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS BIGINT) AS rnk,
           COUNT(*) OVER (PARTITION BY c.c_custkey
                ORDER BY o.o_orderdate, o.o_orderkey
                ROWS UNBOUNDED PRECEDING) AS run_cnt,
           CASE WHEN LAG(o.o_orderpriority) OVER (PARTITION BY c.c_custkey
                     ORDER BY o.o_orderdate, o.o_orderkey)
                     = o.o_orderpriority
                THEN 0 ELSE 1 END AS prio_delta
    FROM customer c, orders o
    WHERE c.c_custkey = o.o_custkey
      AND o.o_orderstatus = 'O'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00') t
WHERE rnk <= 2
