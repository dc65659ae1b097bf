SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_comment_null IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_flag,
       MIN(o_orderpriority) AS min_prio
FROM (
    SELECT o.o_orderpriority,
           CASE WHEN o.o_totalprice > 100000 THEN NULL ELSE o.o_orderstatus END
             AS o_comment_null
    FROM lineitem l, orders o
    WHERE l.l_orderkey = o.o_orderkey
      AND o.o_orderstatus = 'F'
      AND COALESCE(l.l_quantity, 0) >= 5) t
