SELECT MIN(p1.p_name) AS min_p1, MIN(p2.p_name) AS min_p2,
       MIN(n2.n_name) AS min_suppnation1, MIN(r3.r_name) AS min_suppregion2,
       COUNT(*) AS n_rows
FROM lineitem l1, lineitem l2, orders o, orders o2, customer c,
     nation n1, region r1, part p1, supplier s1, nation n2, region r2,
     part p2, supplier s2, nation n3, region r3
WHERE l1.l_orderkey = o.o_orderkey AND l2.l_orderkey = o.o_orderkey
  AND o.o_custkey = c.c_custkey AND o2.o_custkey = c.c_custkey
  AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r1.r_regionkey
  AND l1.l_partkey = p1.p_partkey AND l1.l_suppkey = s1.s_suppkey
  AND s1.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
  AND l2.l_partkey = p2.p_partkey AND l2.l_suppkey = s2.s_suppkey
  AND s2.s_nationkey = n3.n_nationkey AND n3.n_regionkey = r3.r_regionkey
  AND l1.l_linenumber < l2.l_linenumber
  AND o2.o_orderdate > o.o_orderdate
  AND p1.p_name LIKE '%in%' AND p2.p_name NOT LIKE '%pink%'
  AND c.c_name LIKE 'Customer#%'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND r1.r_name = 'MIDDLE EAST'
