SELECT MIN(p.p_name) AS min_pname, MIN(c.c_name) AS min_cname,
       MIN(n2.n_name) AS min_suppnation, COUNT(*) AS n_rows
FROM lineitem l, orders o, customer c, nation n1, region r1,
     supplier s, nation n2, part p
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r1.r_regionkey
  AND l.l_suppkey = s.s_suppkey AND s.s_nationkey = n2.n_nationkey
  AND l.l_partkey = p.p_partkey
  AND r1.r_name = 'AFRICA' AND p.p_size BETWEEN 1 AND 25
  AND o.o_orderstatus = 'F'
