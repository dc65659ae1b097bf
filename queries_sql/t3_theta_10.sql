SELECT MIN(s_name) AS min_sname, COUNT(*) AS n_rows
FROM lineitem, orders, supplier
WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND l_extendedprice > o_totalprice * 0.6
  AND l_quantity <= 20
