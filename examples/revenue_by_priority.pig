-- Revenue by order priority for cheap lineitems (joins + fused GROUP agg).
-- Run: python tools/pigout_run.py examples/revenue_by_priority.pig \
--        --catalog /root/testdata/sf0.001 --dump res
li = LOAD 'lineitem';
o  = LOAD 'orders';
cheap = FILTER li BY l_quantity < 10;
j = JOIN cheap BY l_orderkey, o BY o_orderkey;
g = GROUP j BY o_orderpriority;
res = FOREACH g GENERATE group, COUNT(j) AS n, SUM(j.l_extendedprice) AS total;
