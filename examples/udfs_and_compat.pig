-- Script UDFs (REGISTER of a Python file — the Jython analog, run as
-- native CPython) + Pig-compat CUBE 'all' markers via SET.
-- Run: python tools/pigout_run.py examples/udfs_and_compat.pig \
--        --catalog /root/testdata/sf0.001 --dump by_dim
REGISTER 'examples/udfs.py' USING jython AS fns;
SET pigout.cube.all_marker true;

li = LOAD 'lineitem';
scored = FOREACH li GENERATE l_returnflag, l_linestatus,
                             fns.net_price(l_extendedprice, l_discount) AS net;
c = CUBE scored BY CUBE(l_returnflag, l_linestatus);
by_dim = FOREACH c GENERATE FLATTEN(group), COUNT(cube) AS n,
                            SUM(scored.net) AS net_total;
