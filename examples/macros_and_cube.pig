-- Macros (DEFINE...RETURNS) + the CUBE statement.
-- Run: python tools/pigout_run.py examples/macros_and_cube.pig \
--        --catalog /root/testdata/sf0.001 --dump per_dim
DEFINE filtered_cube(rel, minqty) RETURNS out {
  f = FILTER $rel BY l_quantity >= $minqty;
  c = CUBE f BY CUBE(l_returnflag, l_linestatus);
  $out = FOREACH c GENERATE FLATTEN(group), COUNT(cube) AS n,
                            SUM(f.l_quantity) AS qty;
};
li = LOAD 'lineitem';
per_dim = filtered_cube(li, 30);
