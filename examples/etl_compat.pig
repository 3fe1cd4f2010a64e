-- A realistic MapReduce-era ETL script: the syntax soup production Pig
-- jobs actually contain — PARALLEL clauses, bincond ternaries, C-style
-- casts, inline nested statements, compound join keys, GROUP/COGROUP
-- synonymy.  Runs unchanged on pigout_spark (PARALLEL is accepted and
-- superseded by AQE unless pigout.parallel.honor is set).

li = LOAD 'lineitem';
o  = LOAD 'orders';

-- C-style casts + bincond classification
classified = FOREACH o GENERATE
    o_orderkey,
    o_custkey,
    (long)(o_totalprice * 100.0) AS cents,
    (o_totalprice > 150000.0 ? 'big' : (o_totalprice > 50000.0 ? 'mid' : 'small')) AS bucket;

-- compound-key join with PARALLEL, as real scripts write it
enriched = JOIN li BY (l_orderkey, l_orderkey % 2),
                classified BY (o_orderkey, o_orderkey % 2) PARALLEL 16;

-- inline nested statement + PARALLEL on the reduce side
by_bucket = FOREACH (GROUP enriched BY bucket PARALLEL 8) GENERATE
    group AS bucket,
    COUNT(enriched) AS n_lines,
    SUM(enriched.cents) AS total_cents;

big_only = FILTER by_bucket BY EqualsIgnoreCase(bucket, 'BIG');
