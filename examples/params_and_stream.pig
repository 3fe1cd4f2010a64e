-- Parameter substitution + STREAM THROUGH an external command.
-- Run with params={'MINQTY': '40'} (or %declare below takes effect).
%declare MINQTY '40';
li = LOAD 'lineitem';
big = FILTER li BY l_quantity >= $MINQTY;
p = FOREACH big GENERATE l_orderkey, l_linenumber;
DEFINE identity `cat`;
piped = STREAM p THROUGH identity AS (k:chararray, ln:chararray);
