-- The canonical Pig wordcount over the documents corpus.
d = LOAD 'documents';
words = FOREACH d GENERATE FLATTEN(TOKENIZE(text)) AS w;
g = GROUP words BY w;
counts = FOREACH g GENERATE group, COUNT(words) AS n;
top = ORDER counts BY n DESC, group;
t20 = LIMIT top 20;
