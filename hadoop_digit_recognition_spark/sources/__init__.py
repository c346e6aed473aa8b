"""Sources & sinks (SURVEY.md §2.1).

Engine standard is columnar Parquet (S1/S2 get pushdown + pruning for
free). This package adds fidelity codecs for the reference's native
formats: text example lines (one example per line, space-separated ints
0-255, optional `offset\\t` prefix from TextOutputFormat) and the
one-line 3-decimal weight file (/root/reference/driver.java:126-138).
"""
