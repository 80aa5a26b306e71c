"""PySpark-native reimplementation of Docprompt's document extraction core.

A from-scratch engine (NOT a port): DataFrame pipeline over tables of
interleaved text+media documents — PDF byte-stream parsing, layout-aware
reading-order reconstruction, ordered span-sequence emission — plus a
relational / dedup / similarity operator surface for large-scale
training-data pipelines. Reference semantics: docprompt/Docprompt
(/root/reference, read-only); architecture: idiomatic PySpark DataFrame +
Arrow-vectorized UDFs.
"""

__version__ = "0.1.0"
