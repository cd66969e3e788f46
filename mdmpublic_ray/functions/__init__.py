"""Vectorized scalar-function library (SURVEY.md §2.8).

Reimplements the reference's scalar vocabulary (string / date / math /
array / json / hash families) as numpy / pyarrow.compute kernels that run
inside ``map_batches`` over Arrow batches.
"""
