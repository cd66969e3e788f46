"""mdmpublic_ray — a Ray-Data-native entity-resolution / data-processing engine.

A from-scratch reimplementation of the data-processing capabilities of the
``linearregression/mdmpublic`` MDM ops repo (surveyed in ``SURVEY.md``) as an
idiomatic Ray Data engine: ``ray.data.Dataset`` pipelines of zero-copy Arrow
``map_batches`` stages, actor pools for stateful work, explicit ``groupby`` /
``sort`` shuffles for the wide steps, and Parquet + manifest checkpoints for
resumable runs.

Layout:
  functions/  vectorized scalar libraries (text, urls, hashing, quality)
  sources/    readers over the driver-provided parquet tables
  stages/     pipeline stages (extract, dedup, blocking, pairs, scoring,
              clustering, golden records, ANN)
  pipelines/  end-to-end pipelines + the conformance query registry
  state/      lineage manifests / metrics / resumable checkpoint runner

Library code NEVER calls ``ray.init()`` — sessions are owned by the driver,
``bench.py`` and the pytest fixture only.
"""

__version__ = "0.1.0"

from ._compat import ensure_fsspec_http_importable as _ensure_fsspec_http

_ensure_fsspec_http()
del _ensure_fsspec_http
