"""Environment-compat shims.

fsspec's HTTP filesystem needs ``aiohttp``, which is not installed in this
environment.  That is normally fine: Ray's path resolution probes
``from fsspec.implementations.http import HTTPFileSystem`` inside a
``try/except ModuleNotFoundError`` and treats failure as "not an HTTP fs".

But a *failed* import is never cached in ``sys.modules``, so every probe
re-runs the import — and when two threads probe concurrently (e.g. the ER
pipeline's hot-host discovery thread racing the main driver thread, both
resolving parquet paths), one thread can observe the other's
partially-initialized ``fsspec.implementations.http`` module and raise a bare
``ImportError: cannot import name 'HTTPFileSystem'`` instead of
``ModuleNotFoundError`` — which Ray does NOT catch, crashing the pipeline.

Fix: when ``aiohttp`` is genuinely unavailable, pre-install a stub module
whose ``HTTPFileSystem`` is a sentinel class that is never instantiated.
A *successful* import IS cached, so the race window disappears, and Ray's
``isinstance(fs, HTTPFileSystem)`` checks correctly return False (no stub
instance can ever exist) — semantically identical to the except-path.
"""

import sys
import types


def ensure_fsspec_http_importable() -> None:
    """Make ``fsspec.implementations.http`` import deterministically.

    No-op when the real module is importable (aiohttp present) or fsspec
    itself is absent.
    """
    if "fsspec.implementations.http" in sys.modules:
        return
    try:
        import fsspec.implementations  # noqa: F401
    except Exception:
        return
    try:
        import aiohttp  # noqa: F401
        return  # real module will import fine; don't shadow it
    except ImportError:
        pass

    mod = types.ModuleType("fsspec.implementations.http")
    mod.__doc__ = (
        "Stub installed by mdmpublic_ray._compat: aiohttp is unavailable, so "
        "the real HTTPFileSystem can never be constructed. This sentinel "
        "class exists only so isinstance() probes import deterministically."
    )

    class HTTPFileSystem:  # sentinel — never instantiated
        def __init__(self, *a, **k):
            raise ImportError(
                "HTTPFileSystem requires aiohttp, which is not installed"
            )

    HTTPFileSystem.__module__ = "fsspec.implementations.http"
    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    sys.modules["fsspec.implementations"].http = mod
