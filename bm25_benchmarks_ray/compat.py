"""Environment workarounds.

prime_fsspec_http: Ray Data's path resolution probes
``fsspec.implementations.http`` on every read/write.  Without aiohttp
installed that import FAILS — and failed imports are not cached, so two
threads resolving paths concurrently race inside the import machinery
and one of them surfaces ``ImportError: cannot import name
HTTPFileSystem`` (observed with overlapped group builds).  Importing
the module once under a throwaway aiohttp stub caches a usable module
object in sys.modules; the stub is removed immediately after, so
``import aiohttp`` elsewhere still fails honestly.  The primed module
is only ever isinstance-probed by Ray (we never touch http:// paths).
"""

from __future__ import annotations

import sys
import types

_PRIMED = False


def prime_fsspec_http() -> None:
    global _PRIMED
    if _PRIMED or "fsspec.implementations.http" in sys.modules:
        _PRIMED = True
        return
    try:
        import aiohttp  # noqa: F401  (real library present: nothing to do)

        _PRIMED = True
        return
    except ModuleNotFoundError:
        pass
    stubs = {}
    for name in ("aiohttp", "aiohttp.client_exceptions", "yarl"):
        if name not in sys.modules:
            stubs[name] = sys.modules[name] = types.ModuleType(name)
    if "aiohttp" in stubs:
        stubs["aiohttp"].ClientSession = object
        stubs["aiohttp"].client_exceptions = sys.modules["aiohttp.client_exceptions"]
    if "aiohttp.client_exceptions" in stubs:
        stubs["aiohttp.client_exceptions"].ClientResponseError = Exception
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        pass  # leave the environment as-is; single-threaded paths still work
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
    _PRIMED = True
