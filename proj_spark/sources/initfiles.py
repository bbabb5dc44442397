"""Init-file catalogs: ``+init=file:key`` resolution.

Behavioral reference: get_init/get_opt (/root/reference/src/
pj_init.c:54-239) — a catalog file holds ``<key> +param ... <>``
blocks; lookup finds the tagged block and returns its parameters.
``#`` starts a comment; a block ends at ``<>``.

Resolution order (pj_open_lib semantics, src/pj_open_lib.c:45-118):
absolute/relative path as given, then each dir on the search path
(``set_search_path`` / $PROJ_SPARK_LIB), then the bundled catalogs in
``proj_spark/data/init/``.  Results are memoized per (file, key) like
pj_initcache.c.

Driver-side only: catalogs resolve at CRS-compile time; executors see
the already-merged parameter dict inside the broadcast plan.
"""
from __future__ import annotations

import os
from functools import lru_cache

_SEARCH_PATH: list[str] = []
_BUNDLED = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "init")


def set_search_path(dirs: list[str]) -> None:
    """Replace the catalog search path (pj_set_searchpath analog)."""
    global _SEARCH_PATH
    _SEARCH_PATH = list(dirs)
    _read_init_file.cache_clear()


def _resolve_file(name: str) -> str:
    if os.path.isabs(name) and os.path.exists(name):
        return name
    for d in [*_SEARCH_PATH, os.environ.get("PROJ_SPARK_LIB", ""), _BUNDLED]:
        if not d:
            continue
        cand = os.path.join(d, name)
        if os.path.exists(cand):
            return cand
    # zip deployment (spark-submit --py-files proj_spark.zip): the
    # bundled catalogs live inside the archive, not on the filesystem —
    # resolve through the package reader instead of os.path
    try:
        from importlib.resources import files

        if files("proj_spark").joinpath("data", "init", name).is_file():
            return f"res://{name}"
    except (ImportError, OSError, ValueError):
        pass
    raise FileNotFoundError(f"init catalog {name!r} not found (search path + bundled)")


@lru_cache(maxsize=64)
def _read_init_file(path: str) -> dict[str, str]:
    """Parse a whole catalog file into {key: 'param string'}."""
    entries: dict[str, str] = {}
    key = None
    buf: list[str] = []
    if path.startswith("res://"):
        from importlib.resources import files

        opener = (
            files("proj_spark")
            .joinpath("data", "init", path[len("res://") :])
            .open("r", encoding="utf-8", errors="replace")
        )
    else:
        opener = open(path, "r", encoding="utf-8", errors="replace")
    with opener as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            while line:
                if key is None:
                    if line.startswith("<"):
                        end = line.index(">")
                        key = line[1:end]
                        line = line[end + 1 :].strip()
                        buf = []
                    else:
                        line = ""  # prose outside blocks is ignored
                else:
                    if "<>" in line:
                        head, _, _ = line.partition("<>")
                        if head.strip():
                            buf.append(head.strip())
                        entries[key] = " ".join(buf)
                        key = None
                        line = ""
                    else:
                        buf.append(line)
                        line = ""
    return entries


def get_init(spec: str) -> str:
    """``file:key`` -> the catalog block's parameter string
    (get_init, ref src/pj_init.c:244-291)."""
    if ":" not in spec:
        raise ValueError(f"+init spec must be file:key, got {spec!r}")
    fname, key = spec.rsplit(":", 1)
    path = _resolve_file(fname)
    entries = _read_init_file(path)
    if key not in entries:
        raise KeyError(f"key {key!r} not found in init file {path}")
    return entries[key]
