"""Recursive directory iteration.

Mirrors ``sw.DirectoryCrawler`` (reference ``src/sw/DirectoryCrawler.java``):
a depth-first walk yielding every regular file under a root, expanding
subdirectories in place as they are encountered.

Deviation (documented): the reference iterates ``File.listFiles()`` order,
which is filesystem-dependent and unspecified; we sort each directory's
entries by name so traversal is deterministic across machines.  A missing
root raises :class:`FileNotFoundError` instead of the reference's
``System.exit(0)`` (``DirectoryCrawler.java:30-34``).
"""

from __future__ import annotations

import os
from typing import Iterator


def iter_files(root: str | os.PathLike) -> Iterator[str]:
    """Yield every file under ``root`` in sorted depth-first order."""
    root = os.fspath(root)
    if not os.path.exists(root):
        raise FileNotFoundError(f"Root directory not found: {root}")
    if os.path.isfile(root):
        yield root
        return
    for entry in sorted(os.listdir(root)):
        path = os.path.join(root, entry)
        if os.path.isdir(path):
            yield from iter_files(path)
        else:
            yield path
