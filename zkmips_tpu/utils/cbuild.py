"""Content-addressed builds for the native C runtime (csrc/).

Each loader compiles ``csrc/<name>.c`` to ``csrc/lib<name>-<crc>.so`` where
``<crc>`` hashes the source text: a stale binary can never be picked up after
a source change, regardless of filesystem mtimes (git checkouts reset mtimes,
which defeated the old mtime comparison).  Older hash-named binaries are
best-effort pruned.
"""

from __future__ import annotations

import glob
import os
import subprocess
import zlib


def build(src: str, extra_flags: tuple[str, ...] = ()) -> str:
    """Compile ``src`` (a .c path) to a content-hash-named .so; return path."""
    with open(src, "rb") as fh:
        crc = zlib.crc32(fh.read()) & 0xFFFFFFFF
    base = os.path.basename(src)[: -len(".c")]
    d = os.path.dirname(src)
    so = os.path.join(d, f"lib{base}-{crc:08x}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        subprocess.run(
            ["cc", "-O3", *extra_flags, "-shared", "-fPIC", "-o", tmp, src],
            check=True,
        )
        os.replace(tmp, so)  # atomic under concurrent builders
        for old in glob.glob(os.path.join(d, f"lib{base}-????????.so")):
            if old != so:
                try:
                    os.remove(old)
                except OSError:
                    pass
    return so
