"""Build the `_vrtnative` C extension in-place.

Usage: python -m vocal_remover_tpu.native.build
Called automatically (once) by `vocal_remover_tpu.native` on first
import when a compiler is available; failures fall back to numpy paths.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))
SRCS = [
    os.path.join(HERE, "vrtnative.c"),
    os.path.join(HERE, "flacdec.c"),
    os.path.join(HERE, "mp3dec.c"),
    os.path.join(HERE, "aacdec.c"),
    os.path.join(HERE, "sbrdec.c"),
]
HDRS = [
    os.path.join(HERE, "sbrdec.h"),
    os.path.join(HERE, "sbr_tables.h"),
]
SRC = SRCS[0]  # mtime anchor (back-compat name)
SO = os.path.join(
    HERE, "_vrtnative" + (sysconfig.get_config_var("EXT_SUFFIX") or ".so")
)


def build(verbose: bool = False) -> str | None:
    cc = os.environ.get("CC") or shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    include = sysconfig.get_paths()["include"]
    cmd = [
        cc, "-O3", "-march=native", "-shared", "-fPIC", "-o", SO, *SRCS,
        f"-I{include}", "-lm",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if res.returncode != 0:
        if verbose:
            print(res.stderr)
        return None
    return SO


def ensure_built() -> bool:
    if os.path.exists(SO) and all(
        os.path.getmtime(SO) >= os.path.getmtime(s) for s in SRCS + HDRS
    ):
        return True
    return build() is not None


if __name__ == "__main__":
    out = build(verbose=True)
    print(out or "build failed")
