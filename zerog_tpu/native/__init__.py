"""Native (C) runtime components, built on first import and cached.

`limbcodec`: fast Python-int <-> uint32[16]-limb conversion with in-C
Montgomery form changes — the host/device boundary codec. Falls back to the
pure-numpy path in field/limbs.py if no C compiler is available.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import pathlib
import subprocess
import sysconfig

_HERE = pathlib.Path(__file__).parent


def _build_dir() -> pathlib.Path:
    src = (_HERE / "limbcodec.c").read_bytes()
    tag = hashlib.blake2b(src, digest_size=8).hexdigest()
    d = pathlib.Path(
        os.environ.get("ZEROG_NATIVE_CACHE",
                       os.path.expanduser("~/.cache/zerog_tpu_native"))
    ) / tag
    d.mkdir(parents=True, exist_ok=True)
    return d


def _load():
    if os.environ.get("ZEROG_NO_NATIVE"):
        return None
    d = _build_dir()
    so = d / "_limbcodec.so"
    if not so.exists():
        cc = os.environ.get("CC", "cc")
        include = sysconfig.get_paths()["include"]
        cmd = [cc, "-O3", "-shared", "-fPIC", f"-I{include}",
               str(_HERE / "limbcodec.c"), "-o", str(so) + ".tmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(str(so) + ".tmp", so)
        except Exception:
            return None
    try:
        spec = importlib.util.spec_from_file_location("_limbcodec", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


limbcodec = _load()

__all__ = ["limbcodec"]
