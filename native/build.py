"""Build the vio_native C++ extension in place.

Usage: python native/build.py
Produces vio_native.*.so at the repo root (importable as `vio_native`).
No external deps — CPython headers + g++ only.
"""
import subprocess
import sys
import sysconfig
from pathlib import Path


def build():
    root = Path(__file__).resolve().parent.parent
    src = root / "native" / "vio_native.cpp"
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = root / f"vio_native{suffix}"
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", str(src), "-o", str(out), "-pthread",
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print("built", out)
    return out


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
