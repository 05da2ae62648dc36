"""Build the native multicut library (g++, no external deps).

Usage: python -m pemp_tpu.cluster.build
"""

from __future__ import annotations

import os
import subprocess

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
LIB_PATH = os.path.join(NATIVE_DIR, "libpemp_multicut.so")


def build(force: bool = False) -> str:
    src = os.path.join(NATIVE_DIR, "multicut.cpp")
    if force or not os.path.exists(LIB_PATH) or (
        os.path.getmtime(LIB_PATH) < os.path.getmtime(src)
    ):
        subprocess.run(["make", "-C", NATIVE_DIR], check=True)
    return LIB_PATH


if __name__ == "__main__":
    print(build(force=True))
