"""Build hook: compile the native packing layer into the package.

The C++ source lives in native/src/ (also buildable standalone via
native/build.sh for repo-checkout use).  Wheel/editable builds place the
shared library at hpmpc_tpu/lib/libhpmpc_tpu_native.so, which api.py
probes first.  Compilation failure is non-fatal — the framework has a
pure-numpy fallback for the packing layer (api._load_native)."""

import pathlib
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithNative(build_py):
    def run(self):
        root = pathlib.Path(__file__).resolve().parent
        src = root / "native" / "src" / "packing.cpp"
        out_dir = root / "hpmpc_tpu" / "lib"
        out = out_dir / "libhpmpc_tpu_native.so"
        gxx = shutil.which("g++") or shutil.which("clang++")
        if gxx and src.exists():
            out_dir.mkdir(exist_ok=True)
            try:
                subprocess.run(
                    [gxx, "-O3", "-fPIC", "-shared", "-std=c++17",
                     str(src), "-o", str(out)],
                    check=True,
                )
            except subprocess.CalledProcessError:
                pass  # numpy fallback
        super().run()


setup(cmdclass={"build_py": BuildPyWithNative})
