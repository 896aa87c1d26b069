"""Build hook: compile the native runtime during wheel/sdist installs so a
fresh install never needs g++ at first import (the lazy builder in
multiprime_tpu/native/__init__.py remains the fallback for source
checkouts).  `mptpu build-native` does the same post-install."""

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        try:
            import pathlib
            import subprocess
            src = pathlib.Path(self.build_lib,
                               "multiprime_tpu/native/seqlib.cpp")
            out = src.with_name("libseqlib.so")
            if src.exists():
                cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                       "-pthread", "-ffp-contract=off", str(src),
                       "-o", str(out)]
                subprocess.run(cmd, check=True, timeout=300)
        except Exception as e:     # fall back to the lazy run-time build
            print("native prebuild skipped:", e)


setup(cmdclass={"build_py": BuildWithNative})
