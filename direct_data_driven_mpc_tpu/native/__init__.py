"""Native (CPython C extension) hot path for the interactive controller.

``_ddmpc_ext.c`` is compiled on first use with the system compiler
against the CPython headers (no external deps) and loaded from the
package directory; rebuilt automatically when the source is newer than
the binary. A ctypes FFI was measured at ~10 us/call overhead -- more
than the arithmetic it wraps -- hence a real extension module
(~100 ns/call via METH_FASTCALL + the buffer protocol).

Everything degrades gracefully: if no compiler or headers are
available, ``get_lib()`` returns None and callers use the NumPy
implementations -- the native path is a pure acceleration, never a
requirement.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
from typing import Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "_ddmpc_ext.c")
_LIB = os.path.join(_DIR, "_ddmpc_ext.so")

_ext = None
_load_attempted = False


def _build() -> bool:
    cc = os.environ.get("CC", "cc")
    include = sysconfig.get_paths()["include"]
    cmd = [
        cc, "-O3", "-march=native", "-shared", "-fPIC",
        f"-I{include}", _SRC, "-o", _LIB, "-lm",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
        print(
            f"[ddmpc-native] build failed ({e}); using NumPy fallback",
            file=sys.stderr,
        )
        return False


def get_lib():
    """The extension module, or None if unavailable."""
    global _ext, _load_attempted
    if _ext is not None or _load_attempted:
        return _ext
    _load_attempted = True
    try:
        if (
            not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        spec = importlib.util.spec_from_file_location("_ddmpc_ext", _LIB)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _ext = mod
    except Exception as e:  # pragma: no cover
        print(
            f"[ddmpc-native] load failed ({e}); using NumPy fallback",
            file=sys.stderr,
        )
        _ext = None
    return _ext


_DEMO_BIN = os.path.join(_DIR, "ddmpc_demo")


def build_runtime_demo() -> str | None:
    """Compile the standalone C deployment runtime + demo CLI
    (``ddmpc_runtime.c`` + ``ddmpc_demo.c``) and return the executable
    path, or None if no compiler is available. Rebuilds when sources
    are newer than the binary."""
    srcs = [
        os.path.join(_DIR, "ddmpc_demo.c"),
        os.path.join(_DIR, "ddmpc_runtime.c"),
    ]
    if os.path.exists(_DEMO_BIN) and all(
        os.path.getmtime(_DEMO_BIN) >= os.path.getmtime(s) for s in srcs
    ):
        return _DEMO_BIN
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-std=c99", "-Wall", *srcs, "-o", _DEMO_BIN, "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _DEMO_BIN
    except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
        print(
            f"[ddmpc-native] runtime demo build failed ({e})",
            file=sys.stderr,
        )
        return None


class NativeAffineSolver:
    """C-backed per-step affine solve + cost for one controller.

    Holds C-contiguous float64 copies of the operator and a
    preallocated output buffer, so a solve is one foreign call with
    zero allocation.
    """

    def __init__(self, op: dict):
        ext = get_lib()
        if ext is None:
            raise RuntimeError("native extension unavailable")
        self._ext = ext
        self.u_base = np.ascontiguousarray(op["u_base"], dtype=np.float64)
        self.U_gain = np.ascontiguousarray(op["U_gain"], dtype=np.float64)
        self.cost_P = np.ascontiguousarray(op["cost_P"], dtype=np.float64)
        self.cost_q = np.ascontiguousarray(op["cost_q"], dtype=np.float64)
        self.cost_r = float(op["cost_r"])
        self.nu, self.nt = self.U_gain.shape
        self._u_out = np.empty(self.nu, dtype=np.float64)

    def solve(self, theta: np.ndarray) -> Tuple[np.ndarray, float]:
        cost = self._ext.affine_solve(
            self.u_base, self.U_gain, self.cost_P, self.cost_q,
            self.cost_r, theta, self._u_out,
        )
        return self._u_out, cost


class NativeADMMSolver:
    """C-backed warm-started ADMM loop for the CONVEX slack variant."""

    def __init__(self, op: dict):
        ext = get_lib()
        if ext is None:
            raise RuntimeError("native extension unavailable")
        self._ext = ext
        for k in ("v_c", "V_theta", "V_s", "u_c", "U_theta", "U_s",
                  "cost_P", "cost_q"):
            setattr(
                self, k, np.ascontiguousarray(op[k], dtype=np.float64)
            )
        self.cost_r = float(op["cost_r"])
        self.bound = float(op["bound"])
        self.rho = float(op["rho"])
        self.alpha = float(op.get("alpha", 1.0))
        self.nbox = self.v_c.shape[0]
        self._scratch = np.empty(self.nbox, dtype=np.float64)

    def solve(
        self,
        theta: np.ndarray,
        s: np.ndarray,
        w: np.ndarray,
        max_iters: int,
        tol: float,
    ):
        """Mutates ``s``/``w`` in place (warm start); returns
        ``(u, cost, iters, r_prim, r_dual)``."""
        theta = np.ascontiguousarray(theta, dtype=np.float64)
        v_theta = np.ascontiguousarray(self.V_theta @ theta)
        iters, r_prim, r_dual = self._ext.admm_iterate(
            self.v_c, v_theta, self.V_s, s, w, self._scratch,
            self.bound, self.rho, int(max_iters), float(tol),
            self.alpha,
        )
        t = s - w
        u = self.u_c + self.U_theta @ theta + self.U_s @ t
        tt = np.concatenate([theta, t])
        cost = float(
            tt @ self.cost_P @ tt + self.cost_q @ tt + self.cost_r
        )
        return u, cost, iters, r_prim, r_dual
