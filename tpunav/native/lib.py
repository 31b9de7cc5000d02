"""ctypes loader and wrappers for the native C++ library.

Builds ``libtpunav_native.so`` from ``native/csrc/*.cpp`` on first use
(g++ -O2 -shared), keyed by a source hash so edits rebuild automatically.
No pybind11 in this environment — plain ``extern "C"`` + ctypes.
"""

from __future__ import annotations

import ctypes
import dataclasses
import hashlib
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_CSRC = _REPO_ROOT / "native" / "csrc"
_BUILD = _REPO_ROOT / "native" / "build"

_lib: Optional[ctypes.CDLL] = None

_D = ctypes.c_double
_DP = ctypes.POINTER(ctypes.c_double)


class _CParams(ctypes.Structure):
    _fields_ = [
        ("wheel_radius", _D), ("wheel_base", _D), ("lambda_", _D),
        ("max_wheel_vel", _D), ("dt", _D),
        ("steps", ctypes.c_int), ("rollouts", ctypes.c_int),
        ("q", _D * 3), ("r", _D * 2), ("p1", _D * 3), ("u_init", _D * 2),
    ]


def _source_hash() -> str:
    h = hashlib.sha256()
    for src in sorted(_CSRC.glob("*")):
        h.update(src.read_bytes())
    return h.hexdigest()[:16]


def load_library() -> ctypes.CDLL:
    """Compile (if needed) and load the native library."""
    global _lib
    if _lib is not None:
        return _lib
    _BUILD.mkdir(parents=True, exist_ok=True)
    so = _BUILD / f"libtpunav_native-{_source_hash()}.so"
    if not so.exists():
        sources = sorted(str(p) for p in _CSRC.glob("*.cpp"))
        cmd = ["g++", "-std=c++17", "-O2", "-fPIC", "-shared",
               "-Wall", "-Wextra", f"-I{_CSRC}", *sources, "-o", str(so)]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    lib = ctypes.CDLL(str(so))

    lib.tpunav_normalize_angle_pi.restype = _D
    lib.tpunav_normalize_angle_pi.argtypes = [_D]
    lib.tpunav_se2_apply.argtypes = [_DP, _DP, _DP]
    lib.tpunav_se2_compose.argtypes = [_DP, _DP, _DP]
    lib.tpunav_se2_inverse.argtypes = [_DP, _DP]
    lib.tpunav_se2_integrate_twist.argtypes = [_DP, _DP, _DP]
    lib.tpunav_dd_twist_to_wheels.restype = ctypes.c_int
    lib.tpunav_dd_twist_to_wheels.argtypes = [_D, _D, _DP, _DP]
    lib.tpunav_dd_wheels_to_twist.argtypes = [_D, _D, _DP, _DP]
    lib.tpunav_dd_update_odometry.argtypes = [_D, _D, _DP, _DP, _D, _D, _DP]
    lib.tpunav_dd_feedforward.argtypes = [_D, _D, _DP, _DP, _DP]
    lib.tpunav_mppi_solve.argtypes = [
        ctypes.POINTER(_CParams), _DP, _DP, _DP, _DP, _DP, _DP]
    _U8P = ctypes.POINTER(ctypes.c_uint8)
    _IP = ctypes.POINTER(ctypes.c_int)
    lib.tpunav_ekf_known_update.argtypes = [
        ctypes.c_int, _DP, _DP, _DP, _DP, _U8P, _DP, ctypes.c_int, _DP]
    lib.tpunav_ekf_unknown_update.argtypes = [
        ctypes.c_int, _DP, _DP, _DP, _DP, _U8P, _IP, _D, _D, _DP,
        ctypes.c_int, _DP]
    _lib = lib
    return lib


def _arr(x, n=None) -> np.ndarray:
    a = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    if n is not None:
        assert a.size == n, (a.shape, n)
    return a


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_DP)


def normalize_angle_pi(rad: float) -> float:
    return float(load_library().tpunav_normalize_angle_pi(float(rad)))


def se2_apply(pose, p) -> np.ndarray:
    out = np.empty(2)
    load_library().tpunav_se2_apply(_ptr(_arr(pose, 3)), _ptr(_arr(p, 2)),
                                    _ptr(out))
    return out


def se2_compose(a, b) -> np.ndarray:
    out = np.empty(3)
    load_library().tpunav_se2_compose(_ptr(_arr(a, 3)), _ptr(_arr(b, 3)),
                                      _ptr(out))
    return out


def se2_inverse(pose) -> np.ndarray:
    out = np.empty(3)
    load_library().tpunav_se2_inverse(_ptr(_arr(pose, 3)), _ptr(out))
    return out


def se2_integrate_twist(pose, twist) -> np.ndarray:
    out = np.empty(3)
    load_library().tpunav_se2_integrate_twist(
        _ptr(_arr(pose, 3)), _ptr(_arr(twist, 3)), _ptr(out))
    return out


def dd_twist_to_wheels(wheel_radius, wheel_base, twist) -> np.ndarray:
    out = np.empty(2)
    rc = load_library().tpunav_dd_twist_to_wheels(
        wheel_radius, wheel_base, _ptr(_arr(twist, 3)), _ptr(out))
    if rc != 0:
        raise ValueError("non-holonomic twist: vy must be 0")
    return out


def dd_wheels_to_twist(wheel_radius, wheel_base, wheels) -> np.ndarray:
    out = np.empty(3)
    load_library().tpunav_dd_wheels_to_twist(
        wheel_radius, wheel_base, _ptr(_arr(wheels, 2)), _ptr(out))
    return out


def dd_update_odometry(wheel_radius, wheel_base, pose, enc, left, right
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (new_pose, new_enc, body_twist)."""
    pose = _arr(pose, 3).copy()
    enc = _arr(enc, 2).copy()
    tw = np.empty(3)
    load_library().tpunav_dd_update_odometry(
        wheel_radius, wheel_base, _ptr(pose), _ptr(enc),
        float(left), float(right), _ptr(tw))
    return pose, enc, tw


def dd_feedforward(wheel_radius, wheel_base, pose, enc, cmd
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (new_pose, new_enc)."""
    pose = _arr(pose, 3).copy()
    enc = _arr(enc, 2).copy()
    load_library().tpunav_dd_feedforward(
        wheel_radius, wheel_base, _ptr(pose), _ptr(enc), _ptr(_arr(cmd, 3)))
    return pose, enc


@dataclasses.dataclass(frozen=True)
class MPPIRefParams:
    """Mirror of tpunav.control.mppi.MPPIConfig + the cart model, for the
    native parity solver."""

    wheel_radius: float
    wheel_base: float
    lambda_: float
    max_wheel_vel: float
    dt: float
    steps: int
    rollouts: int
    q_diag: Sequence[float]
    r_diag: Sequence[float]
    p1_diag: Sequence[float]
    u_init: Sequence[float] = (0.0, 0.0)

    def to_c(self) -> _CParams:
        return _CParams(
            self.wheel_radius, self.wheel_base, self.lambda_,
            self.max_wheel_vel, self.dt, self.steps, self.rollouts,
            (_D * 3)(*self.q_diag), (_D * 2)(*self.r_diag),
            (_D * 3)(*self.p1_diag), (_D * 2)(*self.u_init))


def mppi_solve_ref(params: MPPIRefParams, u, noise, pose, waypoint,
                   want_traj: bool = False):
    """Native MPPI solve with caller-supplied noise.

    u: (N, 2); noise: (K, N, 2); pose/waypoint: (3,) as [x, y, theta].
    Returns (cmd (2,), u_next (N, 2)[, traj (K, N, 3)]).
    """
    n, k = params.steps, params.rollouts
    u = _arr(u, n * 2).copy()
    noise = _arr(noise, k * n * 2)
    cmd = np.empty(2)
    traj = np.empty((k, n, 3)) if want_traj else None
    load_library().tpunav_mppi_solve(
        ctypes.byref(params.to_c()), _ptr(u), _ptr(noise),
        _ptr(_arr(pose, 3)), _ptr(_arr(waypoint, 3)), _ptr(cmd),
        _ptr(traj) if want_traj else None)
    out = (cmd, u.reshape(n, 2))
    return out + (traj,) if want_traj else out


def ekf_known_update(n, meas_noise, motion_noise, state, cov, active,
                     meas, u):
    """Native known-DA EKF SLAM step (deterministic mode) — the parity
    oracle for ``known_correspondence_slam``. Returns updated
    (state, cov, active)."""
    s = 3 + 2 * n
    state = _arr(state, s).copy()
    cov = _arr(cov, s * s).copy()
    active = np.ascontiguousarray(np.asarray(active, np.uint8)).copy()
    meas = _arr(meas)
    m = meas.size // 2
    load_library().tpunav_ekf_known_update(
        n, _ptr(_arr(meas_noise, 2)), _ptr(_arr(motion_noise, 3)),
        _ptr(state), _ptr(cov),
        active.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _ptr(meas), m, _ptr(_arr(u, 2)))
    return state, cov.reshape(s, s), active.astype(bool)


def ekf_unknown_update(n, meas_noise, motion_noise, state, cov, active,
                       count, dmin, dmax, meas, u):
    """Native unknown-DA (Mahalanobis-gated) EKF SLAM step — the parity
    oracle for ``slam_unknown_da``. Returns
    (state, cov, active, count)."""
    s = 3 + 2 * n
    state = _arr(state, s).copy()
    cov = _arr(cov, s * s).copy()
    active = np.ascontiguousarray(np.asarray(active, np.uint8)).copy()
    cnt = ctypes.c_int(int(count))
    meas = _arr(meas)
    m = meas.size // 2
    load_library().tpunav_ekf_unknown_update(
        n, _ptr(_arr(meas_noise, 2)), _ptr(_arr(motion_noise, 3)),
        _ptr(state), _ptr(cov),
        active.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(cnt), float(dmin), float(dmax), _ptr(meas), m,
        _ptr(_arr(u, 2)))
    return state, cov.reshape(s, s), active.astype(bool), int(cnt.value)
