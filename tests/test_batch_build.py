"""Batched heterogeneous operator construction vs the serial path."""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from direct_data_driven_mpc_tpu.ops.host import hankel_matrix_np, lti_rollout_np
from direct_data_driven_mpc_tpu.qp.batch_build import (
    build_batched_solution_operators,
    build_solution_operators_fallback,
    stacked_solution_map,
)
from direct_data_driven_mpc_tpu.qp.spec import QPDims


def _realizations(B, seed0=0, N=30, L=6, n=2, m=1, p=1):
    """B small-problem data realizations (the test_qp plant family)."""
    A = np.array([[0.9, 0.2], [0.0, 0.8]])
    Bm = np.array([[0.0], [1.0]])
    C = np.array([[1.0, 0.3]])
    D = np.array([[0.1]])
    Hu, Hy = [], []
    for b in range(B):
        rng = np.random.default_rng(seed0 + b)
        u_d = rng.uniform(-1, 1, (N, m))
        w_d = 0.002 * rng.uniform(-1, 1, (N, p))
        _, y_d = lti_rollout_np(A, Bm, C, D, np.zeros(n), u_d, w_d)
        Hu.append(hankel_matrix_np(u_d, L + n))
        Hy.append(hankel_matrix_np(y_d, L + n))
    dims = QPDims(n=n, m=m, p=p, L=L, N=N)
    kw = dict(
        Q=3.0 * np.eye(p * L),
        R=1e-4 * np.eye(m * L),
        u_s=np.array([0.5]),
        y_s=np.array([0.55]),
        eps_max=0.002,
        lamb_alpha=0.1 / 0.002,
        lamb_sigma=1000.0,
    )
    return np.stack(Hu), np.stack(Hy), dims, kw


@pytest.mark.parametrize("use_terminal", [True, False])
def test_batched_matches_serial(use_terminal):
    Hu, Hy, dims, kw = _realizations(B=5)
    batched = build_batched_solution_operators(
        Hu, Hy, dims, use_terminal_constraint=use_terminal, **kw
    )
    serial = build_solution_operators_fallback(
        Hu, Hy, dims, use_terminal_constraint=use_terminal,
        Q=kw["Q"], R=kw["R"], u_s=kw["u_s"], y_s=kw["y_s"],
        eps_max=kw["eps_max"], lamb_alpha=kw["lamb_alpha"],
        lamb_sigma=kw["lamb_sigma"], c=1.0,
    )
    assert batched["feasible"].all() and serial["feasible"].all()
    # The ROBUST KKT system is nonsingular -> z is unique, so the two
    # algorithms (batched Schur elimination vs dense KKT pinv) must
    # agree to float64 roundoff on every emitted quantity.
    for key in ("z_base", "Z", "u_base", "U_gain", "cost_P", "cost_q",
                "cost_r"):
        np.testing.assert_allclose(
            batched[key], serial[key], atol=1e-9, rtol=1e-9,
            err_msg=key,
        )


def test_batched_rejects_nondiagonal_weights():
    Hu, Hy, dims, kw = _realizations(B=2)
    Qfull = kw["Q"].copy()
    Qfull[0, 1] = 0.5
    kw2 = dict(kw, Q=Qfull)
    with pytest.raises(NotImplementedError, match="diagonal"):
        build_batched_solution_operators(Hu, Hy, dims, **kw2)


def test_batched_rejects_nominal_family():
    Hu, Hy, dims, kw = _realizations(B=2)
    kw2 = dict(kw, lamb_alpha=0.0)
    with pytest.raises(ValueError, match="ROBUST"):
        build_batched_solution_operators(Hu, Hy, dims, **kw2)


def test_batched_is_faster_than_serial():
    """The whole point: one BLAS-batched factorization beats B Python
    iterations of dense KKT factorization (the serial path's ~40 ms/
    realization at paper scale was round-1 VERDICT item 6)."""
    Hu, Hy, dims, kw = _realizations(B=64)
    t0 = time.perf_counter()
    build_batched_solution_operators(Hu, Hy, dims, **kw)
    t_batched = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_solution_operators_fallback(
        Hu, Hy, dims, Q=kw["Q"], R=kw["R"], u_s=kw["u_s"],
        y_s=kw["y_s"], eps_max=kw["eps_max"],
        lamb_alpha=kw["lamb_alpha"], lamb_sigma=kw["lamb_sigma"], c=1.0,
    )
    t_serial = time.perf_counter() - t0
    assert t_batched < t_serial, (
        f"batched {t_batched:.3f}s not faster than serial {t_serial:.3f}s"
    )


def test_batched_operators_drive_heterogeneous_closed_loop():
    """End to end: batched operators -> stacked SolutionMap ->
    heterogeneous closed loop == per-scenario serial rollouts."""
    from direct_data_driven_mpc_tpu.control.loop import (
        closed_loop_rollout,
    )
    from direct_data_driven_mpc_tpu.ops.lti import LTIParams
    from direct_data_driven_mpc_tpu.parallel.batch import (
        heterogeneous_closed_loop,
        stack_plants,
    )
    from direct_data_driven_mpc_tpu.qp.solution_map import SolutionMap

    B, n_steps = 3, 10
    Hu, Hy, dims, kw = _realizations(B=B)
    ops = build_batched_solution_operators(Hu, Hy, dims, **kw)
    sol_stack = stacked_solution_map(ops, dtype=jnp.float64)

    A = np.array([[0.9, 0.2], [0.0, 0.8]])
    Bm = np.array([[0.0], [1.0]])
    C = np.array([[1.0, 0.3]])
    D = np.array([[0.1]])
    plant = LTIParams(A=A, B=Bm, C=C, D=D)
    plants = stack_plants([plant] * B)

    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.normal(size=(B, 2)) * 0.1)
    ups = jnp.asarray(rng.normal(size=(B, 2, 1)) * 0.1)
    yps = jnp.asarray(rng.normal(size=(B, 2, 1)) * 0.1)
    Ws = jnp.asarray(0.002 * rng.uniform(-1, 1, (B, n_steps, 1)))

    batch = heterogeneous_closed_loop(
        plants, sol_stack, x0s, ups, yps, Ws, n_steps=n_steps
    )
    for b in range(B):
        one = SolutionMap(*(leaf[b] for leaf in sol_stack))
        ref = closed_loop_rollout(
            plant, one, x0s[b], ups[b], yps[b], Ws[b], n_steps=n_steps
        )
        np.testing.assert_allclose(
            np.asarray(batch.u_sys[b]), np.asarray(ref.u_sys),
            atol=1e-12,
        )
