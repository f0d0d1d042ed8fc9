"""The condensed affine engine must reproduce the generic fused engine
exactly (same algebra, different factorization of the computation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from direct_data_driven_mpc_tpu.control.linear_engine import (
    build_affine_block_map,
    linear_closed_loop_rollout,
    make_linear_batched_rollout,
)
from direct_data_driven_mpc_tpu.control.loop import closed_loop_rollout

from tests.test_closed_loop import _make_setup
from direct_data_driven_mpc_tpu.qp.spec import DataDrivenMPCType


@pytest.mark.parametrize(
    "n_mpc_step,n_steps",
    [(1, 40), (4, 42)],  # 1-step and n-step (with trailing trim)
)
def test_linear_engine_matches_generic_engine(n_mpc_step, n_steps):
    plant, ctrl, rng = _make_setup(n_mpc_step=n_mpc_step)
    params = plant.as_params()
    sol = ctrl.solution_map(dtype=jnp.float64)
    x0 = plant.get_state().copy()
    up = ctrl.u_past.reshape(4, 2).copy()
    yp = ctrl.y_past.reshape(4, 2).copy()
    W = 0.002 * rng.uniform(-1, 1, (n_steps, 2))

    ref = closed_loop_rollout(
        params, sol, x0, up, yp, W,
        n_steps=n_steps, n_mpc_step=n_mpc_step,
    )
    bm = build_affine_block_map(
        params, ctrl._op, n=4, m=2, p=2, n_mpc_step=n_mpc_step,
        dtype=jnp.float64,
    )
    lin = linear_closed_loop_rollout(
        bm, x0, up, yp, W, n_steps=n_steps, n_mpc_step=n_mpc_step
    )
    np.testing.assert_allclose(
        np.asarray(lin.u_sys), np.asarray(ref.u_sys), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(lin.y_sys), np.asarray(ref.y_sys), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(lin.costs), np.asarray(ref.costs), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(lin.u_past), np.asarray(ref.u_past), atol=1e-10
    )


def test_linear_engine_nominal_variant():
    plant, ctrl, rng = _make_setup(
        controller_type=DataDrivenMPCType.NOMINAL, n_mpc_step=1
    )
    params = plant.as_params()
    sol = ctrl.solution_map(dtype=jnp.float64)
    x0 = plant.get_state().copy()
    up = ctrl.u_past.reshape(4, 2).copy()
    yp = ctrl.y_past.reshape(4, 2).copy()
    W = 0.002 * rng.uniform(-1, 1, (30, 2))
    ref = closed_loop_rollout(params, sol, x0, up, yp, W, n_steps=30)
    bm = build_affine_block_map(
        params, ctrl._op, n=4, m=2, p=2, dtype=jnp.float64
    )
    lin = linear_closed_loop_rollout(bm, x0, up, yp, W, n_steps=30)
    np.testing.assert_allclose(
        np.asarray(lin.u_sys), np.asarray(ref.u_sys), atol=1e-9
    )


def test_linear_engine_batched():
    plant, ctrl, rng = _make_setup(n_mpc_step=1)
    bm = build_affine_block_map(
        plant.as_params(), ctrl._op, n=4, m=2, p=2, dtype=jnp.float64
    )
    B, n_steps = 3, 12
    x0 = plant.get_state().copy()
    up = ctrl.u_past.reshape(4, 2)
    yp = ctrl.y_past.reshape(4, 2)
    x0s = jnp.tile(jnp.asarray(x0)[None], (B, 1))
    ups = jnp.tile(jnp.asarray(up)[None], (B, 1, 1))
    yps = jnp.tile(jnp.asarray(yp)[None], (B, 1, 1))
    Ws = jnp.asarray(0.002 * rng.uniform(-1, 1, (B, n_steps, 2)))
    run = make_linear_batched_rollout(bm, n_steps=n_steps)
    batch = run(x0s, ups, yps, Ws)
    for b in range(B):
        single = linear_closed_loop_rollout(
            bm, x0s[b], ups[b], yps[b], Ws[b], n_steps=n_steps
        )
        np.testing.assert_allclose(
            np.asarray(batch.u_sys[b]), np.asarray(single.u_sys), atol=1e-12
        )
