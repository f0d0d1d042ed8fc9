"""Batch (vmap) and mesh (shard_map) tests on the virtual 8-device
CPU platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from direct_data_driven_mpc_tpu.control.loop import closed_loop_rollout
from direct_data_driven_mpc_tpu.parallel.batch import (
    batched_closed_loop,
    draw_noise_batch,
    make_batched_rollout,
)
from direct_data_driven_mpc_tpu.parallel.mesh import (
    make_mesh_rollout,
    make_scenario_mesh,
)

from tests.test_closed_loop import _make_setup


@pytest.fixture(scope="module")
def setup():
    plant, ctrl, rng = _make_setup(n_mpc_step=1)
    sol = ctrl.solution_map(dtype=jnp.float64)
    params = plant.as_params()
    x0 = plant.get_state().copy()
    up = ctrl.u_past.reshape(4, 2).copy()
    yp = ctrl.y_past.reshape(4, 2).copy()
    return params, sol, x0, up, yp


def _batch_inputs(x0, up, yp, B, n_steps, key):
    x0s = jnp.tile(jnp.asarray(x0)[None], (B, 1))
    ups = jnp.tile(jnp.asarray(up)[None], (B, 1, 1))
    yps = jnp.tile(jnp.asarray(yp)[None], (B, 1, 1))
    Ws = draw_noise_batch(key, B, n_steps, 2, 0.002, dtype=jnp.float64)
    return x0s, ups, yps, Ws


def test_vmap_batch_matches_single_scenarios(setup):
    params, sol, x0, up, yp = setup
    B, n_steps = 4, 20
    key = jax.random.key(0)
    x0s, ups, yps, Ws = _batch_inputs(x0, up, yp, B, n_steps, key)
    batch = batched_closed_loop(
        params, sol, x0s, ups, yps, Ws, n_steps=n_steps
    )
    # Each batch lane must equal the single-scenario rollout.
    for b in range(B):
        single = closed_loop_rollout(
            params, sol, x0s[b], ups[b], yps[b], Ws[b], n_steps=n_steps
        )
        np.testing.assert_allclose(
            np.asarray(batch.u_sys[b]), np.asarray(single.u_sys), atol=1e-12
        )


def test_noise_batch_deterministic_per_scenario():
    key = jax.random.key(7)
    W8 = draw_noise_batch(key, 8, 10, 2, 0.002)
    W8_again = draw_noise_batch(key, 8, 10, 2, 0.002)
    np.testing.assert_array_equal(np.asarray(W8), np.asarray(W8_again))
    assert np.abs(np.asarray(W8)).max() <= 0.002


def test_mesh_data_parallel_matches_vmap(setup):
    params, sol, x0, up, yp = setup
    mesh = make_scenario_mesh(n_data=4, n_model=2)
    B, n_steps = 8, 15
    key = jax.random.key(1)
    x0s, ups, yps, Ws = _batch_inputs(x0, up, yp, B, n_steps, key)

    run = make_mesh_rollout(mesh, params, sol, n_steps=n_steps)
    result, metrics = run(x0s, ups, yps, Ws)
    ref = batched_closed_loop(
        params, sol, x0s, ups, yps, Ws, n_steps=n_steps
    )
    np.testing.assert_allclose(
        np.asarray(result.u_sys), np.asarray(ref.u_sys), atol=1e-12
    )
    assert float(metrics["frac_converged"]) == 1.0
    assert float(metrics["mean_final_cost"]) == pytest.approx(
        float(jnp.mean(ref.costs[:, -1])), rel=1e-9
    )


def test_mesh_model_parallel_gain_sharding_matches(setup):
    params, sol, x0, up, yp = setup
    mesh = make_scenario_mesh(n_data=4, n_model=2)
    B, n_steps = 8, 15
    key = jax.random.key(2)
    x0s, ups, yps, Ws = _batch_inputs(x0, up, yp, B, n_steps, key)

    run_mp = make_mesh_rollout(
        mesh, params, sol, n_steps=n_steps, model_parallel=True
    )
    result_mp, _ = run_mp(x0s, ups, yps, Ws)
    ref = batched_closed_loop(
        params, sol, x0s, ups, yps, Ws, n_steps=n_steps
    )
    np.testing.assert_allclose(
        np.asarray(result_mp.u_sys), np.asarray(ref.u_sys), atol=1e-10
    )


def test_jitted_batched_rollout_compiles_once(setup):
    params, sol, x0, up, yp = setup
    run = make_batched_rollout(params, sol, n_steps=10)
    B = 3
    key = jax.random.key(3)
    x0s, ups, yps, Ws = _batch_inputs(x0, up, yp, B, 10, key)
    r1 = run(x0s, ups, yps, Ws)
    r2 = run(x0s, ups, yps, Ws)
    np.testing.assert_array_equal(np.asarray(r1.u_sys), np.asarray(r2.u_sys))


def test_mesh_admm_solver_matches_vmap(setup):
    from direct_data_driven_mpc_tpu.qp.spec import SlackVarConstraintTypes

    plant, ctrl, rng = _make_setup(
        slack=SlackVarConstraintTypes.CONVEX, n_mpc_step=1
    )
    params = plant.as_params()
    admm = ctrl.admm_solver(dtype=jnp.float64)
    mesh = make_scenario_mesh(n_data=4, n_model=2)
    B, n_steps = 8, 10
    x0 = plant.get_state().copy()
    up = ctrl.u_past.reshape(4, 2)
    yp = ctrl.y_past.reshape(4, 2)
    x0s = jnp.tile(jnp.asarray(x0)[None], (B, 1))
    ups = jnp.tile(jnp.asarray(up)[None], (B, 1, 1))
    yps = jnp.tile(jnp.asarray(yp)[None], (B, 1, 1))
    Ws = draw_noise_batch(
        jax.random.key(9), B, n_steps, 2, 0.002, dtype=jnp.float64
    )
    run = make_mesh_rollout(
        mesh, params, admm, n_steps=n_steps, admm_iters=150
    )
    result, metrics = run(x0s, ups, yps, Ws)
    ref = batched_closed_loop(
        params, admm, x0s, ups, yps, Ws, n_steps=n_steps, admm_iters=150
    )
    np.testing.assert_allclose(
        np.asarray(result.u_sys), np.asarray(ref.u_sys), atol=1e-10
    )
    assert float(metrics["frac_converged"]) == 1.0


def test_sharded_linear_rollout_matches_unsharded(setup):
    from direct_data_driven_mpc_tpu.control.linear_engine import (
        build_affine_block_map,
        make_linear_batched_rollout,
    )
    from direct_data_driven_mpc_tpu.parallel.mesh import (
        make_sharded_linear_rollout,
    )

    plant, ctrl, rng = _make_setup(n_mpc_step=1)
    bm = build_affine_block_map(
        plant.as_params(), ctrl._op, n=4, m=2, p=2,
        solves_per_block=5, dtype=jnp.float64,
    )
    mesh = make_scenario_mesh(n_data=8, n_model=1)
    B, n_steps = 16, 20
    x0 = plant.get_state().copy()
    x0s = jnp.tile(jnp.asarray(x0)[None], (B, 1))
    ups = jnp.tile(jnp.asarray(ctrl.u_past.reshape(4, 2))[None], (B, 1, 1))
    yps = jnp.tile(jnp.asarray(ctrl.y_past.reshape(4, 2))[None], (B, 1, 1))
    Ws = draw_noise_batch(
        jax.random.key(2), B, n_steps, 2, 0.002, dtype=jnp.float64
    )
    sharded = make_sharded_linear_rollout(mesh, bm, n_steps=n_steps)
    res = sharded(x0s, ups, yps, Ws)
    ref = make_linear_batched_rollout(bm, n_steps=n_steps)(
        x0s, ups, yps, Ws
    )
    np.testing.assert_allclose(
        np.asarray(res.u_sys), np.asarray(ref.u_sys), atol=1e-12
    )
    # The result must actually be sharded over the data axis.
    assert len(res.u_sys.sharding.device_set) == 8
