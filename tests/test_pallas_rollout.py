"""Pallas fused-rollout kernel vs the XLA condensed engine (interpret
mode on CPU; the real kernel runs on TPU in bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from direct_data_driven_mpc_tpu.control.linear_engine import (
    build_affine_block_map,
    make_linear_batched_rollout,
)
from direct_data_driven_mpc_tpu.ops.pallas_rollout import (
    pallas_batched_rollout,
)

from tests.test_closed_loop import _make_setup


@pytest.mark.parametrize("n_steps,K", [(40, 8), (37, 8)])
def test_pallas_kernel_matches_linear_engine(n_steps, K):
    plant, ctrl, rng = _make_setup(n_mpc_step=1)
    bm = build_affine_block_map(
        plant.as_params(), ctrl._op, n=4, m=2, p=2,
        solves_per_block=K, dtype=jnp.float32,
    )
    B = 16
    x0s = jnp.tile(
        jnp.asarray(plant.get_state(), jnp.float32)[None], (B, 1)
    )
    ups = jnp.tile(
        jnp.asarray(ctrl.u_past.reshape(4, 2), jnp.float32)[None],
        (B, 1, 1),
    )
    yps = jnp.tile(
        jnp.asarray(ctrl.y_past.reshape(4, 2), jnp.float32)[None],
        (B, 1, 1),
    )
    Ws = jnp.asarray(
        0.002 * rng.uniform(-1, 1, (B, n_steps, 2)), jnp.float32
    )

    ref_run = make_linear_batched_rollout(bm, n_steps=n_steps)
    ref = ref_run(x0s, ups, yps, Ws)

    res = pallas_batched_rollout(
        bm, x0s, ups, yps, Ws, n_steps=n_steps,
        batch_block=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(res.u_sys), np.asarray(ref.u_sys), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.y_sys), np.asarray(ref.y_sys), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.costs), np.asarray(ref.costs), rtol=1e-3,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res.u_past), np.asarray(ref.u_past), atol=2e-5
    )

    # The fused-operator XLA twin (same operator, lax.scan instead of
    # the Pallas grid) must produce the same trajectories and costs.
    xla_twin = pallas_batched_rollout(
        bm, x0s, ups, yps, Ws, n_steps=n_steps, backend="xla",
    )
    np.testing.assert_allclose(
        np.asarray(xla_twin.u_sys), np.asarray(ref.u_sys), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(xla_twin.y_sys), np.asarray(ref.y_sys), atol=2e-5
    )
    # rtol 1e-3: the default cost channel is bf16_3x (accumulation
    # order differs between the kernel grid and the scan twin).
    np.testing.assert_allclose(
        np.asarray(xla_twin.costs), np.asarray(res.costs), rtol=1e-3,
        atol=1e-6,
    )


def test_cost_precision_split_path_matches_fused():
    """The mixed-precision cost channel (parity-bound columns at
    HIGHEST, cost-feature columns via the explicit bf16_3x
    decomposition, ops/pallas_rollout.py) must leave u/y/state
    BIT-IDENTICAL (same HIGHEST dot over the same columns) and keep
    costs within the bf16_3x error bound, in both the interpreted
    kernel and the XLA twin. Locks the offset arithmetic and the hi/lo
    operand decomposition of the split path."""
    plant, ctrl, rng = _make_setup(n_mpc_step=1)
    bm = build_affine_block_map(
        plant.as_params(), ctrl._op, n=4, m=2, p=2,
        solves_per_block=8, dtype=jnp.float32,
    )
    B, n_steps = 16, 40
    x0s = jnp.tile(
        jnp.asarray(plant.get_state(), jnp.float32)[None], (B, 1)
    )
    ups = jnp.tile(
        jnp.asarray(ctrl.u_past.reshape(4, 2), jnp.float32)[None],
        (B, 1, 1),
    )
    yps = jnp.tile(
        jnp.asarray(ctrl.y_past.reshape(4, 2), jnp.float32)[None],
        (B, 1, 1),
    )
    Ws = jnp.asarray(
        0.002 * rng.uniform(-1, 1, (B, n_steps, 2)), jnp.float32
    )
    for backend in ("pallas", "xla"):
        kw = (
            dict(batch_block=8, interpret=True)
            if backend == "pallas"
            else {}
        )
        fused = pallas_batched_rollout(
            bm, x0s, ups, yps, Ws, n_steps=n_steps, backend=backend,
            cost_precision="highest", **kw,
        )
        split = pallas_batched_rollout(
            bm, x0s, ups, yps, Ws, n_steps=n_steps, backend=backend,
            cost_precision="high", **kw,
        )
        for field in ("u_sys", "y_sys", "x_final"):
            np.testing.assert_array_equal(
                np.asarray(getattr(split, field)),
                np.asarray(getattr(fused, field)),
                err_msg=f"{backend}:{field}",
            )
        np.testing.assert_allclose(
            np.asarray(split.costs), np.asarray(fused.costs),
            rtol=1e-3, atol=1e-5, err_msg=f"{backend}:costs",
        )
    with pytest.raises(ValueError, match="cost_precision"):
        pallas_batched_rollout(
            bm, x0s, ups, yps, Ws, n_steps=n_steps, backend="xla",
            cost_precision="bfloat16",
        )


def test_cost_mode_post_matches_inkernel():
    """cost_mode="post" (cost channel reconstructed from emitted
    trajectories -- the large-plant VMEM fix) must leave u/y untouched
    and reproduce the per-solve costs to diagnostic accuracy, on both
    the XLA twin and the kernel (interpret), incl. n-step cadence and
    trailing trim."""
    from direct_data_driven_mpc_tpu.ops.pallas_rollout import (
        pallas_batched_rollout,
    )

    for n_mpc_step, n_steps in ((1, 48), (4, 42)):
        plant, ctrl, rng = _make_setup(n_mpc_step=n_mpc_step)
        bm = build_affine_block_map(
            plant.as_params(dtype=np.float32), ctrl._op, n=4, m=2, p=2,
            n_mpc_step=n_mpc_step, solves_per_block=4,
            dtype=jnp.float32,
        )
        B = 4
        x0s = jnp.tile(
            jnp.asarray(plant.get_state(), jnp.float32)[None], (B, 1)
        )
        ups = jnp.tile(
            jnp.asarray(ctrl.u_past.reshape(4, 2), jnp.float32)[None],
            (B, 1, 1),
        )
        yps = jnp.tile(
            jnp.asarray(ctrl.y_past.reshape(4, 2), jnp.float32)[None],
            (B, 1, 1),
        )
        Ws = jnp.asarray(
            0.002 * rng.uniform(-1, 1, (B, n_steps, 2)), jnp.float32
        )
        ref = pallas_batched_rollout(
            bm, x0s, ups, yps, Ws, n_steps=n_steps,
            n_mpc_step=n_mpc_step, backend="xla",
        )
        post = pallas_batched_rollout(
            bm, x0s, ups, yps, Ws, n_steps=n_steps,
            n_mpc_step=n_mpc_step, backend="xla", cost_mode="post",
        )
        np.testing.assert_array_equal(
            np.asarray(post.u_sys), np.asarray(ref.u_sys)
        )
        np.testing.assert_array_equal(
            np.asarray(post.y_sys), np.asarray(ref.y_sys)
        )
        assert post.costs.shape == ref.costs.shape
        np.testing.assert_allclose(
            np.asarray(post.costs), np.asarray(ref.costs), rtol=1e-3,
            atol=1e-3,
        )
        kern = pallas_batched_rollout(
            bm, x0s, ups, yps, Ws, n_steps=n_steps,
            n_mpc_step=n_mpc_step, backend="pallas", interpret=True,
            batch_block=4, cost_mode="post",
        )
        np.testing.assert_array_equal(
            np.asarray(kern.u_sys), np.asarray(post.u_sys)
        )
        np.testing.assert_array_equal(
            np.asarray(kern.costs), np.asarray(post.costs)
        )


def test_cost_mode_post_rejects_tracking_maps():
    from direct_data_driven_mpc_tpu.control.linear_engine import (
        build_tracking_engine,
    )
    from direct_data_driven_mpc_tpu.ops.pallas_rollout import (
        make_fused_batched_rollout,
    )

    plant, ctrl, rng = _make_setup(n_mpc_step=1)
    bm_t = build_tracking_engine(
        ctrl, plant.as_params(dtype=np.float32), solves_per_block=4,
        dtype=jnp.float32,
    )
    with pytest.raises(NotImplementedError, match="post"):
        make_fused_batched_rollout(
            bm_t, n_steps=16, backend="xla", cost_mode="post"
        )


def test_cost_rank_truncation_bounds():
    """cost_rank_rtol truncates only the cost DIAGNOSTIC channel:
    u/y stay bit-identical, and the cost error is bounded by the
    dropped eigenvalue mass (here: aggressive rtol to force real
    truncation; 1e-6 default drops nothing on this config)."""
    import numpy as np

    from direct_data_driven_mpc_tpu.ops.pallas_rollout import (
        make_fused_batched_rollout,
    )

    plant, ctrl, rng = _make_setup(n_mpc_step=1)
    bm = build_affine_block_map(
        plant.as_params(dtype=np.float32), ctrl._op, n=4, m=2, p=2,
        solves_per_block=4, dtype=jnp.float32,
    )
    evals = np.linalg.eigvalsh(np.asarray(bm.cost_P, np.float64))
    rtol = float(evals[len(evals) // 2] / evals[-1]) * 1.01  # drop half
    B, T = 2, 24
    x0s = jnp.tile(
        jnp.asarray(plant.get_state(), jnp.float32)[None], (B, 1)
    )
    ups = jnp.tile(
        jnp.asarray(ctrl.u_past.reshape(4, 2), jnp.float32)[None],
        (B, 1, 1),
    )
    yps = jnp.tile(
        jnp.asarray(ctrl.y_past.reshape(4, 2), jnp.float32)[None],
        (B, 1, 1),
    )
    Ws = jnp.asarray(0.002 * rng.uniform(-1, 1, (B, T, 2)), jnp.float32)
    full = make_fused_batched_rollout(bm, T, backend="xla")(
        x0s, ups, yps, Ws
    )
    trunc = make_fused_batched_rollout(
        bm, T, backend="xla", cost_rank_rtol=rtol
    )(x0s, ups, yps, Ws)
    np.testing.assert_array_equal(
        np.asarray(trunc.u_sys), np.asarray(full.u_sys)
    )
    np.testing.assert_array_equal(
        np.asarray(trunc.y_sys), np.asarray(full.y_sys)
    )
    # Truncation drops PSD mass, so truncated costs UNDER-estimate,
    # by at most (sum of dropped eigenvalues) * max ||theta||^2.
    c_full = np.asarray(full.costs, np.float64)
    c_tr = np.asarray(trunc.costs, np.float64)
    assert np.all(c_tr <= c_full + 1e-3)
    dropped = evals[evals <= rtol * evals[-1]].sum()
    th_max = 16 * max(
        np.abs(np.asarray(full.u_sys)).max(),
        np.abs(np.asarray(full.y_sys)).max(),
        1.0,
    ) ** 2
    assert np.abs(c_tr - c_full).max() <= dropped * th_max


def test_noise_rotation_index_map_matches_roll():
    """The scalar-prefetch noise rotation (w_off in the index map) must
    be BIT-identical to a materialized jnp.roll of the packed noise --
    the amortized harness's per-rep variation without the ~1 GB/rep
    copy at headline batch sizes."""
    from direct_data_driven_mpc_tpu.ops.pallas_rollout import (
        _build_fused_operator,
        _center_and_pack,
        _make_rollout_from_fused,
    )

    plant, ctrl, rng = _make_setup(n_mpc_step=1)
    K, n_steps, B = 8, 40, 16
    bm = build_affine_block_map(
        plant.as_params(), ctrl._op, n=4, m=2, p=2,
        solves_per_block=K, dtype=jnp.float32,
    )
    n_outer = n_steps // K
    fused = _build_fused_operator(bm)
    kernel = _make_rollout_from_fused(
        fused, n_outer, batch_block=8, interpret=True
    )
    x0s = jnp.tile(
        jnp.asarray(plant.get_state(), jnp.float32)[None], (B, 1)
    )
    ups = jnp.tile(
        jnp.asarray(ctrl.u_past.reshape(4, 2), jnp.float32)[None],
        (B, 1, 1),
    )
    yps = jnp.tile(
        jnp.asarray(ctrl.y_past.reshape(4, 2), jnp.float32)[None],
        (B, 1, 1),
    )
    Ws = jnp.asarray(
        0.002 * rng.uniform(-1, 1, (B, n_steps, 2)), jnp.float32
    )
    s0, W_packed = _center_and_pack(
        bm, x0s, ups, yps, Ws, n_outer, K, 0
    )
    for i in (0, 1, 3):
        rolled = kernel(s0, jnp.roll(W_packed, i, axis=0))
        rotated = kernel(
            s0, W_packed, w_off=jnp.mod(-jnp.int32(i), n_outer)
        )
        for a, b in zip(rolled, rotated):
            if a is None:
                continue
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stacked_highest_matches_reference():
    """stacked_highest=True (explicit one-dispatch 6-pass) must meet
    the SAME parity budget against the condensed linear engine as the
    native Precision.HIGHEST kernel (the two differ from each other
    only by amplified last-bit rounding)."""
    from direct_data_driven_mpc_tpu.ops.pallas_rollout import (
        _build_fused_operator,
        _center_and_pack,
        _make_rollout_from_fused,
    )

    plant, ctrl, rng = _make_setup(n_mpc_step=1)
    K, n_steps, B = 8, 40, 16
    bm = build_affine_block_map(
        plant.as_params(), ctrl._op, n=4, m=2, p=2,
        solves_per_block=K, dtype=jnp.float32,
    )
    n_outer = n_steps // K
    x0s = jnp.tile(
        jnp.asarray(plant.get_state(), jnp.float32)[None], (B, 1)
    )
    ups = jnp.tile(
        jnp.asarray(ctrl.u_past.reshape(4, 2), jnp.float32)[None],
        (B, 1, 1),
    )
    yps = jnp.tile(
        jnp.asarray(ctrl.y_past.reshape(4, 2), jnp.float32)[None],
        (B, 1, 1),
    )
    Ws = jnp.asarray(
        0.002 * rng.uniform(-1, 1, (B, n_steps, 2)), jnp.float32
    )
    ref = make_linear_batched_rollout(bm, n_steps=n_steps)(
        x0s, ups, yps, Ws
    )
    s0, W_packed = _center_and_pack(
        bm, x0s, ups, yps, Ws, n_outer, K, 0
    )
    fused = _build_fused_operator(bm)
    kern = _make_rollout_from_fused(
        fused, n_outer, batch_block=8, interpret=True,
        stacked_highest=True,
    )
    U, Y, C, s_fin = kern(s0, W_packed)
    u_sys = np.asarray(U).transpose(1, 0, 2).reshape(B, n_steps, 2)
    y_sys = np.asarray(Y).transpose(1, 0, 2).reshape(B, n_steps, 2)
    np.testing.assert_allclose(
        u_sys, np.asarray(ref.u_sys), atol=2e-5
    )
    np.testing.assert_allclose(
        y_sys, np.asarray(ref.y_sys), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(C).transpose(1, 0, 2).reshape(B, n_steps),
        np.asarray(ref.costs), rtol=1e-3, atol=1e-5,
    )
