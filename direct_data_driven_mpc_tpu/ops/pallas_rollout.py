"""Pallas TPU kernel: fused condensed closed-loop rollout.

Runs the ENTIRE multi-block closed-loop recursion of the condensed
linear engine (control/linear_engine.py) inside one Pallas kernel per
batch block: the carried state ``s`` lives in VMEM across the whole
time loop, the block-map operator matrices are loaded once, and each
``fori_loop`` iteration is a handful of VMEM-resident MXU matmuls --
no per-iteration HBM round-trips for the carry and zero XLA
while-loop overhead.

Layout notes (see the Pallas guide's tiling constraints):
- batch is the sublane dimension (blocks of ``BB`` scenarios, a
  multiple of 8);
- all feature dimensions (state S, packed noise K*nb*p, packed outputs
  K*nb*m / K*nb*p / K*n_theta) ride the lane dimension; packing K
  solves per block iteration is exactly what makes these lane widths
  MXU-friendly (e.g. K=100, p=2 -> 200 lanes) instead of p=2.
- noise is packed host-side as ``(n_outer, B, K*nb*p)``.

Per-solve costs are evaluated OUTSIDE the kernel in one vectorized
quadratic-form pass over the emitted solve-time theta stack (the
sequential kernel only materializes the affine outputs).

The kernel computes identically to ``linear_closed_loop_rollout``
(asserted in tests/test_pallas_rollout.py, which runs the kernel in
interpreter mode on CPU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from direct_data_driven_mpc_tpu.control.linear_engine import AffineBlockMap


def _rollout_kernel(
    # operator refs (VMEM, whole arrays)
    MT_ref,
    c_ref,
    NT_ref,
    OuST_ref,
    ouc_ref,
    OuWT_ref,
    OyST_ref,
    oyc_ref,
    OyWT_ref,
    OtST_ref,
    otc_ref,
    OtWT_ref,
    # data refs
    s0_ref,  # (BB, S)
    W_ref,  # (n_outer, BB, nw)
    # output refs
    U_ref,  # (n_outer, BB, Ku)
    Y_ref,  # (n_outer, BB, Kp)
    TH_ref,  # (n_outer, BB, Kt)
    sfin_ref,  # (BB, S)
    *,
    n_outer: int,
):
    """One batch block: full time loop in VMEM."""
    MT = MT_ref[:]
    NT = NT_ref[:]
    OuST = OuST_ref[:]
    OuWT = OuWT_ref[:]
    OyST = OyST_ref[:]
    OyWT = OyWT_ref[:]
    OtST = OtST_ref[:]
    OtWT = OtWT_ref[:]
    c = c_ref[:]
    ouc = ouc_ref[:]
    oyc = oyc_ref[:]
    otc = otc_ref[:]

    def dot(a, b):
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def body(t, s):
        w = W_ref[t]  # (BB, nw)
        U_ref[t] = dot(s, OuST) + ouc + dot(w, OuWT)
        Y_ref[t] = dot(s, OyST) + oyc + dot(w, OyWT)
        TH_ref[t] = dot(s, OtST) + otc + dot(w, OtWT)
        return dot(s, MT) + c + dot(w, NT)

    s = jax.lax.fori_loop(0, n_outer, body, s0_ref[:])
    sfin_ref[:] = s


class PallasRollout(NamedTuple):
    """Jittable kernel closure + theta-rows operator for cost post-pass."""

    run: object  # callable (s0_batch, W_packed) -> (U, Y, TH, s_fin)


def build_theta_operator(block_map: AffineBlockMap, ns: int):
    """Extract the solve-time THETA rows from the full state-stack
    operator (rows are ordered k-major: [x_k; theta_k] per solve)."""
    import numpy as np

    S = block_map.M_T.shape[0]
    K = block_map.os_c.shape[0] // S
    n_theta = S - ns
    idx = np.concatenate(
        [np.arange(k * S + ns, (k + 1) * S) for k in range(K)]
    )
    OtS_T = block_map.OsS_T[:, idx]
    otc = block_map.os_c[idx]
    OtW_T = block_map.OsW_T[:, idx]
    return OtS_T, otc, OtW_T, K, n_theta


def make_pallas_rollout(
    block_map: AffineBlockMap,
    n_outer: int,
    batch_block: int = 512,
    interpret: bool = False,
):
    """Build the jitted fused-rollout kernel.

    Returns ``run(s0_batch, W_packed) -> (U, Y, TH, s_fin)`` with
    ``s0_batch`` of shape ``(B, S)`` (already centered: ``s - s_star``),
    ``W_packed`` of shape ``(n_outer, B, K*nb*p)``; ``B`` must be a
    multiple of ``batch_block``.
    """
    S = block_map.M_T.shape[0]
    Ku = block_map.ou_c.shape[0]
    Kp = block_map.oy_c.shape[0]
    nw = block_map.N_T.shape[0]

    # Theta-rows operator (for the cost post-pass the caller runs).
    ns = S - block_map.cost_P.shape[0] - 0  # S = ns + n_theta
    n_theta = block_map.cost_P.shape[0]
    ns = S - n_theta
    OtS_T, otc, OtW_T, K, _ = build_theta_operator(block_map, ns)
    Kt = OtS_T.shape[1]

    kernel = functools.partial(_rollout_kernel, n_outer=n_outer)

    op_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(s0_batch, W_packed):
        B = s0_batch.shape[0]
        if B % batch_block:
            raise ValueError(
                f"B={B} must be a multiple of batch_block={batch_block}."
            )
        grid = (B // batch_block,)

        def bspec(shape_prefix, index_map):
            return pl.BlockSpec(
                shape_prefix, index_map, memory_space=pltpu.VMEM
            )

        out_shapes = (
            jax.ShapeDtypeStruct((n_outer, B, Ku), jnp.float32),
            jax.ShapeDtypeStruct((n_outer, B, Kp), jnp.float32),
            jax.ShapeDtypeStruct((n_outer, B, Kt), jnp.float32),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
        )
        in_specs = (
            [op_spec] * 12
            + [
                bspec((batch_block, S), lambda i: (i, 0)),
                bspec(
                    (n_outer, batch_block, nw), lambda i: (0, i, 0)
                ),
            ]
        )
        out_specs = (
            bspec((n_outer, batch_block, Ku), lambda i: (0, i, 0)),
            bspec((n_outer, batch_block, Kp), lambda i: (0, i, 0)),
            bspec((n_outer, batch_block, Kt), lambda i: (0, i, 0)),
            bspec((batch_block, S), lambda i: (i, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(
            block_map.M_T,
            block_map.c,
            block_map.N_T,
            block_map.OuS_T,
            block_map.ou_c,
            block_map.OuW_T,
            block_map.OyS_T,
            block_map.oy_c,
            block_map.OyW_T,
            OtS_T,
            otc,
            OtW_T,
            s0_batch,
            W_packed,
        )

    return jax.jit(run)


def pallas_batched_rollout(
    block_map: AffineBlockMap,
    x0s: jax.Array,  # (B, ns)
    u_pasts: jax.Array,  # (B, n, m)
    y_pasts: jax.Array,  # (B, n, p)
    Ws: jax.Array,  # (B, n_steps, p)
    n_steps: int,
    n_mpc_step: int = 1,
    batch_block: int = 512,
    interpret: bool = False,
):
    """Convenience wrapper matching ``make_linear_batched_rollout``'s
    result contract (returns a ClosedLoopResult)."""
    import math

    from direct_data_driven_mpc_tpu.control.loop import ClosedLoopResult

    B = x0s.shape[0]
    m = u_pasts.shape[2]
    p = y_pasts.shape[2]
    S = block_map.M_T.shape[0]
    n_theta = block_map.cost_P.shape[0]
    ns = S - n_theta
    K = block_map.os_c.shape[0] // S
    steps_per_outer = K * n_mpc_step
    n_outer = math.ceil(n_steps / steps_per_outer)
    n_solves = math.ceil(n_steps / n_mpc_step)
    pad = n_outer * steps_per_outer - n_steps

    dtype = jnp.float32
    s0 = (
        jnp.concatenate(
            [
                x0s.reshape(B, -1),
                u_pasts.reshape(B, -1),
                y_pasts.reshape(B, -1),
            ],
            axis=1,
        ).astype(dtype)
        - block_map.s_star[None, :]
    )
    W_pad = jnp.concatenate(
        [
            Ws.astype(dtype),
            jnp.zeros((B, pad, p), dtype=dtype),
        ],
        axis=1,
    )
    # (B, n_outer, spb*p) -> (n_outer, B, nw)
    W_packed = W_pad.reshape(B, n_outer, steps_per_outer * p).transpose(
        1, 0, 2
    )

    run = make_pallas_rollout(
        block_map, n_outer, batch_block=batch_block, interpret=interpret
    )
    U, Y, TH, s_fin = run(s0, W_packed)
    s_fin = s_fin + block_map.s_star[None, :]

    u_sys = U.transpose(1, 0, 2).reshape(B, -1, m)[:, :n_steps]
    y_sys = Y.transpose(1, 0, 2).reshape(B, -1, p)[:, :n_steps]
    thetas = TH.transpose(1, 0, 2).reshape(B, -1, n_theta)[:, :n_solves]
    with jax.default_matmul_precision("highest"):
        costs = (
            jnp.einsum(
                "bti,ij,btj->bt", thetas, block_map.cost_P, thetas
            )
            + thetas @ block_map.cost_q
            + block_map.cost_r
        )
    return ClosedLoopResult(
        u_sys=u_sys,
        y_sys=y_sys,
        costs=costs,
        converged=jnp.isfinite(costs),
        x_final=s_fin[:, :ns],
        u_past=s_fin[:, ns : ns + u_pasts.shape[1] * m].reshape(
            u_pasts.shape
        ),
        y_past=s_fin[:, ns + u_pasts.shape[1] * m :].reshape(
            y_pasts.shape
        ),
    )
