"""Pallas TPU kernel: fused condensed closed-loop rollout.

Runs the multi-block closed-loop recursion of the condensed linear
engine (control/linear_engine.py) as ONE Pallas kernel: the grid is
``(batch_blocks, n_outer)`` with time as the minor (fastest) dimension,
the carried state ``s`` lives in a VMEM scratch buffer that persists
across the sequential time programs of each batch block, and each grid
step is a handful of VMEM-resident MXU matmuls -- no XLA while-loop
overhead and no HBM round-trips for the carry.

Layout notes (see the Pallas guide's tiling constraints):
- batch is the sublane dimension (blocks of ``BB`` scenarios);
- all feature dimensions (state S, packed noise K*nb*p, packed outputs
  K*nb*m / K*nb*p / K*n_theta) ride the lane dimension; packing K
  solves per block iteration is exactly what makes these lane widths
  MXU-friendly (e.g. K=100, p=2 -> 200 lanes) instead of p=2;
- per grid step only ONE time block of noise/outputs is resident, so
  VMEM usage is independent of the rollout length.

Per-solve costs are evaluated OUTSIDE the kernel in one vectorized
quadratic-form pass over the emitted solve-time theta stack (the
sequential kernel only materializes the affine outputs).

The kernel computes identically to ``linear_closed_loop_rollout``
(asserted in tests/test_pallas_rollout.py, which runs the kernel in
interpreter mode on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from direct_data_driven_mpc_tpu.control.linear_engine import AffineBlockMap


def _rollout_kernel(
    # operator refs (VMEM, whole arrays, replicated across the grid)
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
    # data refs (one batch/time block each)
    s0_ref,  # (BB, S)
    W_ref,  # (1, BB, nw)
    # output refs
    U_ref,  # (1, BB, Ku)
    Y_ref,  # (1, BB, Kp)
    TH_ref,  # (1, BB, Kt)
    sfin_ref,  # (BB, S)
    # scratch
    s_scr,  # (BB, S) persistent carry across the time grid dim
):
    t = pl.program_id(1)
    n_outer = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        s_scr[:] = s0_ref[:]

    def dot(a, b):
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    s = s_scr[:]
    w = W_ref[0]
    U_ref[0] = dot(s, OuST_ref[:]) + ouc_ref[:] + dot(w, OuWT_ref[:])
    Y_ref[0] = dot(s, OyST_ref[:]) + oyc_ref[:] + dot(w, OyWT_ref[:])
    TH_ref[0] = dot(s, OtST_ref[:]) + otc_ref[:] + dot(w, OtWT_ref[:])
    s_next = dot(s, MT_ref[:]) + c_ref[:] + dot(w, NT_ref[:])
    s_scr[:] = s_next

    @pl.when(t == n_outer - 1)
    def _():
        sfin_ref[:] = s_next


def build_theta_operator(block_map: AffineBlockMap, ns: int):
    """Extract the solve-time THETA rows from the full state-stack
    operator (rows are ordered k-major: [x_k; theta_k] per solve)."""
    import numpy as np

    S = block_map.M_T.shape[0]
    K = block_map.os_c.shape[0] // S
    idx = np.concatenate(
        [np.arange(k * S + ns, (k + 1) * S) for k in range(K)]
    )
    OtS_T = block_map.OsS_T[:, idx]
    otc = block_map.os_c[idx]
    OtW_T = block_map.OsW_T[:, idx]
    return OtS_T, otc, OtW_T, K


#: TPU VMEM scoped limit on this platform (see CLAUDE.md): kernels must
#: keep operator + double-buffered data blocks under this.
VMEM_LIMIT_BYTES = 16 * 1024 * 1024


def _tiled(rows: int, cols: int) -> int:
    """Elements of a 2-D f32 VMEM buffer after (8, 128) tile padding."""
    return ((rows + 7) // 8 * 8) * ((cols + 127) // 128 * 128)


def pallas_vmem_bytes(block_map: AffineBlockMap, batch_block: int) -> int:
    """Estimated VMEM residency of one grid step of the rollout kernel:
    the replicated operator matrices (resident once) plus the
    double-buffered per-block data/output tiles plus the carry scratch,
    all with (8, 128) tile padding (Mosaic pads the sublane/lane dims;
    a 20-wide state tile occupies 128 lanes).

    Used by :func:`pick_batch_block` to keep large ``S``/``K``
    configurations inside the 16 MB scoped VMEM limit. Measured
    ground truth: the four-tank K=100 config compiles at block 256
    (~8 MB by this estimate) and is rejected by the compiler at block
    512 (~19 MB actual) -- hence the conservative headroom default.
    """
    S = block_map.M_T.shape[0]
    nw = block_map.N_T.shape[0]
    Ku = block_map.ou_c.shape[0]
    Kp = block_map.oy_c.shape[0]
    n_theta = block_map.cost_P.shape[0]
    K = block_map.os_c.shape[0] // S
    Kt = K * n_theta
    itemsize = 4  # kernel computes in float32
    bb = batch_block
    op_elems = (
        _tiled(S, S) + _tiled(1, S) + _tiled(nw, S)  # M_T, c, N_T
        + _tiled(S, Ku) + _tiled(1, Ku) + _tiled(nw, Ku)  # Ou
        + _tiled(S, Kp) + _tiled(1, Kp) + _tiled(nw, Kp)  # Oy
        + _tiled(S, Kt) + _tiled(1, Kt) + _tiled(nw, Kt)  # Otheta
    )
    blk_elems = (
        _tiled(bb, S)  # s0 block
        + _tiled(bb, nw)  # W block
        + _tiled(bb, Ku) + _tiled(bb, Kp) + _tiled(bb, Kt)  # outputs
        + _tiled(bb, S)  # s_fin block
    )
    scratch_elems = _tiled(bb, S)
    # Data blocks are double-buffered by the pipeline; the operator is
    # fetched once (same block every program).
    return itemsize * (op_elems + 2 * blk_elems + scratch_elems)


def pick_batch_block(
    block_map: AffineBlockMap,
    B: int,
    limit_bytes: int = VMEM_LIMIT_BYTES,
    headroom: float = 0.6,
) -> int:
    """Largest power-of-two batch block (>= 8 sublanes) dividing ``B``
    whose estimated VMEM residency fits under ``headroom * limit``."""
    budget = headroom * limit_bytes
    cand = 1024
    while cand >= 8:
        if B % cand == 0 and pallas_vmem_bytes(block_map, cand) <= budget:
            return cand
        cand //= 2
    raise ValueError(
        f"No batch block of B={B} fits the VMEM budget "
        f"({pallas_vmem_bytes(block_map, 8)} bytes at block 8 vs "
        f"{budget:.0f} available); shrink solves_per_block."
    )


def make_pallas_rollout(
    block_map: AffineBlockMap,
    n_outer: int,
    batch_block: int = 256,
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
    n_theta = block_map.cost_P.shape[0]
    ns = S - n_theta
    OtS_T, otc, OtW_T, K = build_theta_operator(block_map, ns)
    Kt = OtS_T.shape[1]

    op_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(s0_batch, W_packed):
        B = s0_batch.shape[0]
        if B % batch_block:
            raise ValueError(
                f"B={B} must be a multiple of batch_block={batch_block}."
            )
        grid = (B // batch_block, n_outer)

        def bspec(shape, index_map):
            return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

        out_shapes = (
            jax.ShapeDtypeStruct((n_outer, B, Ku), jnp.float32),
            jax.ShapeDtypeStruct((n_outer, B, Kp), jnp.float32),
            jax.ShapeDtypeStruct((n_outer, B, Kt), jnp.float32),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
        )
        # Operator matrices: whole-array blocks, same for every program.
        in_specs = [op_spec] * 12 + [
            bspec((batch_block, S), lambda b, t: (b, 0)),
            bspec((1, batch_block, nw), lambda b, t: (t, b, 0)),
        ]
        out_specs = (
            bspec((1, batch_block, Ku), lambda b, t: (t, b, 0)),
            bspec((1, batch_block, Kp), lambda b, t: (t, b, 0)),
            bspec((1, batch_block, Kt), lambda b, t: (t, b, 0)),
            bspec((batch_block, S), lambda b, t: (b, 0)),
        )
        return pl.pallas_call(
            _rollout_kernel,
            grid=grid,
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((batch_block, S), jnp.float32),
            ],
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
    batch_block: int | None = None,
    interpret: bool = False,
):
    """Convenience wrapper matching ``make_linear_batched_rollout``'s
    result contract (returns a ClosedLoopResult). ``batch_block=None``
    auto-sizes the block to the VMEM budget."""
    import math

    from direct_data_driven_mpc_tpu.control.loop import ClosedLoopResult

    B = x0s.shape[0]
    if batch_block is None:
        batch_block = pick_batch_block(block_map, B)
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


def make_amortized_pallas_run(
    block_map: AffineBlockMap,
    n_steps: int,
    n_mpc_step: int = 1,
    batch_block: int | None = None,
    interpret: bool = False,
):
    """Amortized-throughput harness for the kernel (same contract as
    ``bench.make_amortized_linear_run``): one jitted call runs ``R``
    back-to-back kernel rollouts, R a traced fori_loop trip count.

    Repetition ``i`` rotates the packed noise by ``i`` outer blocks (a
    distinct bounded-noise realization per rep; nothing CSE-able) and
    every repetition's outputs -- including the per-solve cost
    quadratic-form pass, to match the XLA engine's per-rollout work --
    fold into a carried checksum so nothing is dead-code-eliminated.

    Returns jitted ``run(x0s, u_pasts, y_pasts, Ws, R) ->
    (checksum, ok)``.
    """
    import math

    S = block_map.M_T.shape[0]
    n_theta = block_map.cost_P.shape[0]
    K = block_map.os_c.shape[0] // S
    steps_per_outer = K * n_mpc_step
    n_outer = math.ceil(n_steps / steps_per_outer)
    n_solves = math.ceil(n_steps / n_mpc_step)
    pad = n_outer * steps_per_outer - n_steps

    def run(x0s, u_pasts, y_pasts, Ws, R):
        B = x0s.shape[0]
        p = y_pasts.shape[2]
        bb = batch_block
        if bb is None:
            bb = pick_batch_block(block_map, B)
        kernel = make_pallas_rollout(
            block_map, n_outer, batch_block=bb, interpret=interpret
        )
        s0 = (
            jnp.concatenate(
                [
                    x0s.reshape(B, -1),
                    u_pasts.reshape(B, -1),
                    y_pasts.reshape(B, -1),
                ],
                axis=1,
            ).astype(jnp.float32)
            - block_map.s_star[None, :]
        )
        W_pad = jnp.concatenate(
            [
                Ws.astype(jnp.float32),
                jnp.zeros((B, pad, p), dtype=jnp.float32),
            ],
            axis=1,
        )
        W_packed = W_pad.reshape(
            B, n_outer, steps_per_outer * p
        ).transpose(1, 0, 2)

        def one_rep(i, carry):
            checksum, ok = carry
            W_i = jnp.roll(W_packed, i, axis=0)
            U, Y, TH, s_fin = kernel(s0, W_i)
            thetas = TH.transpose(1, 0, 2).reshape(B, -1, n_theta)[
                :, :n_solves
            ]
            with jax.default_matmul_precision("highest"):
                costs = (
                    jnp.einsum(
                        "bti,ij,btj->bt",
                        thetas,
                        block_map.cost_P,
                        thetas,
                    )
                    + thetas @ block_map.cost_q
                    + block_map.cost_r
                )
            checksum = (
                checksum
                + jnp.sum(costs[:, -1])
                + jnp.sum(s_fin)
                + jnp.sum(U)
                + jnp.sum(Y)
            )
            ok = ok & jnp.isfinite(checksum)
            return (checksum, ok)

        return jax.lax.fori_loop(
            0, R, one_rep, (jnp.float32(0.0), jnp.bool_(True))
        )

    return jax.jit(run)
