#!/usr/bin/env python
"""TPU sweep harness for the fused-rollout Pallas kernel.

Usage: python scripts/sweep_pallas.py <K> <B> [batch_block] [T] [R] [backend] [cost_precision]

Runs ONE kernel configuration (one compile per process -- the remote
compile tunnel is slow and variable; see CLAUDE.md) with the amortized
harness and prints per-rollout time + solves/s. Used to pick the bench
defaults recorded in docs/PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    K = int(sys.argv[1])
    B = int(sys.argv[2])
    bb = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    T = int(sys.argv[4]) if len(sys.argv) > 4 else 400
    R = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    backend = sys.argv[6] if len(sys.argv) > 6 else "pallas"
    cost_precision = sys.argv[7] if len(sys.argv) > 7 else "high"

    import jax
    import jax.numpy as jnp

    from bench import _controller, time_amortized
    from direct_data_driven_mpc_tpu.control.linear_engine import (
        build_linear_engine,
    )
    from direct_data_driven_mpc_tpu.models.lti_model import LTIModel
    from direct_data_driven_mpc_tpu.ops.pallas_rollout import (
        make_amortized_pallas_run,
        pick_batch_block,
    )
    from direct_data_driven_mpc_tpu.parallel.batch import draw_noise_batch

    n, m, p, N, L = 4, 2, 2, 400, 30
    rng = np.random.default_rng(0)
    plant = LTIModel(
        A=np.array(
            [
                [0.921, 0, 0.041, 0],
                [0, 0.918, 0, 0.033],
                [0, 0, 0.924, 0],
                [0, 0, 0, 0.937],
            ]
        ),
        B=np.array([[0.017, 0.001], [0.001, 0.023], [0, 0.061], [0.072, 0]]),
        C=np.array([[1.0, 0, 0, 0], [0, 1, 0, 0]]),
        D=np.zeros((2, 2)),
        eps_max=0.002,
    )
    ctrl = _controller(
        N, L, plant, rng, n, m, p,
        np.array([[1.0], [1.0]]), np.array([[0.65], [0.77]]),
    )
    t0 = time.perf_counter()
    bm = build_linear_engine(
        ctrl, plant.as_params(), solves_per_block=K, dtype=jnp.float32
    )
    print(f"compose K={K}: {time.perf_counter() - t0:.1f}s", flush=True)
    if bb == 0 and backend == "pallas":
        bb = pick_batch_block(bm, B)
    print(f"config: K={K} B={B} bb={bb} T={T} R={R} backend={backend}",
          flush=True)

    dtype = jnp.float32
    x0s = jnp.tile(jnp.asarray(plant.get_state(), dtype)[None], (B, 1))
    ups = jnp.tile(
        jnp.asarray(ctrl.u_past.reshape(n, m), dtype)[None], (B, 1, 1)
    )
    yps = jnp.tile(
        jnp.asarray(ctrl.y_past.reshape(n, p), dtype)[None], (B, 1, 1)
    )
    noise = draw_noise_batch(jax.random.key(0), B, T, p, 0.002, dtype=dtype)
    run = make_amortized_pallas_run(
        bm, n_steps=T, batch_block=bb or None, backend=backend,
        cost_precision=cost_precision,
    )
    args = (x0s, ups, yps, noise)

    t0 = time.perf_counter()
    checksum, ok = run(*args, 1)
    _ = float(checksum)
    print(f"compile + first run: {time.perf_counter() - t0:.1f}s "
          f"ok={bool(ok)}", flush=True)
    tm = time_amortized(run, args, R_small=1, R_big=R)
    sps = B * T * R / tm["t_big"]
    print(
        f"RESULT {backend} K={K} B={B} bb={bb}: "
        f"per-rollout {tm['per_rep']*1e3:.1f} ms, "
        f"relay {tm['per_call_overhead']*1e3:.0f} ms "
        f"({tm['overhead_frac_of_big']*100:.1f}%), "
        f"{sps:,.0f} solves/s (on-device {B*T/tm['per_rep']:,.0f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
