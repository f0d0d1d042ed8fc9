"""Decompose large_plant time: raw kernel (no cost) at several K and
batch blocks vs the post-cost pass, on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from direct_data_driven_mpc_tpu.control.linear_engine import (
        build_linear_engine,
    )
    from direct_data_driven_mpc_tpu.models.random_lti import (
        random_stable_lti,
    )
    from direct_data_driven_mpc_tpu.ops.pallas_rollout import (
        _build_fused_operator,
        _make_post_cost_fn,
        _make_rollout_from_fused,
        pick_batch_block,
    )
    from direct_data_driven_mpc_tpu.parallel.batch import draw_noise_batch

    B, T = 65536, 400
    n = ns = m = p = 10
    N, L = 600, 30
    rng = np.random.default_rng(0)
    pm = random_stable_lti(seed=0, ns=ns, m=m, p=p)
    u_s = 0.5 * np.ones((m, 1))
    y_s = pm.get_equilibrium_output_from_input(u_s.flatten()).reshape(
        -1, 1
    )
    import bench as _b

    ctrl = _b._controller(N, L, pm, rng, n, m, p, u_s, y_s)
    dtype = jnp.float32

    x0 = jnp.asarray(pm.get_state(), dtype)
    up = jnp.asarray(ctrl.u_past.reshape(n, m), dtype)
    yp = jnp.asarray(ctrl.y_past.reshape(n, p), dtype)

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        best = float("inf")
        for _i in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jax.tree.leaves(out)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    import ast
    sweep = os.environ.get("LP_SWEEP")
    if sweep:  # e.g. LP_SWEEP="[(25,(512,1024,2048)),(50,(256,512))]"
        plan = ast.literal_eval(sweep)
    else:
        plan = ((50, (None, 64, 256)), (25, (None,)), (10, (None,)))
    for K, bbs in plan:
        bm = build_linear_engine(
            ctrl, pm.as_params(), solves_per_block=K, dtype=dtype
        )
        import math

        n_outer = math.ceil(T / K)
        fused = _build_fused_operator(bm, include_cost=False)
        S = bm.M_T.shape[0]
        nw = K * p
        s0 = jnp.tile(
            (jnp.concatenate([x0, up.reshape(-1), yp.reshape(-1)])
             - bm.s_star)[None],
            (B, 1),
        )
        Wp = draw_noise_batch(
            jax.random.key(0), B, T, p, 0.002, dtype=dtype
        ).reshape(B, n_outer, nw).transpose(1, 0, 2)
        for bb in bbs:
            bb_eff = bb or pick_batch_block(bm, B, include_cost=False)
            kern = jax.jit(_make_rollout_from_fused(
                fused, n_outer, batch_block=bb_eff, interpret=False,
                stacked_highest=os.environ.get("LP_STACK6") == "1",
            ))
            try:
                t = timeit(kern, s0, Wp)
                log(f"K={K} bb={bb_eff}: kernel-only {t * 1e3:.1f} ms "
                    f"-> {B * T / t / 1e6:.0f}M solves/s")
            except Exception as e:  # noqa: BLE001
                log(f"K={K} bb={bb_eff}: FAILED {str(e)[:200]}")

    # Post pass alone.
    bm = build_linear_engine(
        ctrl, pm.as_params(), solves_per_block=50, dtype=dtype
    )
    post = _make_post_cost_fn(bm, 1)
    u_sys = jnp.zeros((B, T, m), dtype)
    y_sys = jnp.zeros((B, T, p), dtype)
    pfn = jax.jit(lambda a, b, c, d: post(a, b, c, d))
    t = timeit(
        pfn, jnp.tile(up[None], (B, 1, 1)), jnp.tile(yp[None], (B, 1, 1)),
        u_sys, y_sys,
    )
    log(f"post-cost pass alone: {t * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
