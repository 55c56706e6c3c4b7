"""Benchmark: sliding-window BA Gauss-Newton throughput on the device.

Prints ONE JSON line: keyframe-optimization throughput in GN iterations
per second at full production shapes (2048 points x 8-slot window x
8-pattern = ~100k photometric residuals per iteration), the hottest
path of the engine (reference analog: FullSystem::optimize, which the
DSO paper budgets ~10-20 ms/iteration on a desktop CPU at these shapes;
baseline below is that CPU reference point: ~50 GN iter/s).
"""

import json
import time

import numpy as np

BASELINE_ITERS_PER_S = 50.0   # reference: ~6 GN iters in ~120 ms per KF (i7 CPU)


def main():
    import jax
    import jax.numpy as jnp

    from ldso_tpu.ba.residuals import assemble
    from ldso_tpu.ba.solve import (apply_step, _solve_core, fix_mask,
                                   prior_diag, scale_vector)
    from ldso_tpu.config import preset
    from ldso_tpu.core.window import state_delta
    from ldso_tpu.eval.toys import make_synthetic_window

    cfg = preset("default")   # 2048 points, 8 window slots — production shapes
    win, _ = make_synthetic_window(cfg, w=640, h=480, n_frames=6,
                                   idepth_noise=0.05, pose_noise=0.003)
    F = cfg.shapes.max_frames
    D = cfg.shapes.state_dim
    prior_d = jnp.asarray(prior_diag(np.asarray(win.frame_valid), cfg), jnp.float32)
    s_vec = jnp.asarray(scale_vector(F, cfg.scales))
    fixed = jnp.asarray(fix_mask(F, 0))
    HM = jnp.zeros((D, D), jnp.float32)
    bM = jnp.zeros(D, jnp.float32)

    @jax.jit
    def gn_step(win):
        sys = assemble(win, huber_th=cfg.ba.huber_th,
                       outlier_sum=cfg.ba.outlier_th_sum_component)
        dx, dd = _solve_core(
            sys.H, sys.b, sys.H_xd, sys.H_dd, sys.b_d,
            HM, bM, state_delta(win), prior_d, s_vec, fixed,
            jnp.zeros(D, jnp.float32), jnp.float32(1e-5), win.p_valid)
        return apply_step(win, dx, dd), sys.energy

    # warmup / compile
    w2, E = gn_step(win)
    jax.block_until_ready(w2)

    n = 30
    t0 = time.perf_counter()
    w = win
    for _ in range(n):
        w, E = gn_step(w)
    jax.block_until_ready(w)
    dt = time.perf_counter() - t0
    iters_per_s = n / dt

    print(json.dumps({
        "metric": "ba_gn_iters_per_s",
        "value": round(iters_per_s, 2),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
