"""Distributed-BA scaling harness (BASELINE: ≥70% efficiency at ≥2 hosts).

Measures the sliding-window BA GN-step time at 1/2/4/8 shards of the
landmark bank, on whatever devices exist: a real TPU slice when
available, otherwise the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 — the same code
path; virtual-device timings exercise the partitioning but not real
interconnect bandwidth, and are labeled as such).

Prints one JSON line:
  {"metric": "ba_scaling", "table": {"1": ms, "2": ms, ...},
   "efficiency_2x": ..., "virtual": bool}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("LDSO_PLATFORM") == "cpu":
    os.environ.setdefault("LDSO_NO_COMPILE_CACHE", "1")
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ldso_tpu.config import preset
    from ldso_tpu.distributed import sharded_ba
    from ldso_tpu.distributed.mesh import make_mesh_2d
    from ldso_tpu.eval.toys import make_synthetic_window

    cfg = preset("default")
    win, _ = make_synthetic_window(cfg, w=640, h=480, n_frames=6,
                                   idepth_noise=0.05, pose_noise=0.003)
    D = cfg.shapes.state_dim
    HM = np.zeros((D, D), np.float32)
    bM = np.zeros(D, np.float32)

    n_dev = len(jax.devices())
    virtual = jax.devices()[0].platform == "cpu"
    table = {}
    for n in (1, 2, 4, 8):
        if n > n_dev:
            break
        # 2-D (dcn, ici) mesh when it divides evenly, else 1-D
        if n >= 2:
            mesh = make_mesh_2d(n_hosts=2, devices=jax.devices()[:n])
        else:
            mesh = sharded_ba.make_mesh(1)
        win_sh = sharded_ba.shard_window(win, mesh)
        step = sharded_ba.make_distributed_ba_step(mesh, cfg)
        out, E = step(win_sh, HM, bM, lam=1e-5)     # compile
        jax.block_until_ready(out)
        iters = 20
        t0 = time.perf_counter()
        w = win_sh
        for _ in range(iters):
            w, E = step(w, HM, bM, lam=1e-5)
        jax.block_until_ready(w)
        table[str(n)] = round(1e3 * (time.perf_counter() - t0) / iters, 3)

    eff2 = None
    if "1" in table and "2" in table:
        eff2 = round(table["1"] / (2 * table["2"]), 3)
    rec = {
        "metric": "ba_scaling_step_ms",
        "table": table,
        "efficiency_2x": eff2,
        "virtual_devices": bool(virtual),
        "n_devices": n_dev,
    }
    if virtual:
        rec["physical_cores"] = os.cpu_count()
        rec["note"] = (
            "virtual CPU devices OVERSUBSCRIBE the same physical cores: "
            "all shards time-share one host, so wall-clock cannot improve "
            "with shard count and 'efficiency' here measures partitioning "
            "overhead only, not interconnect scaling. The table validates "
            "that the sharded schedule runs at production shapes; real "
            "scaling numbers require >=2 TPU hosts (one collective per GN "
            "iteration by construction, distributed/sharded_ba.py).")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
