"""Projected multi-host scaling efficiency from measured collective
payloads (BASELINE.md "≥70% scaling efficiency at ≥2 hosts" — VERDICT r3
#7: real multi-host hardware is unavailable here and virtual-device
timings measure partitioning overhead only, so the defensible number is
a MODEL: measured per-iteration compute + exactly-counted collective
payloads x published interconnect constants).

Writes benchmarks/SCALING_r04.json with the projection table and every
assumption.

Communication counts (exact, from the implementations):
  * distributed BA (distributed/sharded_ba.py): ONE psum of D² + 2D + 1 floats
    per GN iteration (D = 8F+4): the combined camera system Σ(H − H_sc),
    diag(ΣH) (needed separately for damping order), Σ(b − b_sc), energy.
    Cross-checked against the compiled StableHLO collectives below.
  * block PGO (distributed/sharded_pgo.py make_block_pgo): per CG
    iteration one halo all_gather [n,H,7] + one all_to_all [n,H,7] + 2
    scalar psums; per LM iteration one pose-halo gather [n,H,16], one
    diag/gradient exchange [n,H,56], one energy scalar.
  * replicated-PGO (make_distributed_pgo): per CG iteration one psum of
    the FULL [K,7] — the O(K) design the block solver replaces.

Interconnect constants (published figures, conservative ends):
  * ICI (v5e 2D torus): ~100 GB/s per-chip bisection, ~1 µs per hop;
    ring all-reduce of S bytes over c chips ≈ 2S·(c-1)/c / BW + 2c·lat.
  * DCN (multi-host): 25 GB/s per host (200 Gbps NIC), 10 µs latency.

Compute times: single-chip measurements from this repo's TPU runs
(ba_gn_step steady; PGO edge-linearization throughput measured here on
the current backend and scaled by the v5e/CPU factor measured for BA).
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ldso_tpu.config import preset as _preset

F = _preset("default").shapes.max_frames
D = 8 * F + 4                 # reduced camera system dimension
BYTES = 4

# measured on the real v5e chip (scripts/bench_kernels.py, round 3/4)
T_BA_GN_MS = 5.8              # one windowed-BA GN iteration, 2048 pts
N_GN_PER_KF = 4               # median accepted iterations (step_break 1e-3)

# interconnect model
ICI_BW = 100e9                # B/s
ICI_LAT = 1e-6                # s/hop
DCN_BW = 25e9                 # B/s per host
DCN_LAT = 10e-6               # s


def allreduce_time(bytes_, n, bw, lat):
    """Ring all-reduce cost model: 2·S·(n-1)/n / BW + 2·n·lat."""
    if n <= 1:
        return 0.0
    return 2.0 * bytes_ * (n - 1) / n / bw + 2.0 * n * lat


def ba_projection(hosts, chips_per_host=4):
    """Distributed BA: points sharded over all chips; ONE psum of the
    (D²+2D+2)-float camera system per GN iteration. Within a host the
    psum rides ICI; across hosts the partial sums cross DCN once."""
    payload = (D * D + 2 * D + 1) * BYTES
    rows = []
    for n_h in hosts:
        chips = n_h * chips_per_host
        t_comp = T_BA_GN_MS * 1e-3 / chips
        t_ici = allreduce_time(payload, chips_per_host, ICI_BW, ICI_LAT)
        t_dcn = allreduce_time(payload, n_h, DCN_BW, DCN_LAT)
        t_iter = t_comp + t_ici + t_dcn
        t_single = T_BA_GN_MS * 1e-3
        eff = t_single / (chips * t_iter)
        rows.append(dict(hosts=n_h, chips=chips,
                         t_compute_us=round(1e6 * t_comp, 1),
                         t_ici_us=round(1e6 * t_ici, 1),
                         t_dcn_us=round(1e6 * t_dcn, 1),
                         psum_bytes=payload,
                         efficiency=round(eff, 3)))
    return rows


def measure_pgo_edge_rate(K=4096, E=4135):
    """Edges linearized per second on THIS backend (one device)."""
    import jax
    import jax.numpy as jnp
    from ldso_tpu.loop import posegraph
    from ldso_tpu.math import lie

    rng = np.random.default_rng(0)
    S = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    S[:, :3, 3] = rng.normal(0, 1, (K, 3))
    ei = np.arange(1, E + 1, dtype=np.int32) % K
    ej = np.arange(0, E, dtype=np.int32) % K
    S_meas = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))

    Smi = lie.sim3_inverse(jnp.asarray(S_meas))
    f = jax.jit(lambda s: posegraph._edge_system(
        s, jnp.asarray(ei), jnp.asarray(ej), Smi,
        jnp.ones(E, jnp.float32), 0.5)[0])
    out = f(jnp.asarray(S))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(jnp.asarray(S))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    return E / dt


def pgo_projection(hosts, K=4096, E=4135, H=64, cg_iters=60,
                   chips_per_host=4, edge_rate=None):
    """Block-partitioned PGO: edges split over hosts (trajectory blocks
    per host — PGO's parallel axis is across hosts / DCN, SURVEY §5.7);
    per CG iteration 2 halo exchanges of n·H·7 floats + 2 scalars."""
    rows = []
    rate = edge_rate or 2e5
    for n_h in hosts:
        n = n_h * chips_per_host
        t_comp = (E / n) / rate * cg_iters          # matvec edges × CG
        halo_bytes = n * H * 7 * BYTES
        t_comm = cg_iters * (
            2 * allreduce_time(halo_bytes, n_h, DCN_BW, DCN_LAT)
            + 2 * allreduce_time(halo_bytes, chips_per_host, ICI_BW,
                                 ICI_LAT)
            + 2 * allreduce_time(4, n_h, DCN_BW, DCN_LAT))
        t_single = E / rate * cg_iters
        eff = t_single / (n * (t_comp + t_comm))
        # the replicated design's per-CG psum for contrast
        repl_bytes = K * 7 * BYTES
        rows.append(dict(hosts=n_h, chips=n,
                         halo_bytes_per_cg=halo_bytes,
                         replicated_bytes_per_cg=repl_bytes,
                         t_compute_ms=round(1e3 * t_comp, 2),
                         t_comm_ms=round(1e3 * t_comm, 2),
                         efficiency=round(eff, 3)))
    return rows


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1, "i1": 1}


def _tensor_bytes(ty: str) -> int:
    """bytes of a StableHLO tensor type string like 'tensor<84x84xf32>'."""
    m = re.match(r"tensor<(.*?)>", ty)
    if not m:
        return 0
    parts = m.group(1).split("x")
    dt = parts[-1]
    dims = [int(p) for p in parts[:-1] if p.isdigit()]
    n = 1
    for d in dims:
        n *= d
    return n * _DTYPE_BYTES.get(dt, 4)


def hlo_collectives(lowered_text: str):
    """Collective ops + per-op payload bytes from lowered StableHLO.

    shard_map traces psum/all_gather/all_to_all into explicit stablehlo
    collective ops BEFORE compilation, so the lowered text carries the
    exact communicated tensor types — this is the artifact-of-record
    cross-check VERDICT r4 #10 demands: the scaling model's counted
    payloads must equal what the compiler actually communicates."""
    out = []
    for op in ("all_reduce", "all_gather", "all_to_all",
               "collective_permute", "reduce_scatter"):
        start = 0
        needle = f"stablehlo.{op}"
        while True:
            i = lowered_text.find(needle, start)
            if i < 0:
                break
            # scan past an optional reduction-body block `({ ... })`
            # (all_reduce/reduce_scatter carry one; its inner ops have
            # their own `: tensor<...>` annotations that a lazy regex
            # would mistake for the collective's type signature)
            j = None
            body = lowered_text.find("({", i, i + 400)
            if body >= 0:
                depth_n = 0
                k = body
                while k < len(lowered_text):
                    if lowered_text.startswith("({", k):
                        depth_n += 1
                        k += 2
                    elif lowered_text.startswith("})", k):
                        depth_n -= 1
                        k += 2
                        if depth_n == 0:
                            break
                    else:
                        k += 1
                j = k
            if j is not None:       # body op: type follows the `})`
                m = re.match(r'\s*:\s*(\([^)]*\)|tensor<[^>]*>)\s*->',
                             lowered_text[j:j + 2000], re.S)
            else:                   # single-line op: type before `->`
                eol = lowered_text.find("\n", i)
                m = re.search(r':\s*(\([^()]*\)|tensor<[^>]*>)\s*->',
                              lowered_text[i:eol if eol > 0 else i + 2000])
            if m:
                in_tys = re.findall(r"tensor<[^>]*>", m.group(1))
                out.append(dict(op=op,
                                bytes=sum(_tensor_bytes(t) for t in in_tys),
                                operands=in_tys))
            start = i + len(needle)
    return out


def crosscheck_ba_psum():
    """Lower the distributed BA step on a virtual mesh and assert the
    all-reduce payload equals the model's counted psum bytes."""
    import jax
    import jax.numpy as jnp
    from ldso_tpu.distributed import sharded_ba
    from ldso_tpu.eval.toys import make_synthetic_window

    cfg = _preset("default")
    # crosscheck on the virtual CPU mesh even when the default backend
    # is the (single-chip) TPU tunnel: collectives must be lowered for
    # a real multi-device mesh to carry their true payloads
    cpu_devs = jax.devices("cpu")
    n_dev = min(8, len(cpu_devs))
    from jax.sharding import Mesh as _Mesh
    mesh = _Mesh(np.asarray(cpu_devs[:n_dev]), (sharded_ba.AXIS,))
    win, _ = make_synthetic_window(cfg, w=128, h=96, n_frames=3,
                                   idepth_noise=0.05, pose_noise=0.003)
    win = sharded_ba.shard_window(win, mesh)
    step = sharded_ba.make_distributed_ba_step(mesh, cfg)
    from ldso_tpu.ba.solve import prior_diag
    HM = jnp.zeros((D, D), jnp.float32)
    bM = jnp.zeros(D, jnp.float32)
    prior_d = jnp.asarray(prior_diag(np.asarray(win.frame_valid), cfg),
                          jnp.float32)
    txt = step.jitted.lower(win, HM, bM, prior_d,
                            jnp.float32(1e-5)).as_text()
    colls = hlo_collectives(txt)
    ar_bytes = sum(c["bytes"] for c in colls if c["op"] == "all_reduce")
    counted = (D * D + 2 * D + 1) * BYTES
    return dict(
        hlo_all_reduce_ops=len([c for c in colls
                                if c["op"] == "all_reduce"]),
        hlo_all_reduce_bytes=ar_bytes,
        model_psum_bytes=counted,
        match=bool(abs(ar_bytes - counted) <= 64),   # scalars may pack
        ops=colls)


def crosscheck_block_pgo(K=512, H=64):
    """Lower one block-PGO run and report its per-collective payloads
    against the model's halo counts (n·H·7 floats per CG exchange)."""
    import jax
    import jax.numpy as jnp
    from ldso_tpu.distributed import sharded_pgo

    cpu_devs = jax.devices("cpu")
    n_dev = min(8, len(cpu_devs))
    rng = np.random.default_rng(0)
    th = 2 * np.pi * np.arange(K) / K
    S = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    S[:, 0, 3] = np.sin(th)
    S[:, 2, 3] = 1 - np.cos(th)
    ei = np.arange(K - 1, dtype=np.int32)
    ej = ei + 1
    S_meas = np.stack([np.linalg.inv(S[j]) @ S[i]
                       for i, j in zip(ei, ej)]).astype(np.float32)
    w_e = np.ones(K - 1, np.float32)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    from jax.sharding import Mesh as _Mesh
    mesh = _Mesh(np.asarray(cpu_devs[:n_dev]), (sharded_pgo.AXIS,))
    part = sharded_pgo.partition_pose_graph(K, ei, ej, S_meas, w_e, n_dev)
    run = sharded_pgo.make_block_pgo(mesh, part, lm_iters=1, cg_iters=1)
    Kp = part["Kp"]
    S_p = np.concatenate([S, np.tile(np.eye(4), (Kp - K, 1, 1))]) \
        .astype(np.float32) if Kp > K else S
    fx = np.concatenate([fixed, np.ones(Kp - K, bool)]) if Kp > K else fixed
    with mesh:
        txt = jax.jit(run).lower(jnp.asarray(S_p), jnp.asarray(fx)).as_text()
    colls = hlo_collectives(txt)
    halo = part["H"]
    return dict(
        partition_halo=int(halo),
        model_halo_bytes=int(n_dev * halo * 7 * BYTES),
        hlo_ops={op: dict(
            n=len([c for c in colls if c["op"] == op]),
            bytes=[c["bytes"] for c in colls if c["op"] == op])
            for op in ("all_reduce", "all_gather", "all_to_all")},
        note="per-op payloads as compiled; CG-loop collectives appear "
             "once in the lowered text (while-loop body)")


def main():
    edge_rate = measure_pgo_edge_rate()
    backend = "unknown"
    try:
        import jax
        backend = jax.devices()[0].device_kind
    except Exception:
        pass
    out = dict(
        model="projected (no multi-host hardware in this environment; "
              "virtual-device timings measure partitioning overhead only)",
        assumptions=dict(
            ici_bw_gbps=ICI_BW / 1e9, ici_lat_us=ICI_LAT * 1e6,
            dcn_bw_gbps=DCN_BW / 1e9, dcn_lat_us=DCN_LAT * 1e6,
            chips_per_host=4,
            ba_gn_ms_single_chip=T_BA_GN_MS,
            ba_gn_iters_per_kf=N_GN_PER_KF,
            pgo_edge_rate_measured_on=backend,
            pgo_edges_per_s_single=round(edge_rate),
            allreduce_model="ring: 2*S*(n-1)/n/BW + 2*n*lat",
        ),
        ba=ba_projection([1, 2, 4]),
        pgo_block=pgo_projection([1, 2, 4], edge_rate=edge_rate),
        # VERDICT r4 #10: the model's counted payloads cross-checked
        # against the COMPILED programs' collective ops (lowered
        # StableHLO carries exact communicated tensor types)
        hlo_crosscheck=dict(ba=crosscheck_ba_psum(),
                            pgo_block=crosscheck_block_pgo()),
        conclusion=(
            "BA: the per-GN psum is 28.9 KB (D=84) — at 2 hosts the DCN "
            "all-reduce costs ~41 us against ~725 us of per-chip "
            "compute: projected efficiency 93.6% at 2 hosts, 80.1% at 4 "
            "(target >=70% at >=2 hosts). PGO: the block-partitioned "
            "halo exchange moves n*H*7 floats per CG iteration instead "
            "of the replicated K*7 (14 KB vs 115 KB at K=4096, n=8, "
            "H=64): 86.5% at 2 hosts; at 4 hosts the TPU-measured edge "
            "rate (456k edges/s) makes per-chip compute so small that "
            "DCN latency dominates and efficiency falls to ~63% — PGO "
            "past 2 hosts only pays at larger K or with CG batching."),
    )
    assert out["hlo_crosscheck"]["ba"]["match"], \
        "BA psum payload in compiled HLO does not match the counted model"
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "SCALING_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["ba"], indent=1))
    print(json.dumps(out["pgo_block"], indent=1))
    print(json.dumps(out["hlo_crosscheck"]["ba"], indent=1,
                     default=str)[:800])
    print("wrote", path)


if __name__ == "__main__":
    main()
