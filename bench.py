"""Benchmark harness — runs on the real TPU chip (default backend).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): image pairs matched per second per chip —
the fused match stage (bf16 Gram matmul + top-2 ratio + mutual check) at
production shapes. Secondary metrics (BA LM iterations/sec, feature
extraction throughput) are recorded to benchmarks/latest.json.

vs_baseline is the ratio against an EXTERNAL comparator: the OpenCV CPU
matcher (BFMatcher knnMatch + Lowe ratio test) timed on the identical
descriptor workload in this process (VERDICT r2 weak #5 — the previous
denominator was this repo's own round-1 jnp matcher, which measured only
self-improvement). The reference publishes no numbers (BASELINE.json
`published` is empty), so OpenCV is the standing CPU oracle (SURVEY §4.3).
If OpenCV is unavailable, vs_baseline falls back to the round-1 jnp-matcher
denominator and says so in the unit string.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent XLA compile cache: bench re-runs retrace identical shapes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

# First measured numbers on the Axon v5e sim (2026-08-16), with the jnp
# reference matcher and host-forced timing — see BASELINE.md "Measured".
# vs_baseline therefore tracks the speedup of the optimized TPU path over the
# framework's own reference implementation (the reference repo publishes no
# numbers; BASELINE.json `published` is empty).
#
# Timing methodology: the axon runtime memoizes identical (executable,
# inputs) pairs AND reports dispatch-pipelined completion through
# block_until_ready, so every timed call uses fresh inputs and results are
# forced to host before the clock stops.
_BASELINE_NUMBERS = {
    "pairs_per_sec_per_chip": 87.0,   # jnp matcher, host-forced
    "ba_lm_iters_per_sec": 10.7,      # round-1 final (C=128, P=16k, O=131k, 16 CG)
    "features_imgs_per_sec": 0.92,    # round-1 start (pre-kernel), 1024^2
}

# Production-ish shapes.
_MATCH_P, _MATCH_N = 16, 4096         # pairs per block, keypoints per image
_BA_CAMS, _BA_PTS, _BA_OBS_PER = 128, 16384, 8
_FEAT_B, _FEAT_S = 4, 1024


def bench_matching():
    import jax
    import jax.numpy as jnp
    from sfm_tpu.config import MatchConfig
    from sfm_tpu.ops.match import match_block

    cfg = MatchConfig(max_matches=1024)

    # Distinct blocks per timed call (the axon runtime memoizes identical
    # (executable, inputs) calls, so repeating one block times nothing),
    # GENERATED ON DEVICE from a seed scalar: shipping ~200MB of host-staged
    # descriptors is minutes when the host<->device tunnel degrades, and the
    # chip-throughput number must not depend on link weather.
    gen = jax.jit(lambda seed: tuple(
        d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        for d in jax.random.normal(
            jax.random.PRNGKey(seed), (2, _MATCH_P, _MATCH_N, 128), jnp.float32)
    ))
    n_blocks = 6
    warm = gen(0)
    blocks = [gen(i + 1) for i in range(n_blocks)]
    jax.block_until_ready(blocks)
    v = jnp.ones((_MATCH_P, _MATCH_N), dtype=bool)
    out = match_block(warm[0], v, warm[1], v, cfg)             # compile
    _ = np.asarray(out.valid)
    t0 = time.perf_counter()
    for di, dj in blocks:
        out = match_block(di, v, dj, v, cfg)
        _ = np.asarray(out.valid)   # force host materialization (see above)
    dt = time.perf_counter() - t0
    return (_MATCH_P * n_blocks) / dt


def bench_matching_oracle(blocks_np):
    """OpenCV CPU matcher on the same descriptor workload (pairs/sec).

    One-direction knnMatch(k=2) + Lowe ratio test — the standard OpenCV
    recipe, and strictly LESS work than our match_block (which also runs the
    mutual check), so the ratio does not flatter the TPU path. Times a small
    number of pairs (CPU brute-force 4096x4096x128 is ~seconds/pair) and
    extrapolates linearly — brute-force matching is O(pairs) with no warmup.
    """
    import cv2

    n_time = 3
    di, dj = blocks_np
    bf = cv2.BFMatcher(cv2.NORM_L2)
    # Warm one pair (thread-pool spinup), then time.
    _ = bf.knnMatch(di[0], dj[0], k=2)
    t0 = time.perf_counter()
    for p in range(n_time):
        mm = bf.knnMatch(di[p], dj[p], k=2)
        _ = [m for m, n in mm if m.distance < 0.8 * n.distance]
    dt = time.perf_counter() - t0
    return n_time / dt


def _make_ba_problem(seed: int):
    import jax.numpy as jnp
    from sfm_tpu.ba.problem import BAProblem

    rng = np.random.default_rng(seed)
    C, P = _BA_CAMS, _BA_PTS
    O = P * _BA_OBS_PER
    obs_point = np.repeat(np.arange(P, dtype=np.int32), _BA_OBS_PER)
    obs_cam = rng.integers(0, C, O).astype(np.int32)
    return BAProblem(
        cam_params=jnp.asarray(np.concatenate([rng.normal(0, 0.1, (C, 3)),
                                               rng.normal(0, 1.0, (C, 3)) + [0, 0, 4]], 1).astype(np.float32)),
        intrinsics=jnp.asarray(np.tile([800.0, 800, 512, 384, 0, 0], (C, 1)).astype(np.float32)),
        points=jnp.asarray(rng.uniform(-1, 1, (P, 3)).astype(np.float32)),
        obs_cam=jnp.asarray(obs_cam),
        obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(rng.uniform(0, 1024, (O, 2)).astype(np.float32)),
        obs_w=jnp.ones(O, jnp.float32),
        cam_fixed=jnp.asarray(np.arange(C) == 0),
        point_fixed=jnp.zeros(P, bool),
        # Observations are sorted by point in 8-long segments at 8-aligned
        # offsets, so no segment straddles a 256-multiple boundary.
        point_align=256,
    )


def bench_ba():
    import jax
    from sfm_tpu.config import BAConfig
    from sfm_tpu.ba.core import bundle_adjust

    # Fixed iteration count (no convergence exit) for a clean iters/sec
    # number. The timed call uses DIFFERENT data than the warmup: the axon
    # runtime memoizes identical (executable, inputs) calls, which would make
    # a repeat-same-inputs timing meaningless.
    cfg = BAConfig(max_iterations=20, cg_iterations=16, function_tolerance=0.0, robust_loss="huber")
    out, _ = bundle_adjust(_make_ba_problem(1), cfg)     # compile + warm
    _ = np.asarray(out.cam_params)
    prob = _make_ba_problem(2)
    t0 = time.perf_counter()
    out, stats = bundle_adjust(prob, cfg)
    _ = np.asarray(out.cam_params)   # force host materialization
    dt = time.perf_counter() - t0
    iters = int(stats.iterations)
    return max(iters, 1) / dt


def bench_features():
    import jax
    import jax.numpy as jnp
    from sfm_tpu.config import SiftConfig
    from sfm_tpu.ops.sift import extract_features

    cfg = SiftConfig(image_max_dim=_FEAT_S)
    hw = jnp.asarray(np.tile([[_FEAT_S, _FEAT_S]], (_FEAT_B, 1)).astype(np.int32))

    # Device-generated batches (see bench_matching: fresh inputs without
    # paying host->device transfer on a degraded link).
    mk = jax.jit(lambda seed: jax.random.uniform(
        jax.random.PRNGKey(seed), (_FEAT_B, _FEAT_S, _FEAT_S), jnp.float32))
    reps = 3
    warm = mk(0)
    batches = [mk(i + 1) for i in range(reps)]
    jax.block_until_ready(batches)
    f = extract_features(warm, cfg, hw)            # compile
    _ = np.asarray(f.desc)
    t0 = time.perf_counter()
    for b in batches:
        f = extract_features(b, cfg, hw)
        _ = np.asarray(f.valid)   # force host materialization
    dt = time.perf_counter() - t0
    return (_FEAT_B * reps) / dt


def bench_e2e_device():
    """Device-resident end-to-end comparator (VERDICT r2 item #8): renders a
    synthetic blob scene ON DEVICE (separable-Gaussian splat = one [S,K]@[K,S]
    matmul per image), then runs features -> match -> verify chained on
    device, host-forcing only the final edge verdicts. Isolates chip compute
    from the host<->device tunnel, whose throughput varies 50x run-to-run
    (NOTES.md gotcha 8) and dominates the OpenCV-oracle wall-clock ratio.

    Returns (images_per_sec, pairs_per_sec) for the full pipeline slice.
    """
    import jax
    import jax.numpy as jnp
    from sfm_tpu.config import SiftConfig, MatchConfig, RansacConfig
    from sfm_tpu.ops.sift import extract_features
    from sfm_tpu.ops.match import match_block
    from sfm_tpu.ops.verify import verify_block

    B, S, K = 8, 512, 160
    sift_cfg = SiftConfig(image_max_dim=S, max_keypoints=512, max_candidates=2048)
    match_cfg = MatchConfig(max_matches=256)
    ransac_cfg = RansacConfig(num_hypotheses=512, min_inliers=12)

    @jax.jit
    def render(seed):
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        pts = jax.random.uniform(k1, (K, 3), jnp.float32, -1.5, 1.5)
        # Cameras on an arc looking at the origin (angle-only pose model
        # keeps this a pure-jnp render; geometry fidelity is irrelevant for
        # a throughput bench, feature/match/verify see realistic images).
        ang = jnp.linspace(0.0, 0.5, B)
        f = S * 1.2
        imgs = []
        for b in range(B):
            ca, sa = jnp.cos(ang[b]), jnp.sin(ang[b])
            R = jnp.asarray([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]])
            xc = pts @ R.T + jnp.asarray([0.0, 0.0, 4.0])
            uv = xc[:, :2] / xc[:, 2:3] * f + S / 2
            sig = 2.0 + 3.0 * jax.random.uniform(k2, (K,), jnp.float32)
            grid = jnp.arange(S, dtype=jnp.float32)
            gx = jnp.exp(-((grid[None, :] - uv[:, 0:1]) ** 2) / (2 * sig[:, None] ** 2))
            gy = jnp.exp(-((grid[None, :] - uv[:, 1:2]) ** 2) / (2 * sig[:, None] ** 2))
            imgs.append(jnp.clip(gy.T @ gx, 0.0, 1.0))            # [S,K]@[K,S] on MXU
        return jnp.stack(imgs)

    ii, jj = np.triu_indices(B, k=1)
    n_pairs = len(ii)
    hw = jnp.asarray(np.tile([[S, S]], (B, 1)).astype(np.int32))
    intr = jnp.asarray(np.tile([S * 1.2, S * 1.2, S / 2, S / 2, 0, 0], (n_pairs, 1)).astype(np.float32))
    keys = jax.vmap(jax.random.fold_in, (None, 0))(jax.random.PRNGKey(7), jnp.arange(n_pairs))

    def run(seed):
        canv = render(seed)
        feats = extract_features(canv, sift_cfg, hw)
        di, dj = feats.desc[ii], feats.desc[jj]
        vi, vj = feats.valid[ii], feats.valid[jj]
        pm = match_block(di, vi, dj, vj, match_cfg)
        uv_i = jnp.take_along_axis(feats.xy[ii], pm.idx_i[..., None], axis=1)
        uv_j = jnp.take_along_axis(feats.xy[jj], pm.idx_j[..., None], axis=1)
        geom = verify_block(keys, uv_i, uv_j, pm.valid, intr, intr, ransac_cfg)
        return geom.ok, geom.num_inliers

    ok, _ = run(0)                      # compile + warm
    _ = np.asarray(ok)
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        ok, ninl = run(r + 1)           # fresh seed: no memoized replay
        _ = np.asarray(ok), np.asarray(ninl)   # host-force ONLY the verdicts
    dt = time.perf_counter() - t0
    return (B * reps) / dt, (n_pairs * reps) / dt


def main():
    import jax

    e2e_imgs, e2e_pairs = bench_e2e_device()
    results = {
        "pairs_per_sec_per_chip": bench_matching(),
        "ba_lm_iters_per_sec": bench_ba(),
        "features_imgs_per_sec": bench_features(),
        "e2e_device_imgs_per_sec": e2e_imgs,
        "e2e_device_pairs_per_sec": e2e_pairs,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }

    # External comparator for vs_baseline (VERDICT r2 weak #5): OpenCV CPU
    # matcher on the identical [4096,128]x[4096,128] workload, same process,
    # same machine. Content is irrelevant for brute-force match timing; use
    # host-generated unit-norm descriptors of the same shape.
    unit = "image_pairs/s (N=4096 kp, 128-D, bf16 MXU; vs OpenCV CPU matcher)"
    try:
        rng = np.random.default_rng(0)
        mk = lambda: np.ascontiguousarray(
            (lambda d: d / np.linalg.norm(d, axis=-1, keepdims=True))(
                rng.normal(size=(4, _MATCH_N, 128)).astype(np.float32)))
        oracle_pairs_per_sec = bench_matching_oracle((mk(), mk()))
        results["opencv_cpu_pairs_per_sec"] = oracle_pairs_per_sec
        base = oracle_pairs_per_sec
    except Exception:
        base = _BASELINE_NUMBERS["pairs_per_sec_per_chip"]
        unit = "image_pairs/s (N=4096 kp, 128-D, bf16 MXU; vs round-1 jnp matcher — OpenCV unavailable)"

    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/latest.json", "w") as f:
        json.dump(results, f, indent=2)

    value = results["pairs_per_sec_per_chip"]
    vs = (value / base) if base else 1.0
    print(json.dumps({
        "metric": "pairs_per_sec_per_chip",
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
