"""Benchmark harness — runs on the real TPU chip (default backend).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (VERDICT r3 weak #4): DEVICE-RESIDENT end-to-end pairs/sec —
a synthetic scene rendered on device, then features -> match -> RANSAC-E
verify chained on device with only the final edge verdicts host-forced. This
is the number that is actually stable on this machine: every tunnel-inclusive
measurement inherits the sim's 50x host<->device link weather (NOTES.md
gotcha 8). vs_baseline compares against the OpenCV CPU pipeline (SIFT +
BFMatcher + findEssentialMat) on the identical images in the same process.

Secondary metrics (matcher-only pairs/sec, BA LM iterations/sec, feature
extraction throughput) are recorded to benchmarks/latest.json.

Stability methodology (VERDICT r3 next #6): every metric is the MEDIAN of
>=5 repetitions, and each repetition is ONE device dispatch chain with one
final host sync — per-block host round-trips made earlier numbers vary
±15% run-to-run on link latency alone. The per-rep rates and their spread
are recorded in latest.json so drift is visible, not just suspected.

Timing methodology: the axon runtime memoizes identical (executable, inputs)
calls and pipelines dispatch through block_until_ready, so every timed rep
uses fresh seed-derived inputs and results are forced to host (np.asarray)
before the clock stops.
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import time

import numpy as np

# Persistent XLA compile cache: bench re-runs retrace identical shapes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

# First measured numbers on the Axon v5e sim (2026-08-16), with the jnp
# reference matcher and host-forced timing — see BASELINE.md "Measured".
# Used only as a fallback denominator when OpenCV is unavailable.
_BASELINE_NUMBERS = {
    "pairs_per_sec_per_chip": 87.0,   # jnp matcher, host-forced
    "ba_lm_iters_per_sec": 10.7,      # round-1 final (C=128, P=16k, O=131k, 16 CG)
    "features_imgs_per_sec": 0.92,    # round-1 start (pre-kernel), 1024^2
}

# Production-ish shapes.
_MATCH_P, _MATCH_N = 16, 4096         # pairs per block, keypoints per image
_BA_CAMS, _BA_PTS, _BA_OBS_PER = 128, 16384, 8
_FEAT_B, _FEAT_S = 4, 1024
_REPS = int(os.environ.get("SFM_TPU_BENCH_REPS", "5"))


def _median_rate(work_per_rep: float, rep_fn, reps: int = _REPS):
    """Median rate over `reps` timed repetitions (rep i gets a fresh seed).

    Returns (median_rate, per_rep_rates). rep_fn(seed) must end with a host
    force of a SMALL result so one rep = one pipeline of device work + one
    sync, not a round-trip per sub-step.
    """
    rates = []
    for r in range(reps):
        t0 = time.perf_counter()
        rep_fn(r + 1)
        rates.append(work_per_rep / (time.perf_counter() - t0))
    return statistics.median(rates), rates


def bench_matching():
    """Matcher-only throughput: fused bf16 Gram + top-2 ratio + mutual check.

    All blocks of a rep run inside ONE jitted scan (device-generated inputs,
    single [n_blocks] verdict fetch), so a rep costs one tunnel round-trip.
    """
    import jax
    import jax.numpy as jnp
    from sfm_tpu.config import MatchConfig
    from sfm_tpu.ops.match import match_block

    cfg = MatchConfig(max_matches=1024)
    n_blocks = 6
    v = jnp.ones((_MATCH_P, _MATCH_N), dtype=bool)

    @jax.jit
    def run_rep(seed):
        def body(_, i):
            d = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(seed), i),
                                  (2, _MATCH_P, _MATCH_N, 128), jnp.float32)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            out = match_block(d[0], v, d[1], v, cfg)
            return None, jnp.sum(out.valid)
        _, counts = jax.lax.scan(body, None, jnp.arange(n_blocks))
        return counts

    _ = np.asarray(run_rep(0))          # compile + warm
    return _median_rate(_MATCH_P * n_blocks,
                        lambda s: np.asarray(run_rep(1000 + s)))


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
    from sfm_tpu.config import BAConfig
    from sfm_tpu.ba.core import bundle_adjust

    # Fixed iteration count (no convergence exit) for a clean iters/sec
    # number. Each rep uses a fresh problem (memoization, see module doc);
    # bundle_adjust is one on-device while_loop = one dispatch per rep.
    cfg = BAConfig(max_iterations=20, cg_iterations=16, function_tolerance=0.0, robust_loss="huber")
    out, _ = bundle_adjust(_make_ba_problem(0), cfg)     # compile + warm
    _ = np.asarray(out.cam_params)

    def rep(seed):
        out, stats = bundle_adjust(_make_ba_problem(seed), cfg)
        _ = np.asarray(out.cam_params)

    return _median_rate(cfg.max_iterations, rep)


def bench_features():
    import jax
    import jax.numpy as jnp
    from sfm_tpu.config import SiftConfig
    from sfm_tpu.ops.sift import extract_features

    cfg = SiftConfig(image_max_dim=_FEAT_S)
    hw = jnp.asarray(np.tile([[_FEAT_S, _FEAT_S]], (_FEAT_B, 1)).astype(np.int32))

    @jax.jit
    def run_rep(seed):
        imgs = jax.random.uniform(jax.random.PRNGKey(seed),
                                  (_FEAT_B, _FEAT_S, _FEAT_S), jnp.float32)
        f = extract_features(imgs, cfg, hw)
        return jnp.sum(f.valid)

    _ = np.asarray(run_rep(0))          # compile + warm
    return _median_rate(_FEAT_B, lambda s: np.asarray(run_rep(2000 + s)))


def _e2e_scene():
    """Shared device-resident scene setup for the e2e bench + its oracle."""
    import jax
    import jax.numpy as jnp

    B, S, K = 8, 512, 160

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

    return B, S, render


def bench_e2e_device():
    """Device-resident end-to-end pipeline slice (the HEADLINE): renders a
    synthetic blob scene ON DEVICE (separable-Gaussian splat = one [S,K]@[K,S]
    matmul per image), then runs features -> match -> verify chained on
    device, host-forcing only the final edge verdicts. Isolates chip compute
    from the host<->device tunnel, whose throughput varies 50x run-to-run
    (NOTES.md gotcha 8) and dominates every tunnel-inclusive ratio.

    Returns ((imgs/s median, rates), (pairs/s median, rates), n_pairs).
    """
    import jax
    import jax.numpy as jnp
    from sfm_tpu.config import SiftConfig, MatchConfig, RansacConfig
    from sfm_tpu.ops.sift import extract_features
    from sfm_tpu.ops.match import match_block
    from sfm_tpu.ops.verify import verify_block

    B, S, render = _e2e_scene()
    sift_cfg = SiftConfig(image_max_dim=S, max_keypoints=512, max_candidates=2048)
    match_cfg = MatchConfig(max_matches=256)
    ransac_cfg = RansacConfig(num_hypotheses=512, min_inliers=12)

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

    def rep(seed):
        ok, ninl = run(seed)
        _ = np.asarray(ok), np.asarray(ninl)   # host-force ONLY the verdicts

    med_pairs, rates = _median_rate(n_pairs, rep)
    med_imgs = med_pairs * B / n_pairs
    img_rates = [r * B / n_pairs for r in rates]
    return (med_imgs, img_rates), (med_pairs, rates), n_pairs


def bench_e2e_oracle():
    """OpenCV CPU pipeline on the SAME images as bench_e2e_device: SIFT
    detect+compute per image, then BF ratio match + findEssentialMat per
    pair — the standing CPU stand-in for the reference pipeline (SURVEY
    §4.3). Returns pairs/sec (feature cost amortized over the pair count,
    exactly as the device number amortizes its feature stage)."""
    import cv2

    B, S, render = _e2e_scene()
    imgs = (np.asarray(render(1)) * 255).clip(0, 255).astype(np.uint8)
    sift = cv2.SIFT_create(nfeatures=512)
    bf = cv2.BFMatcher(cv2.NORM_L2)
    ii, jj = np.triu_indices(B, k=1)
    K = np.array([[S * 1.2, 0, S / 2], [0, S * 1.2, S / 2], [0, 0, 1]])

    t0 = time.perf_counter()
    kps, descs = [], []
    for b in range(B):
        kp, de = sift.detectAndCompute(imgs[b], None)
        kps.append(kp), descs.append(de)
    for i, j in zip(ii, jj):
        if descs[i] is None or descs[j] is None or len(kps[i]) < 8 or len(kps[j]) < 8:
            continue
        mm = bf.knnMatch(descs[i], descs[j], k=2)
        good = [m for m, n in mm if m.distance < 0.8 * n.distance]
        if len(good) >= 8:
            p1 = np.float32([kps[i][m.queryIdx].pt for m in good])
            p2 = np.float32([kps[j][m.trainIdx].pt for m in good])
            cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC,
                                 prob=0.999, threshold=2.0)
    dt = time.perf_counter() - t0
    return len(ii) / dt


def main():
    import jax

    (e2e_imgs, e2e_img_rates), (e2e_pairs, e2e_pair_rates), _ = bench_e2e_device()
    match_med, match_rates = bench_matching()
    ba_med, ba_rates = bench_ba()
    feat_med, feat_rates = bench_features()

    def spread(rates):
        return round(max(rates) / max(min(rates), 1e-9) - 1.0, 4)

    results = {
        "e2e_device_pairs_per_sec": e2e_pairs,
        "e2e_device_imgs_per_sec": e2e_imgs,
        "pairs_per_sec_per_chip": match_med,
        "ba_lm_iters_per_sec": ba_med,
        "features_imgs_per_sec": feat_med,
        "reps": {
            "e2e_device_pairs_per_sec": e2e_pair_rates,
            "pairs_per_sec_per_chip": match_rates,
            "ba_lm_iters_per_sec": ba_rates,
            "features_imgs_per_sec": feat_rates,
        },
        "spread": {
            "e2e_device_pairs_per_sec": spread(e2e_pair_rates),
            "pairs_per_sec_per_chip": spread(match_rates),
            "ba_lm_iters_per_sec": spread(ba_rates),
            "features_imgs_per_sec": spread(feat_rates),
        },
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }

    # External comparators (VERDICT r2 weak #5): OpenCV CPU, same process,
    # same machine. e2e pipeline on identical images for the headline;
    # matcher-only on the identical descriptor workload as a secondary.
    unit = ("image_pairs/s, device-resident e2e features+match+RANSAC-E "
            "(8 imgs @512^2, 28 pairs, median of %d); vs OpenCV CPU pipeline "
            "on identical images" % _REPS)
    try:
        base = bench_e2e_oracle()
        results["opencv_cpu_e2e_pairs_per_sec"] = base
        rng = np.random.default_rng(0)
        mk = lambda: np.ascontiguousarray(
            (lambda d: d / np.linalg.norm(d, axis=-1, keepdims=True))(
                rng.normal(size=(4, _MATCH_N, 128)).astype(np.float32)))
        results["opencv_cpu_pairs_per_sec"] = bench_matching_oracle((mk(), mk()))
    except Exception:
        base = _BASELINE_NUMBERS["pairs_per_sec_per_chip"] / 87.0 * 0.19
        unit = ("image_pairs/s, device-resident e2e (8 imgs @512^2, 28 pairs, "
                "median of %d); OpenCV unavailable — vs round-1 CPU estimate" % _REPS)

    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/latest.json", "w") as f:
        json.dump(results, f, indent=2)

    value = results["e2e_device_pairs_per_sec"]
    vs = (value / base) if base else 1.0
    print(json.dumps({
        "metric": "e2e_device_pairs_per_sec",
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
