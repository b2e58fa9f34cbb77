"""Verified-edge reach diagnostic (VERDICT r3 next #9 done-criterion).

Reads a ladder cache's matches.npz and reports the |i-j| image-index reach
distribution of VERIFIED edges — the quantity whose collapse (p99.9 = 7 at
10k images, NOTES.md root cause #3) bent the 10k model. Capture order is
ring order in the ladder scenes, so index distance is angular distance.

    python benchmarks/reach_diag.py benchmarks/.ladder_cache_10000_256_vocab_tree
"""

import json
import sys

import numpy as np


def reach_stats(cache_dir: str) -> dict:
    d = np.load(f"{cache_dir}/matches.npz", allow_pickle=True)
    pairs = np.asarray(d["pairs"])
    ok = np.asarray(d["ok"]).astype(bool)
    # Ladder scenes at arc_fraction=1 are CLOSED rings: image 0 and image
    # n-1 are physical neighbors, so reach is ring distance, not |i-j|.
    n = int(pairs.max()) + 1
    raw = np.abs(pairs[:, 0] - pairs[:, 1])
    reach = np.minimum(raw, n - raw)
    v = reach[ok]
    stats = {
        "edges_total": int(len(pairs)),
        "edges_verified": int(ok.sum()),
        "reach_p50": float(np.percentile(v, 50)) if len(v) else 0.0,
        "reach_p90": float(np.percentile(v, 90)) if len(v) else 0.0,
        "reach_p99": float(np.percentile(v, 99)) if len(v) else 0.0,
        "reach_p999": float(np.percentile(v, 99.9)) if len(v) else 0.0,
        "reach_max": int(v.max()) if len(v) else 0,
    }
    return stats


if __name__ == "__main__":
    print(json.dumps(reach_stats(sys.argv[1]), indent=2))
