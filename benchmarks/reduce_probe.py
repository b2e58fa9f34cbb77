"""Microbench: segment-reduce layouts for the BA point/camera reductions.

The CG matvec's point reduce is cumsum([O, k]) + bounds gather; [O, k<128]
lane-pads k -> 128 on TPU, so the cumsum touches up to 21x more HBM than the
real data. Candidates measured here at BA-realistic shapes:

  a) cumsum2d:   jnp.cumsum([O, k], axis=0)             (current)
  b) per-row 1d: k separate jnp.cumsum([O]) columns
  c) two-level:  reshape [O] -> [O/128, 128], lane cumsum + row-offset fix

    python benchmarks/reduce_probe.py [O] [k]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    O = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    P = 8192
    bounds = np.sort(np.random.default_rng(0).integers(0, O, P + 1))
    bounds[0], bounds[-1] = 0, O
    bounds = jnp.asarray(bounds.astype(np.int32))

    @jax.jit
    def red_cumsum2d(v):                       # current production path
        cs = jnp.concatenate([jnp.zeros_like(v[:1]), jnp.cumsum(v, axis=0)], axis=0)
        return cs[bounds[1:]] - cs[bounds[:-1]]

    @jax.jit
    def red_perrow(v):
        outs = []
        for c in range(v.shape[1]):
            cs = jnp.concatenate([jnp.zeros(1, v.dtype), jnp.cumsum(v[:, c])])
            outs.append(cs[bounds[1:]] - cs[bounds[:-1]])
        return jnp.stack(outs, axis=1)

    @jax.jit
    def red_twolevel(v):
        outs = []
        L = 512
        for c in range(v.shape[1]):
            x2 = v[:, c].reshape(-1, L)
            within = jnp.cumsum(x2, axis=1)
            row_off = jnp.concatenate([jnp.zeros(1, v.dtype),
                                       jnp.cumsum(within[:, -1])[:-1]])
            cs_full = (within + row_off[:, None]).reshape(-1)
            cs = jnp.concatenate([jnp.zeros(1, v.dtype), cs_full])
            outs.append(cs[bounds[1:]] - cs[bounds[:-1]])
        return jnp.stack(outs, axis=1)

    def timeit(name, fn):
        mk = jax.jit(lambda s: jax.random.normal(jax.random.PRNGKey(s), (O, k), jnp.float32))
        w = np.asarray(fn(mk(0)))  # compile
        reps = 8
        vs = [mk(i + 1) for i in range(reps)]
        jax.block_until_ready(vs)
        t0 = time.perf_counter()
        for v in vs:
            r = fn(v)
        jax.block_until_ready(r)
        _ = np.asarray(r[0, 0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt * 1e3:.2f} ms/call")
        return fn(vs[0])

    a = timeit("cumsum2d ", red_cumsum2d)
    b = timeit("per-row1d", red_perrow)
    c = timeit("two-level", red_twolevel)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-2)
    print("all equal")


if __name__ == "__main__":
    main()
