"""Pallas TPU kernels (SURVEY.md L1): the hand-tuned hot ops.

Each kernel has a jnp reference implementation in sfm_tpu/ops/ and an
equality test in tests/unit/test_kernels.py; kernels run in interpret mode
on CPU (tests) and compiled on TPU. Selection is config-gated
(cfg.*.use_pallas) and falls back to jnp off-TPU.
"""


def on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"
