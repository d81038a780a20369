"""Honest-timing helpers (utils/timing.py) sanity on the CPU backend."""
import time

import jax.numpy as jnp
import numpy as np

from pytorch_kaldi_cgs_tpu.utils.timing import (chained_step_time,
                                                device_loop_time, sync_value)


def test_sync_value_scalar_and_array():
    assert sync_value(jnp.float32(3.0)) == 3.0
    assert sync_value(jnp.ones((4, 4))) == 16.0


def test_device_loop_time_positive_and_sane():
    w = jnp.eye(64) * 0.5
    t = device_loop_time(lambda c: c @ w, jnp.ones((64, 64)), n_lo=2, n_hi=12,
                         repeats=2)
    assert t > 0
    assert t < 1.0  # a 64x64 matmul is not a second


def test_chained_step_time_measures_real_work():
    import jax

    @jax.jit
    def step(x, key):
        return x @ x * 1e-3 + 1.0

    x = jnp.ones((256, 256))
    t = chained_step_time(
        step, (x, 0),
        chain=lambda cur, out, i: (out, i),
        readback=lambda out: out[0, 0], n_lo=1, n_hi=6, repeats=2)
    assert t > 0
