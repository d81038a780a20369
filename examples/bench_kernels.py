"""Honest block-sparse vs dense kernel benchmark (real chip).

Compares, at the cfg/record.md HCGS design points, the time of the
4-gate input projection (the LSTM's MXU-heavy op):

  dense : one (M,K)@(K,4N) XLA einsum over masked weights (what the
          reference semantically does, neural_networks.py:853-896)
  v3    : Pallas deep-contraction kernels (ops/block_sparse.py)

Timing via utils/timing.device_loop_time (on-device fori_loop,
differenced windows, value-readback sync). All data generated
on-device. Run: python examples/bench_kernels.py [width ...]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_kaldi_cgs_tpu.ops import block_sparse as BS
from pytorch_kaldi_cgs_tpu.sparsity.hcgs import hcgs_mask
from pytorch_kaldi_cgs_tpu.utils.timing import device_loop_time

G = 4
BSIZE = 128


def bench_point(K, N, M, drop_pct, fwd_bwd: bool, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    mask = hcgs_mask(N, K, [BSIZE], [drop_pct], rng=rng)
    layout = BS.pack_layout(np.asarray(mask), BSIZE)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.float32).astype(dtype)
    ws = [jax.random.normal(jax.random.fold_in(key, g), (N, K),
                            jnp.float32) * np.asarray(mask)
          for g in range(G)]
    w_cat = jnp.concatenate([w.T for w in ws], axis=1).astype(dtype)  # (K,4N)
    w3, w3csc = BS.gather_v3([w.astype(dtype) for w in ws], layout)

    def dense_fwd(x):
        return jnp.dot(x, w_cat, preferred_element_type=jnp.float32)

    def v3_fwd(x):
        return BS.block_sparse_matmul_v3(x, w3, w3csc, layout, G,
                                         tile_m=256)

    results = {}
    if not fwd_bwd:
        for name, f in (("dense", dense_fwd), ("v3", v3_fwd)):
            def body(c, f=f):
                y = f(c)
                # fold output back into input to chain (cheap slice+cast)
                upd = y.reshape(-1)[:K].astype(dtype) * 1e-6
                return c + upd[None, :]
            try:
                t = device_loop_time(body, x, n_lo=5, n_hi=55)
                results[name] = t
            except Exception as e:
                results[name] = None
                print("  %s FAILED: %s" % (name, str(e)[:200]))
    else:
        gy = jax.random.normal(jax.random.fold_in(key, 99),
                               (G, M, N), jnp.float32).astype(dtype)
        gy_d = gy.transpose(1, 0, 2).reshape(M, G * N)

        def dense_step(c):
            def loss(x, w):
                return jnp.sum(jnp.dot(x, w, preferred_element_type=jnp.float32) * gy_d)
            dx, dw = jax.grad(loss, argnums=(0, 1))(c, w_cat)
            return c + dx * 1e-6 + jnp.sum(dw).astype(dtype) * 0

        def v3_step(c):
            def loss(x, w3_):
                return jnp.sum(BS.block_sparse_matmul_v3(
                    x, w3_, w3csc, layout, G, tile_m=256) * gy)
            dx, dw3 = jax.grad(loss, argnums=(0, 1))(c, w3)
            return c + dx * 1e-6 + jnp.sum(dw3).astype(dtype) * 0

        for name, f in (("dense", dense_step), ("v3", v3_step)):
            try:
                t = device_loop_time(f, x, n_lo=5, n_hi=55)
                results[name] = t
            except Exception as e:
                results[name] = None
                print("  %s FAILED: %s" % (name, str(e)[:200]))
    return results


def main():
    widths = [int(a) for a in sys.argv[1:]] or [1024, 2048]
    M = 5120
    print("chip:", jax.devices()[0].device_kind)
    for W in widths:
        for drop in (50.0, 75.0, 87.5):
            for fwd_bwd in (False, True):
                r = bench_point(W, W, M, drop, fwd_bwd)
                d, v = r.get("dense"), r.get("v3")
                tag = "%4d drop%5.1f%% %s" % (W, drop,
                                              "fwd+bwd" if fwd_bwd else "fwd    ")
                if d and v:
                    print("%s: dense %7.3f ms | v3 %7.3f ms | speedup %.2fx"
                          % (tag, d * 1e3, v * 1e3, d / v), flush=True)
                else:
                    print("%s: dense %s v3 %s" % (tag, d, v), flush=True)


if __name__ == "__main__":
    main()
