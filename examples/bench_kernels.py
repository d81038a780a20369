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
from pytorch_kaldi_cgs_tpu.utils.timing import (chained_step_time,
                                                 device_loop_time)

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
    # chaining MUST consume every output element (a row-sum broadcast
    # back onto the carry): slicing y lets XLA dead-code-eliminate the
    # unused columns of the XLA matmul while the opaque Pallas kernel
    # still does full work — measured 0.034 ms "dense" (= 5000 TFLOP/s,
    # 31x over f32 peak) before this fix.
    if fwd_bwd in ("dx", "dw"):
        # isolate one backward kernel vs its dense-matmul equivalent
        gy = jax.random.normal(jax.random.fold_in(key, 99),
                               (M, layout.Nb * G * BSIZE), jnp.float32)
        bound = max(8, (1024 * 1024 // layout.K) // 8 * 8)
        tile_bwd = 8
        t = 8
        while t <= min(M, bound):
            if M % t == 0:
                tile_bwd = t
            t += 8
        _, dxk, dwk = BS._build_v3_ops(layout, G, tile_bwd, False)
        if fwd_bwd == "dx":
            def dense_body(c):
                y = jnp.dot(c, w_cat.T, preferred_element_type=jnp.float32)
                return c + jnp.sum(y, axis=1, keepdims=True) * 1e-9

            def v3_body(c):
                y = dxk(c, w3, jnp.float32)          # (M, K)
                return c + jnp.sum(y, axis=1, keepdims=True) * 1e-9
        else:
            def dense_body(c):
                dw = jnp.dot(c.T, x, preferred_element_type=jnp.float32)
                return c + jnp.sum(dw) * jnp.asarray(1e-12, jnp.float32)

            def v3_body(c):
                dw = dwk(c, x, jnp.float32)
                return c + jnp.sum(dw) * jnp.asarray(1e-12, jnp.float32)
        for name, f in (("dense", dense_body), ("v3", v3_body)):
            try:
                results[name] = device_loop_time(f, gy, n_lo=5, n_hi=35)
            except Exception as e:
                results[name] = None
                print("  %s FAILED: %s" % (name, str(e)[:200]))
        return results
    if not fwd_bwd:
        def dense_body(c):
            y = dense_fwd(c)                       # (M, 4N)
            upd = jnp.sum(y, axis=1, keepdims=True)
            return c + (upd * 1e-9).astype(dtype)

        def v3_body(c):
            ys = v3_fwd(c)                         # (G, M, N)
            upd = jnp.sum(ys, axis=(0, 2))[:, None]
            return c + (upd * 1e-9).astype(dtype)

        cases = (("dense", dense_body), ("v3", v3_body))
    else:
        gy = jax.random.normal(jax.random.fold_in(key, 99),
                               (G, M, N), jnp.float32).astype(dtype)
        gy_d = gy.transpose(1, 0, 2).reshape(M, G * N)

        def dense_step(c):
            def loss(x, w):
                # quadratic: grads need y, so fwd+dx+dw all execute
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                return 0.5 * jnp.sum((y - gy_d) ** 2)
            dx, dw = jax.grad(loss, argnums=(0, 1))(c, w_cat)
            # consume dw with a nonzero coefficient: *0 lets XLA DCE the
            # whole dw matmul
            return c + (dx * 1e-6 +
                        jnp.sum(dw) * jnp.asarray(1e-12, jnp.float32)
                        ).astype(dtype)

        def v3_step(c):
            def loss(x, w3_):
                y = BS.block_sparse_matmul_v3(
                    x, w3_, w3csc, layout, G, tile_m=256)
                return 0.5 * jnp.sum((y - gy) ** 2)
            dx, dw3 = jax.grad(loss, argnums=(0, 1))(c, w3)
            return c + (dx * 1e-6 +
                        jnp.sum(dw3) * jnp.asarray(1e-12, jnp.float32)
                        ).astype(dtype)

        cases = (("dense", dense_step), ("v3", v3_step))

    for name, f in cases:
        try:
            if fwd_bwd:
                # composite step (grad of custom-vjp pallas): fori_loop
                # wrapping changes XLA's schedule AND doubles the compile
                # count — chain real dispatches instead (timing.py rules)
                step = jax.jit(f)
                t = chained_step_time(step, (x,),
                                      chain=lambda args, out, i: (out,),
                                      readback=lambda out: out[0, :8],
                                      n_lo=3, n_hi=18, repeats=2)
            else:
                t = device_loop_time(f, x, n_lo=5, n_hi=55)
            results[name] = t
        except Exception as e:
            results[name] = None
            print("  %s FAILED: %s" % (name, str(e)[:200]))
    return results


def main():
    # each arg is one design point "W,drop,mode[,dtype]" with mode in
    # {fwd, fb}; e.g.  python examples/bench_kernels.py 2048,75,fb
    # (one point per process: Pallas+grad compiles through the tunnel
    # dominate, a full sweep cannot fit one driver timeout)
    points = sys.argv[1:] or ["1024,75,fwd"]
    M = 5120
    print("chip:", jax.devices()[0].device_kind, flush=True)
    for p in points:
        parts = p.split(",")
        W, drop, mode = int(parts[0]), float(parts[1]), parts[2]
        dtype = jnp.bfloat16 if (len(parts) > 3 and parts[3] == "bf16") \
            else jnp.float32
        fb = mode if mode in ("dx", "dw") else (mode == "fb")
        r = bench_point(W, W, M, drop, fb, dtype=dtype)
        d, v = r.get("dense"), r.get("v3")
        tag = "%4d drop%5.1f%% %s %s" % (W, drop, mode,
                                         jnp.dtype(dtype).name)
        if d and v:
            print("%s: dense %7.3f ms | v3 %7.3f ms | speedup %.2fx"
                  % (tag, d * 1e3, v * 1e3, d / v), flush=True)
        else:
            print("%s: dense %s ms | v3 %s ms" % (
                tag, "%.3f" % (d * 1e3) if d else None,
                "%.3f" % (v * 1e3) if v else None), flush=True)


if __name__ == "__main__":
    main()
