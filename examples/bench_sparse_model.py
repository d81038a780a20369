"""Model-level block-sparse vs dense-masked comparison (real chip).

Times the FULL jitted train step (fwd+bwd+RMSprop) of a wide HCGS LSTM
— the record.md compression regime at LibriSpeech-class width — with
the block-sparse projection path ON (auto) vs OFF (the reference's
dense masked-matmul semantics, neural_networks.py:853-896).

Run: python examples/bench_sparse_model.py [hidden] [drop_l1]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_kaldi_cgs_tpu.utils.timing import chained_step_time


def build_mlp(hidden, drop_l1, block_sparse, N=4096, feat=2048, layers=4):
    """4x<hidden> HCGS MLP: every layer is a sparse matmul — the pure
    projection regime (record.md 16x LSTM+MLP configs compress the MLP
    too)."""
    import optax
    from pytorch_kaldi_cgs_tpu.models import MLP
    from pytorch_kaldi_cgs_tpu.runtime.optim import make_optimizer

    opts = {
        "to_do": "train", "arch_name": "bench", "out_folder": "/tmp",
        "dnn_lay": ",".join([str(hidden)] * layers),
        "dnn_drop": ",".join(["0.0"] * layers),
        "dnn_use_batchnorm": ",".join(["False"] * layers),
        "dnn_use_laynorm": ",".join(["False"] * layers),
        "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
        "dnn_act": ",".join(["relu"] * layers),
        "mlp_hcgs": "True",
        "hcgs_block": "128,4", "hcgs_sparse": "%s,50" % drop_l1,
        "mlp_quant": "False", "param_quant": "8",
        "mlp_quant_inp": "False", "inp_quant": "16",
        "mlp_prune": "False", "mlp_prune_perc": "0",
        "skip_regularization": "True", "guided_hcgs": "False",
        "apply_guided_hcgs": "False",
        "mlp_block_sparse": "True" if block_sparse else "False",
    }
    mlp = MLP(opts, feat)
    variables = mlp.init(0)
    mlp.prepare_block_sparse(variables)
    if hasattr(mlp, "pack_variables"):
        variables = mlp.pack_variables(variables)
    tx = make_optimizer({"arch_opt": "sgd", "arch_lr": "0.01",
                         "opt_momentum": "0", "opt_weight_decay": "0",
                         "opt_dampening": "0", "opt_nesterov": "False"})
    opt_state = tx.init(variables["params"])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, feat), jnp.float32)
    tgt = jnp.asarray(rng.randn(N, hidden) * 0.1, jnp.float32)

    @jax.jit
    def step(variables, opt_state, x, key):
        def loss_fn(params):
            v = {**variables, "params": params}
            y, st = mlp.apply(v, x, train=True, rng=key)
            return jnp.mean((y - tgt) ** 2), st

        (loss, st), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        import optax as _o
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        new_params = _o.apply_updates(variables["params"], updates)
        return ({"params": new_params, "state": st,
                 "masks": variables["masks"]}, opt_state, loss)

    return step, (variables, opt_state, x), N


def build(hidden, drop_l1, block_sparse, T=96, B=32, feat=512):
    import optax
    from pytorch_kaldi_cgs_tpu.models import LSTM
    from pytorch_kaldi_cgs_tpu.runtime.optim import make_optimizer

    opts = {
        "to_do": "train", "arch_name": "bench", "out_folder": "/tmp",
        "lstm_lay": str(hidden), "lstm_drop": "0.0",
        "lstm_use_batchnorm": "True", "lstm_use_laynorm": "False",
        "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
        "lstm_act": "tanh", "lstm_orthinit": "True", "lstm_bidir": "False",
        "lstm_hcgs": "True",
        "hcgsx_block": "128,4", "hcgsx_sparse": "%s,50" % drop_l1,
        "hcgsh_block": "128,4", "hcgsh_sparse": "%s,50" % drop_l1,
        "lstm_quant": "False", "param_quant": "8",
        "lstm_quant_inp": "False", "inp_quant": "16",
        "lstm_prune": "False", "lstm_prune_perc": "0",
        "skip_regularization": "True", "guided_hcgs": "False",
        "apply_guided_hcgs": "False",
        "lstm_block_sparse": "True" if block_sparse else "False",
    }
    lstm = LSTM(opts, feat)
    variables = lstm.init(0)
    lstm.prepare_block_sparse(variables)
    if hasattr(lstm, "pack_variables"):
        variables = lstm.pack_variables(variables)
    tx = make_optimizer({"arch_opt": "rmsprop", "arch_lr": "0.0016",
                         "opt_momentum": "0", "opt_alpha": "0.95",
                         "opt_eps": "1e-8", "opt_centered": "False",
                         "opt_weight_decay": "0"})
    opt_state = tx.init(variables["params"])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(T, B, feat), jnp.float32)
    tgt = jnp.asarray(rng.randn(T, B, hidden) * 0.1, jnp.float32)

    @jax.jit
    def step(variables, opt_state, x, key):
        def loss_fn(params):
            v = {**variables, "params": params}
            h, st = lstm.apply(v, x, train=True, rng=key)
            return jnp.mean((h - tgt) ** 2), st

        (loss, st), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        import optax as _o
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        new_params = _o.apply_updates(variables["params"], updates)
        return ({"params": new_params, "state": st,
                 "masks": variables["masks"]}, opt_state, loss)

    return step, (variables, opt_state, x), T * B


def time_step(step, args):
    key0 = jax.random.PRNGKey(0)

    def chain(cur, out, i):
        return (out[0], out[1], cur[2], jax.random.fold_in(key0, i))

    return chained_step_time(
        step, args + (key0,), chain=chain, readback=lambda out: out[2],
        n_lo=2, n_hi=12, repeats=4)


def main():
    hidden = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    drop = sys.argv[2] if len(sys.argv) > 2 else "75"
    model = sys.argv[3] if len(sys.argv) > 3 else "lstm"
    print("chip:", jax.devices()[0].device_kind, flush=True)
    out = {}
    if model == "mlp_packed":
        # three variants in one session (comparable under contention):
        # dense-masked, production packed path, bare packed probe
        step_d, args_d, _ = build_mlp(hidden, drop, False)
        step_p, args_p, _ = build_mlp(hidden, drop, True)
        step_b, args_b, _ = build_mlp_packed(hidden, drop)

        def chain_b(cur, out, i):
            return (out[0], out[1], cur[2])
        for name, (st, ar, ch) in {
            "dense-masked   ": (step_d, args_d, None),
            "packed (model) ": (step_p, args_p, None),
            "packed (probe) ": (step_b, args_b, chain_b),
        }.items():
            if ch is None:
                dt = time_step(st, ar)
            else:
                dt = chained_step_time(st, ar, chain=ch,
                                       readback=lambda out: out[2],
                                       n_lo=2, n_hi=12, repeats=4)
            print("%s: %7.3f ms/step" % (name, dt * 1e3), flush=True)
        return
    builder = build_mlp if model == "mlp" else build
    for bs_on in (False, True):
        step, args, frames = builder(hidden, drop, bs_on)
        dt = time_step(step, args)
        out[bs_on] = dt
        print("hidden=%d drop_l1=%s%% block_sparse=%-5s : %7.3f ms/step "
              "(%.0f frames/s)" % (hidden, drop, bs_on, dt * 1e3,
                                   frames / dt), flush=True)
    print("model-level block_sparse speedup: %.2fx"
          % (out[False] / out[True]), flush=True)




def build_mlp_packed(hidden, drop_l1, N=4096, feat=2048, layers=4):
    """Ceiling probe: params STORED packed (nnz, G*bs, bs) — no per-step
    dense->packed gather, no backward scatter; optimizer state packed
    too (memory shrinks by the compression ratio)."""
    import optax
    from pytorch_kaldi_cgs_tpu.ops import block_sparse as BS
    from pytorch_kaldi_cgs_tpu.sparsity.hcgs import hcgs_mask
    from pytorch_kaldi_cgs_tpu.runtime.optim import make_optimizer

    rng = np.random.RandomState(0)
    dims = [feat] + [hidden] * layers
    params = {}
    layouts = {}
    for i in range(layers):
        mask = hcgs_mask(dims[i + 1], dims[i], [128, 4],
                         [float(drop_l1), 50.0], rng=rng)
        layout = BS.pack_layout(np.asarray(mask), 128)
        w = (rng.randn(dims[i + 1], dims[i]) * 0.02).astype(np.float32) * \
            np.asarray(mask)
        blocks = BS.pack_blocks_multi([w], layout)      # (nnz, bs, bs)
        w3 = blocks.reshape(layout.Nb, layout.R, 128, 128) \
            .transpose(0, 2, 1, 3).reshape(layout.Nb, 128, layout.R * 128)
        params["w3_%d" % i] = jnp.asarray(w3)
        params["b_%d" % i] = jnp.zeros(dims[i + 1], jnp.float32)
        layouts[i] = layout
    tx = make_optimizer({"arch_opt": "sgd", "arch_lr": "0.01",
                         "opt_momentum": "0", "opt_weight_decay": "0",
                         "opt_dampening": "0", "opt_nesterov": "False"})
    opt_state = tx.init(params)
    x = jnp.asarray(rng.randn(N, feat), jnp.float32)
    tgt = jnp.asarray(rng.randn(N, hidden) * 0.1, jnp.float32)
    csc_dummy = {i: jnp.zeros((layouts[i].Kb, layouts[i].C * 128, 128),
                              jnp.float32) for i in range(layers)}

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(params):
            h = x
            for i in range(layers):
                y = BS.block_sparse_matmul_v3(
                    h, params["w3_%d" % i], csc_dummy[i], layouts[i], 1,
                    tile_m=256)[0]
                h = jax.nn.relu(y + params["b_%d" % i])
            return jnp.mean((h - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        import optax as _o
        updates, opt_state = tx.update(grads, opt_state, params)
        return _o.apply_updates(params, updates), opt_state, loss

    return step, (params, opt_state, x), N


if __name__ == "__main__":
    main()
