"""Per-architecture optimizers (SGD / Adam / RMSprop) with torch-exact
update rules (ref: utils.py:1833-1881 builds torch.optim instances from
the [architecture*] opt_* fields).

optax's rmsprop puts eps inside the sqrt; torch puts it outside — for
checkpoint/LR-schedule parity we implement the torch rules directly as
optax GradientTransformations. Learning rate is injected per-step
(inject_hyperparams) so newbob annealing and per-epoch LR schedules
don't retrigger jit compilation.
"""

from __future__ import annotations

from typing import Any, Mapping, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config.proto import strtobool


class _SGDState(NamedTuple):
    momentum: optax.Updates


def _torch_sgd(momentum: float, dampening: float, nesterov: bool,
               weight_decay: float) -> optax.GradientTransformation:
    def init(params):
        return _SGDState(jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        if weight_decay:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, grads, params)
        if momentum:
            buf = jax.tree_util.tree_map(
                lambda b, g: momentum * b + (1 - dampening) * g,
                state.momentum, grads)
            if nesterov:
                upd = jax.tree_util.tree_map(
                    lambda g, b: g + momentum * b, grads, buf)
            else:
                upd = buf
            state = _SGDState(buf)
        else:
            upd = grads
        return upd, state

    return optax.GradientTransformation(init, update)


class _RMSState(NamedTuple):
    sq_avg: optax.Updates
    momentum: optax.Updates
    grad_avg: optax.Updates


def _torch_rmsprop(alpha: float, eps: float, momentum: float, centered: bool,
                   weight_decay: float) -> optax.GradientTransformation:
    def init(params):
        def zeros():
            return jax.tree_util.tree_map(jnp.zeros_like, params)
        return _RMSState(zeros(), zeros(), zeros())

    def update(grads, state, params=None):
        if weight_decay:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, grads, params)
        sq = jax.tree_util.tree_map(
            lambda s, g: alpha * s + (1 - alpha) * g * g, state.sq_avg, grads)
        if centered:
            ga = jax.tree_util.tree_map(
                lambda a, g: alpha * a + (1 - alpha) * g, state.grad_avg, grads)
            denom = jax.tree_util.tree_map(
                lambda s, a: jnp.sqrt(s - a * a) + eps, sq, ga)
        else:
            ga = state.grad_avg
            denom = jax.tree_util.tree_map(lambda s: jnp.sqrt(s) + eps, sq)
        step = jax.tree_util.tree_map(lambda g, d: g / d, grads, denom)
        if momentum:
            buf = jax.tree_util.tree_map(
                lambda b, s: momentum * b + s, state.momentum, step)
            step = buf
        else:
            buf = state.momentum
        return step, _RMSState(sq, buf, ga)

    return optax.GradientTransformation(init, update)


def make_optimizer(arch_options: Mapping[str, Any]) -> optax.GradientTransformation:
    """Build the optimizer an [architecture*] section asks for. The
    returned transformation is wrapped in inject_hyperparams so
    ``opt_state.hyperparams['learning_rate']`` can be updated in place
    each chunk without recompiling."""
    opt_name = arch_options["arch_opt"]
    lr = float(arch_options["arch_lr"])
    if opt_name == "sgd":
        base = _torch_sgd(float(arch_options.get("opt_momentum", 0.0) or 0.0),
                          float(arch_options.get("opt_dampening", 0.0) or 0.0),
                          strtobool(arch_options.get("opt_nesterov", "False")),
                          float(arch_options.get("opt_weight_decay", 0.0) or 0.0))
    elif opt_name == "rmsprop":
        base = _torch_rmsprop(float(arch_options.get("opt_alpha", 0.95) or 0.95),
                              float(arch_options.get("opt_eps", 1e-8) or 1e-8),
                              float(arch_options.get("opt_momentum", 0.0) or 0.0),
                              strtobool(arch_options.get("opt_centered", "False")),
                              float(arch_options.get("opt_weight_decay", 0.0) or 0.0))
    elif opt_name == "adam":
        betas = [float(b) for b in str(arch_options.get("opt_betas", "0.9,0.999")).split(",")]
        parts = []
        wd = float(arch_options.get("opt_weight_decay", 0.0) or 0.0)
        if wd:
            # torch Adam: L2-style decay added to grads before the moments
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_adam(
            b1=betas[0], b2=betas[1],
            eps=float(arch_options.get("opt_eps", 1e-8) or 1e-8)))
        base = optax.chain(*parts)
    else:
        raise ValueError("unknown optimizer %r" % opt_name)

    @optax.inject_hyperparams
    def tx(learning_rate):
        return optax.chain(base, optax.scale(-learning_rate))

    return tx(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Update the injected LR in an optimizer state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state
