"""Multi-device tests on the virtual 8-device CPU mesh: DP+TP sharded
training step, graft entry contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.parallel import (batch_sharding, make_mesh,
                                            model_sharding_rules,
                                            shard_variables)


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_make_mesh_shapes():
    mesh = make_mesh(8, model_axis=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh1 = make_mesh(8)
    assert dict(mesh1.shape) == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(6, model_axis=4)


def test_sharding_rules_split_weights():
    mesh = make_mesh(8, model_axis=2)
    variables = {"w": np.zeros((64, 32), np.float32),
                 "b": np.zeros((64,), np.float32),
                 "odd": np.zeros((33, 5), np.float32)}
    rules = model_sharding_rules(mesh, variables)
    assert rules["w"].spec == jax.sharding.PartitionSpec("model", None)
    assert rules["b"].spec == jax.sharding.PartitionSpec()
    assert rules["odd"].spec == jax.sharding.PartitionSpec()  # 33 % 2 != 0


def test_dp_step_matches_single_device():
    """Data-parallel sharded loss/grad == single-device loss/grad."""
    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(16, 8), jnp.float32)
    x = jnp.asarray(rng.randn(32, 8), jnp.float32)
    y = jnp.asarray(rng.randn(32, 16), jnp.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w.T - y) ** 2)

    ref_l, ref_g = jax.value_and_grad(loss)(w, x, y)
    xs = jax.device_put(x, batch_sharding(mesh, 2, 0))
    ys = jax.device_put(y, batch_sharding(mesh, 2, 0))
    with mesh:
        l2, g2 = jax.jit(jax.value_and_grad(loss))(w, xs, ys)
    np.testing.assert_allclose(float(ref_l), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.array(ref_g), np.array(g2), rtol=1e-4)


def test_graft_entry_single_chip():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 1944
    assert np.isfinite(np.array(out)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_dryrun_two_devices():
    import __graft_entry__ as g
    g.dryrun_multichip(2)
