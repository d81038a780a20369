"""fMLLR-style speaker adaptation: an affine feature corruption is
recovered by ML estimation against the trained model (data/adapt.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from pytorch_kaldi_cgs_tpu.data.adapt import (apply_fmllr, estimate_fmllr,
                                              estimate_fmllr_per_speaker)


def _toy_model(F=8, C=5, seed=0):
    """A fixed random linear-softmax 'trained acoustic model'."""
    rng = np.random.RandomState(seed)
    W = jnp.asarray(rng.randn(F, C) * 1.5, jnp.float32)

    def loglik(x):
        return jax.nn.log_softmax(x @ W, axis=-1)

    return loglik, W


def _speaker_data(W, n=400, F=8, seed=1):
    """Frames whose true class is the model's argmax on CLEAN features;
    the speaker's observed features are affinely corrupted."""
    rng = np.random.RandomState(seed)
    clean = rng.randn(n, F).astype(np.float32) * 2.0
    labels = np.asarray(jnp.argmax(clean @ W, axis=1))
    M = np.eye(F, dtype=np.float32) * 0.5      # shrunk + rotated + shifted
    M[0, 1] = 0.8
    off = rng.randn(F).astype(np.float32) * 1.0
    corrupted = clean @ M.T + off
    return clean, corrupted, labels


def test_fmllr_recovers_affine_corruption():
    loglik, W = _toy_model()
    clean, corrupted, labels = _speaker_data(W)

    def nll(x):
        lp = loglik(jnp.asarray(x))
        return -float(jnp.mean(jnp.take_along_axis(
            lp, jnp.asarray(labels)[:, None], axis=1)))

    base = nll(corrupted)
    A, b = estimate_fmllr(loglik, corrupted, labels, steps=150, lr=0.1,
                          ridge=1e-4)
    adapted = apply_fmllr(corrupted, A, b)
    assert nll(adapted) < base * 0.5, (nll(adapted), base)
    # adapted frames classify like clean ones
    acc = float(np.mean(np.asarray(
        jnp.argmax(loglik(jnp.asarray(adapted)), axis=1)) == labels))
    assert acc > 0.9, acc


def test_fmllr_per_speaker_grouping():
    loglik, W = _toy_model()
    feats, labs = {}, {}
    for i, spk in enumerate(("spk_a", "spk_b")):
        _, corrupted, labels = _speaker_data(W, seed=10 + i)
        feats[spk], labs[spk] = corrupted, labels
    out = estimate_fmllr_per_speaker(loglik, feats, labs, steps=60, lr=0.1)
    assert set(out) == {"spk_a", "spk_b"}
    # transforms are speaker-specific, not shared
    assert not np.allclose(out["spk_a"][0], out["spk_b"][0])
