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


def test_closed_form_fmllr_recovers_affine_warp():
    """estimate_fmllr_ml (Gales row-wise ML, the actual fMLLR) on a
    speaker whose features are a known affine warp of the training
    distribution: the estimated transform must recover nearly all of
    the lost likelihood (and compose to ~identity with the warp)."""
    from pytorch_kaldi_cgs_tpu.data.adapt import (class_gaussian_stats,
                                                  estimate_fmllr_ml,
                                                  fmllr_loglik)
    rng = np.random.RandomState(0)
    C, d, N = 6, 8, 4000
    means = rng.randn(C, d) * 2.0
    labels = rng.randint(0, C, N)
    clean = means[labels] + rng.randn(N, d) * 0.5
    mu, var = class_gaussian_stats(clean, labels, C)
    # speaker warp: rotation-ish + shift
    M = np.eye(d) + 0.25 * rng.randn(d, d) / np.sqrt(d)
    c = rng.randn(d) * 0.8
    warped = clean @ M.T + c
    ll_clean = fmllr_loglik(clean, labels, np.eye(d), np.zeros(d), mu, var)
    ll_warped = fmllr_loglik(warped, labels, np.eye(d), np.zeros(d), mu, var)
    assert ll_warped < ll_clean - 1.0     # the warp genuinely hurts
    A, b = estimate_fmllr_ml(warped, labels, mu, var)
    ll_adapted = fmllr_loglik(warped, labels, A, b, mu, var)
    # recovers at least 90% of the likelihood lost to the warp
    assert ll_adapted > ll_warped + 0.9 * (ll_clean - ll_warped)
    # and the composed transform is near identity
    comp = A @ M
    np.testing.assert_allclose(comp, np.eye(d), atol=0.15)


def test_closed_form_fmllr_identity_on_matched_data():
    """On unwarped data the ML transform stays near identity (the
    log|det A| term is handled right: no shrink-to-zero collapse)."""
    from pytorch_kaldi_cgs_tpu.data.adapt import (class_gaussian_stats,
                                                  estimate_fmllr_ml)
    rng = np.random.RandomState(1)
    C, d, N = 4, 6, 3000
    means = rng.randn(C, d) * 2.0
    labels = rng.randint(0, C, N)
    feats = means[labels] + rng.randn(N, d) * 0.4
    mu, var = class_gaussian_stats(feats, labels, C)
    A, b = estimate_fmllr_ml(feats, labels, mu, var)
    np.testing.assert_allclose(A, np.eye(d), atol=0.1)
    np.testing.assert_allclose(b, np.zeros(d), atol=0.1)
