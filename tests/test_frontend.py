"""On-TPU feature frontend tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.ops.frontend import (Frontend, add_deltas_jax,
                                                cmvn_jax, mel_filterbank,
                                                hz_to_mel, mel_to_hz)


def test_mel_scale_roundtrip():
    hz = np.array([100.0, 1000.0, 4000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(hz)), hz, rtol=1e-6)


def test_mel_filterbank_partition():
    fb = mel_filterbank(23, 512, 16000)
    assert fb.shape == (23, 257)
    # every filter has positive mass; peaks ordered by frequency
    assert (fb.sum(axis=1) > 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()


def test_fbank_pure_tone_peak():
    fe = Frontend(sample_rate=16000, num_mel_bins=23)
    t = np.arange(16000) / 16000.0
    for freq in (300.0, 2000.0):
        sig = jnp.asarray(np.sin(2 * np.pi * freq * t).astype(np.float32))
        fb = np.array(fe.fbank(sig))
        assert fb.shape == (fe.num_frames(16000), 23)
        # the peak bin's center frequency brackets the tone
        fbm = mel_filterbank(23, fe.n_fft, 16000)
        peak_bin = fb.mean(axis=0).argmax()
        freqs = np.linspace(0, 8000, fe.n_fft // 2 + 1)
        center = freqs[fbm[peak_bin].argmax()]
        assert abs(center - freq) < 400.0


def test_mfcc_shapes_and_energy():
    fe = Frontend(num_ceps=13, use_energy=True)
    rng = np.random.RandomState(0)
    sig = jnp.asarray(rng.randn(8000).astype(np.float32))
    m = np.array(fe.mfcc(sig))
    assert m.shape == (fe.num_frames(8000), 13)
    loud = np.array(fe.mfcc(sig * 10.0))
    # energy coefficient grows with amplitude
    assert loud[:, 0].mean() > m[:, 0].mean()


def test_add_deltas_jax_matches_numpy():
    from pytorch_kaldi_cgs_tpu.data.features import add_deltas
    rng = np.random.RandomState(1)
    x = rng.randn(40, 5).astype(np.float32)
    ref = add_deltas(x, order=2, window=2)
    got = np.array(add_deltas_jax(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_cmvn_jax():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(100, 4).astype(np.float32) * 3 + 5)
    y = np.array(cmvn_jax(x))
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-4)


def test_compute_feats_cli(tmp_path):
    import scipy.io.wavfile
    from pytorch_kaldi_cgs_tpu.bin.compute_feats import main
    from pytorch_kaldi_cgs_tpu.data import kaldi_io
    rng = np.random.RandomState(0)
    wavs = {}
    scp = tmp_path / "wav.scp"
    with open(scp, "w") as f:
        for u in range(2):
            p = tmp_path / ("u%d.wav" % u)
            sig = (rng.randn(8000) * 3000).astype(np.int16)
            scipy.io.wavfile.write(str(p), 16000, sig)
            f.write("utt%d %s\n" % (u, p))
    rc = main(["--wav-scp", str(scp), "--out-ark", str(tmp_path / "f.ark"),
               "--out-scp", str(tmp_path / "f.scp"), "--type", "fbank"])
    assert rc == 0
    got = dict(kaldi_io.read_mat_ark(str(tmp_path / "f.ark")))
    assert set(got) == {"utt0", "utt1"}
    assert got["utt0"].shape[1] == 23
