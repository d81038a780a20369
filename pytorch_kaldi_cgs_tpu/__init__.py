"""pytorch_kaldi_cgs_tpu — a TPU-native (JAX/XLA/Pallas) re-design of
hellboywyh/pytorch-kaldi-CGS: hybrid DNN-HMM speech recognition with
HCGS (Hierarchical Coarse-Grain Sparsity), guided HCGS, pattern-based
structured pruning, magnitude pruning and weight/activation quantization.

The reference delegates feature/label extraction and WFST decoding to
external Kaldi C++ binaries and runs dense masked matmuls on CUDA; this
framework is a from-scratch TPU-first build:

  * functional param/mask pytrees instead of in-place ``weight.data``
    mutation (ref: neural_networks.py:258, :853-896)
  * ``lax.scan`` recurrences and Pallas block-sparse matmuls on the MXU
  * ``jax.sharding``/``pjit`` data parallelism instead of
    ``nn.DataParallel`` (ref: utils.py:1781-1784)
  * native Kaldi-format I/O without shelling out to Kaldi
    (ref: data_io.py:18-22)
  * a native Viterbi/WFST decoder replacing ``latgen-faster-mapped``
    (ref: kaldi_decoding_scripts/decode_dnn.sh:79-87)

Layout:
  config/    typed proto-schema config system, chunk generation, model DSL
  data/      kaldi ark/scp I/O, feature pipelines, chunk dataset layer
  models/    acoustic model zoo (MLP, LSTM, GRU, liGRU, ... SincNet)
  ops/       Pallas TPU kernels (block-sparse matmul, quantized matmul)
  sparsity/  HCGS / guided-HCGS / pattern / prune / quantization stack
  parallel/  mesh + sharding helpers, distributed train-step builders
  runtime/   chunk trainer, checkpointing, metrics, schedulers
  decode/    posterior writer, Viterbi/WFST decoding, WER/PER scoring
  bin/       CLI entry points (run_exp, run_test, decode)
"""

__version__ = "0.1.0"
