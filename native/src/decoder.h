// Native WFST beam-search Viterbi decoder (C ABI).
//
// Replaces the external Kaldi `latgen-faster-mapped` binary the
// reference shells out to (ref: kaldi_decoding_scripts/decode_dnn.sh:84)
// for the best-path decode: token-passing Viterbi over a text-format
// FST (OpenFst-compatible "src dst ilabel olabel [cost]" arcs, tropical
// semiring, ilabel = pdf-id + 1, 0 = epsilon) against per-frame acoustic
// log-likelihood matrices, with beam + max-active pruning driven by the
// same [decoding] config fields (beam, max_active, acwt).

#ifndef PKC_NATIVE_DECODER_H_
#define PKC_NATIVE_DECODER_H_

#include <cstdint>

extern "C" {

typedef struct PkcFst PkcFst;

// Load a text FST. Returns nullptr on parse failure.
PkcFst* pkc_fst_load_text(const char* path);

// Bulk CSR build from flat arc arrays (numpy-friendly; the OpenFst
// binary reader feeds HCLG graphs through this). Returns nullptr on
// out-of-range states.
PkcFst* pkc_fst_load_raw(int64_t num_states, int32_t start,
                         const double* final_cost, int64_t num_arcs,
                         const int32_t* src, const int32_t* dst,
                         const int32_t* ilabel, const int32_t* olabel,
                         const float* cost);
void pkc_fst_free(PkcFst* fst);
int64_t pkc_fst_num_states(const PkcFst* fst);
int64_t pkc_fst_num_arcs(const PkcFst* fst);

// Decode one utterance.
//   loglikes: T x S row-major acoustic log-likelihoods (pdf s at frame t)
//   beam: prune tokens worse than best + beam
//   max_active: keep at most this many states per frame (0 = unlimited)
//   acwt: acoustic scale
//   out_labels: best-path output labels (olabels, epsilons removed)
// Returns number of labels written (>=0), or -1 on error.
int64_t pkc_decode(const PkcFst* fst, const float* loglikes, int64_t T,
                   int64_t S, double beam, int64_t max_active, double acwt,
                   int32_t* out_labels, int64_t max_out);

// Like pkc_decode but also emits the frame index at which each output
// label was hypothesized (CTM-style time alignment, the
// lattice-to-ctm-conf role). out_frames must hold max_out entries.
int64_t pkc_decode_ctm(const PkcFst* fst, const float* loglikes, int64_t T,
                       int64_t S, double beam, int64_t max_active, double acwt,
                       int32_t* out_labels, int32_t* out_frames,
                       int64_t max_out);

// Decode N utterances concurrently on a native thread pool — ONE
// library call per batch instead of one per utterance, so many tiny
// utterances stop paying Python/ctypes/GIL round-trips (the reference
// fans out latgen-faster-mapped PROCESSES per split; this is the
// shared-memory equivalent).
//   loglikes: concatenated frames, (offsets[N]) x S row-major
//   offsets:  N+1 cumulative frame offsets (utterance i spans
//             [offsets[i], offsets[i+1]))
//   out_labels / out_frames: per-utterance slots of out_stride entries
//             at i*out_stride (out_frames may be null)
//   out_lens[i]: labels written for utterance i, or -1 on failure
//   n_threads: 0 = hardware_concurrency
void pkc_decode_batch(const PkcFst* fst, const float* loglikes,
                      const int64_t* offsets, int64_t N, int64_t S,
                      double beam, int64_t max_active, double acwt,
                      int32_t* out_labels, int32_t* out_frames,
                      int64_t out_stride, int64_t* out_lens,
                      int64_t n_threads);

// ---------------------------------------------------------------------------
// Lattice generation (the `latgen` in latgen-faster-mapped).
//
// The lattice is a DAG over (frame, fst-state) nodes holding EVERY
// within-beam transition the search survived, with graph and acoustic
// costs stored separately so the lattice can be rescored with a
// different acoustic scale afterwards. lat_beam prunes arcs whose best
// path through them is worse than best_total + lat_beam
// (forward-backward pruning, the `--lattice-beam` role).
// ---------------------------------------------------------------------------

typedef struct PkcLattice PkcLattice;

PkcLattice* pkc_decode_lattice(const PkcFst* fst, const float* loglikes,
                               int64_t T, int64_t S, double beam,
                               double lat_beam, int64_t max_active,
                               double acwt);

// Batched lattice generation on a native thread pool (same contract as
// pkc_decode_batch; the rescoring pipeline consumes one lattice per
// utterance). out_lats[i] = lattice or null on failure; caller frees
// each with pkc_lattice_free.
void pkc_decode_lattice_batch(const PkcFst* fst, const float* loglikes,
                              const int64_t* offsets, int64_t N,
                              int64_t S, double beam, double lat_beam,
                              int64_t max_active, double acwt,
                              PkcLattice** out_lats, int64_t n_threads);
void pkc_lattice_free(PkcLattice* lat);
int64_t pkc_lattice_num_nodes(const PkcLattice* lat);
int64_t pkc_lattice_num_arcs(const PkcLattice* lat);
// Node metadata: frame index and final cost (inf if not final).
void pkc_lattice_nodes(const PkcLattice* lat, int32_t* frames,
                       double* final_costs);
// Arc arrays (parallel, length num_arcs).
void pkc_lattice_arcs(const PkcLattice* lat, int32_t* from, int32_t* to,
                      int32_t* ilabels, int32_t* olabels, float* graph_costs,
                      float* acoustic_costs);
// Best path at a (possibly different) acoustic scale factor applied to
// the stored acoustic costs: total = graph + scale * acoustic.
// Best path + CTM rows with per-token posterior confidences from the
// lattice-wide log-sum forward/backward (the lattice-to-ctm-conf role).
// Returns token count, or -1 when no final state is reachable.
int64_t pkc_lattice_ctm_conf(const PkcLattice* lat, double ac_scale,
                             int32_t* out_labels, int32_t* out_frames,
                             float* out_conf, int64_t max_out);

int64_t pkc_lattice_best_path(const PkcLattice* lat, double ac_scale,
                              int32_t* out_labels, int64_t max_out);

}  // extern "C"

#endif  // PKC_NATIVE_DECODER_H_
