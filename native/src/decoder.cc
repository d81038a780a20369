#include "decoder.h"

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct Arc {
  int32_t dst;
  int32_t ilabel;  // pdf + 1; 0 = epsilon
  int32_t olabel;
  float cost;      // graph cost (-log prob)
};

}  // namespace

struct PkcFst {
  int32_t start = 0;
  int64_t num_arcs = 0;
  std::vector<double> final_cost;          // per state; inf = non-final
  std::vector<int64_t> arc_offset;         // CSR over states
  std::vector<Arc> arcs;
};

extern "C" {

PkcFst* pkc_fst_load_text(const char* path) {
  FILE* f = fopen(path, "r");
  if (!f) return nullptr;
  struct RawArc { int32_t s, d, il, ol; float c; };
  std::vector<RawArc> raw;
  std::vector<std::pair<int32_t, double>> finals;
  int32_t max_state = -1;
  int32_t start = -1;
  char line[512];
  while (fgets(line, sizeof(line), f)) {
    double a, b, c, d, e;
    int n = sscanf(line, "%lf %lf %lf %lf %lf", &a, &b, &c, &d, &e);
    if (n >= 4) {
      RawArc ra{(int32_t)a, (int32_t)b, (int32_t)c, (int32_t)d,
                n == 5 ? (float)e : 0.0f};
      raw.push_back(ra);
      max_state = std::max(max_state, std::max(ra.s, ra.d));
      if (start < 0) start = ra.s;  // first mentioned state is the start
    } else if (n >= 1) {
      finals.emplace_back((int32_t)a, n >= 2 ? b : 0.0);
      max_state = std::max(max_state, (int32_t)a);
      if (start < 0) start = (int32_t)a;
    }
  }
  fclose(f);
  if (max_state < 0) return nullptr;
  auto* fst = new PkcFst();
  fst->start = start;
  const int64_t S = max_state + 1;
  fst->final_cost.assign(S, kInf);
  for (auto& p : finals) fst->final_cost[p.first] = p.second;
  // CSR
  std::vector<int64_t> counts(S + 1, 0);
  for (auto& ra : raw) counts[ra.s + 1]++;
  for (int64_t i = 0; i < S; ++i) counts[i + 1] += counts[i];
  fst->arc_offset = counts;
  fst->arcs.resize(raw.size());
  std::vector<int64_t> cursor(fst->arc_offset.begin(),
                              fst->arc_offset.end() - 1);
  for (auto& ra : raw) {
    fst->arcs[cursor[ra.s]++] = Arc{ra.d, ra.il, ra.ol, ra.c};
  }
  fst->num_arcs = (int64_t)raw.size();
  return fst;
}

PkcFst* pkc_fst_load_raw(int64_t num_states, int32_t start,
                         const double* final_cost, int64_t num_arcs,
                         const int32_t* src, const int32_t* dst,
                         const int32_t* ilabel, const int32_t* olabel,
                         const float* cost) {
  // bulk CSR build from flat arc arrays (the OpenFst binary reader on
  // the Python side hands HCLG graphs over through this)
  if (num_states <= 0 || start < 0 || start >= num_states) return nullptr;
  auto* fst = new PkcFst();
  fst->start = start;
  fst->final_cost.assign(final_cost, final_cost + num_states);
  std::vector<int64_t> counts(num_states + 1, 0);
  for (int64_t i = 0; i < num_arcs; ++i) {
    if (src[i] < 0 || src[i] >= num_states || dst[i] < 0 ||
        dst[i] >= num_states) {
      delete fst;
      return nullptr;
    }
    counts[src[i] + 1]++;
  }
  for (int64_t i = 0; i < num_states; ++i) counts[i + 1] += counts[i];
  fst->arc_offset = counts;
  fst->arcs.resize(num_arcs);
  std::vector<int64_t> cursor(fst->arc_offset.begin(),
                              fst->arc_offset.end() - 1);
  for (int64_t i = 0; i < num_arcs; ++i) {
    fst->arcs[cursor[src[i]]++] = Arc{dst[i], ilabel[i], olabel[i], cost[i]};
  }
  fst->num_arcs = num_arcs;
  return fst;
}

void pkc_fst_free(PkcFst* fst) { delete fst; }
int64_t pkc_fst_num_states(const PkcFst* fst) {
  return (int64_t)fst->final_cost.size();
}
int64_t pkc_fst_num_arcs(const PkcFst* fst) { return fst->num_arcs; }

namespace {

// Backtrace arena entry.
struct Trace {
  int64_t prev;
  int32_t olabel;
  int32_t frame;
};

struct Token {
  double cost;
  int64_t trace;  // index into arena, -1 = none
};

// Flat per-state token store with epoch stamping. The per-frame
// unordered_map was the decode bottleneck (every arc relaxation paid a
// hash + probe + possible rehash); here insert/lookup is one array read
// against a stamp, and "clearing" the frame is an epoch bump.
struct ActiveToks {
  std::vector<Token> tok;
  std::vector<uint32_t> stamp;   // tok[s] valid iff stamp[s] == epoch
  std::vector<int32_t> list;     // unique states stamped this epoch
  uint32_t epoch = 0;

  void Init(int64_t num_states) {
    tok.resize(num_states);
    stamp.assign(num_states, 0);
    epoch = 0;
    list.clear();
  }
  void Clear() {
    list.clear();
    if (++epoch == 0) {  // wrapped: invalidate all stamps
      std::fill(stamp.begin(), stamp.end(), 0);
      epoch = 1;
    }
  }
  bool Has(int32_t s) const { return stamp[s] == epoch; }
};

// Epsilon-closure propagation within the current frame.
void PropagateEpsilon(const PkcFst* fst, ActiveToks* toks,
                      std::vector<Trace>* arena, double cutoff,
                      int32_t frame) {
  // simple work-list; WFST graphs after composition are mostly eps-free,
  // phone-loop graphs have a handful of eps arcs.
  std::vector<int32_t> work(toks->list);
  while (!work.empty()) {
    int32_t s = work.back();
    work.pop_back();
    const Token tok = toks->tok[s];
    if (tok.cost > cutoff) continue;
    for (int64_t a = fst->arc_offset[s]; a < fst->arc_offset[s + 1]; ++a) {
      const Arc& arc = fst->arcs[a];
      if (arc.ilabel != 0) continue;
      double nc = tok.cost + arc.cost;
      if (nc > cutoff) continue;
      const bool fresh = !toks->Has(arc.dst);
      if (fresh || nc < toks->tok[arc.dst].cost) {
        int64_t tr = tok.trace;
        if (arc.olabel != 0) {
          arena->push_back(Trace{tok.trace, arc.olabel, frame});
          tr = (int64_t)arena->size() - 1;
        }
        if (fresh) {
          toks->stamp[arc.dst] = toks->epoch;
          toks->list.push_back(arc.dst);
        }
        toks->tok[arc.dst] = Token{nc, tr};
        work.push_back(arc.dst);
      }
    }
  }
}

double AdaptiveCutoff(const ActiveToks& toks, double beam,
                      int64_t max_active, double* best_out) {
  double best = kInf;
  for (int32_t s : toks.list) best = std::min(best, toks.tok[s].cost);
  *best_out = best;
  double cutoff = best + beam;
  if (max_active > 0 && (int64_t)toks.list.size() > max_active) {
    std::vector<double> costs;
    costs.reserve(toks.list.size());
    for (int32_t s : toks.list) costs.push_back(toks.tok[s].cost);
    std::nth_element(costs.begin(), costs.begin() + max_active - 1,
                     costs.end());
    cutoff = std::min(cutoff, costs[max_active - 1]);
  }
  return cutoff;
}

}  // namespace

int64_t pkc_decode_ctm(const PkcFst* fst, const float* loglikes, int64_t T,
                       int64_t S, double beam, int64_t max_active, double acwt,
                       int32_t* out_labels, int32_t* out_frames,
                       int64_t max_out) {
  const int64_t NS = (int64_t)fst->final_cost.size();
  std::vector<Trace> arena;
  arena.reserve(4096);
  ActiveToks cur, next;
  cur.Init(NS);
  next.Init(NS);
  cur.Clear();
  cur.stamp[fst->start] = cur.epoch;
  cur.list.push_back(fst->start);
  cur.tok[fst->start] = Token{0.0, -1};
  PropagateEpsilon(fst, &cur, &arena, kInf, 0);

  for (int64_t t = 0; t < T; ++t) {
    double best;
    double cutoff = AdaptiveCutoff(cur, beam, max_active, &best);
    next.Clear();
    const float* frame = loglikes + t * S;
    double next_best = kInf;
    for (int32_t s : cur.list) {
      const Token tok = cur.tok[s];
      if (tok.cost > cutoff) continue;
      for (int64_t a = fst->arc_offset[s]; a < fst->arc_offset[s + 1]; ++a) {
        const Arc& arc = fst->arcs[a];
        if (arc.ilabel == 0) continue;
        const int32_t pdf = arc.ilabel - 1;
        if (pdf >= S) continue;
        double nc = tok.cost + arc.cost - acwt * (double)frame[pdf];
        if (nc > next_best + beam) continue;
        const bool fresh = !next.Has(arc.dst);
        if (fresh || nc < next.tok[arc.dst].cost) {
          int64_t tr = tok.trace;
          if (arc.olabel != 0) {
            arena.push_back(Trace{tok.trace, arc.olabel,
                                  static_cast<int32_t>(t)});
            tr = (int64_t)arena.size() - 1;
          }
          if (fresh) {
            next.stamp[arc.dst] = next.epoch;
            next.list.push_back(arc.dst);
          }
          next.tok[arc.dst] = Token{nc, tr};
          next_best = std::min(next_best, nc);
        }
      }
    }
    if (next.list.empty()) return -1;  // decode failed (over-pruned)
    double nb;
    double eps_cutoff = AdaptiveCutoff(next, beam, max_active, &nb);
    PropagateEpsilon(fst, &next, &arena, eps_cutoff,
                     static_cast<int32_t>(t));
    std::swap(cur, next);
  }

  // pick the best final token (fall back to best token if none final)
  double best_cost = kInf;
  int64_t best_trace = -1;
  bool any_final = false;
  for (int32_t s : cur.list) {
    double fc = fst->final_cost[s];
    if (fc != kInf) {
      any_final = true;
      double c = cur.tok[s].cost + fc;
      if (c < best_cost) {
        best_cost = c;
        best_trace = cur.tok[s].trace;
      }
    }
  }
  if (!any_final) {
    for (int32_t s : cur.list) {
      if (cur.tok[s].cost < best_cost) {
        best_cost = cur.tok[s].cost;
        best_trace = cur.tok[s].trace;
      }
    }
  }

  // backtrace olabels (+ frames)
  std::vector<int32_t> rev, revf;
  for (int64_t tr = best_trace; tr >= 0; tr = arena[tr].prev) {
    rev.push_back(arena[tr].olabel);
    revf.push_back(arena[tr].frame);
  }
  int64_t n = (int64_t)rev.size();
  if (n > max_out) n = max_out;
  for (int64_t i = 0; i < n; ++i) {
    out_labels[i] = rev[rev.size() - 1 - i];
    if (out_frames) out_frames[i] = revf[rev.size() - 1 - i];
  }
  return n;
}

int64_t pkc_decode(const PkcFst* fst, const float* loglikes, int64_t T,
                   int64_t S, double beam, int64_t max_active, double acwt,
                   int32_t* out_labels, int64_t max_out) {
  return pkc_decode_ctm(fst, loglikes, T, S, beam, max_active, acwt,
                        out_labels, nullptr, max_out);
}

void pkc_decode_batch(const PkcFst* fst, const float* loglikes,
                      const int64_t* offsets, int64_t N, int64_t S,
                      double beam, int64_t max_active, double acwt,
                      int32_t* out_labels, int32_t* out_frames,
                      int64_t out_stride, int64_t* out_lens,
                      int64_t n_threads) {
  if (n_threads <= 0) {
    n_threads = (int64_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > N) n_threads = N;
  std::atomic<int64_t> next_idx(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next_idx.fetch_add(1);
      if (i >= N) return;
      const int64_t T = offsets[i + 1] - offsets[i];
      out_lens[i] = pkc_decode_ctm(
          fst, loglikes + offsets[i] * S, T, S, beam, max_active, acwt,
          out_labels + i * out_stride,
          out_frames ? out_frames + i * out_stride : nullptr, out_stride);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve((size_t)n_threads);
  for (int64_t k = 0; k < n_threads; ++k) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
