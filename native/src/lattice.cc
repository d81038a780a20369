// Lattice-generating beam search (see decoder.h). Shares the FST
// structures of decoder.cc via its internal header-free layout — the
// PkcFst definition is duplicated-by-include below to keep the C ABI
// files independent of each other's internals.

#include "decoder.h"

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <limits>
#include <thread>
#include <vector>

namespace {
constexpr double kInf = std::numeric_limits<double>::infinity();

struct Arc {
  int32_t dst;
  int32_t ilabel;
  int32_t olabel;
  float cost;
};
}  // namespace

// Must mirror decoder.cc's PkcFst layout exactly.
struct PkcFst {
  int32_t start = 0;
  int64_t num_arcs = 0;
  std::vector<double> final_cost;
  std::vector<int64_t> arc_offset;
  std::vector<Arc> arcs;
};

namespace {

struct LatArc {
  int32_t from, to;
  int32_t ilabel, olabel;
  float graph_cost, acoustic_cost;
};

struct LatNode {
  int32_t frame;
  int32_t state;
  double final_cost = kInf;
  double best_fwd = kInf;   // best cost from start to node
  double best_bwd = kInf;   // best cost from node to any final
};

}  // namespace

struct PkcLattice {
  std::vector<LatNode> nodes;
  std::vector<LatArc> arcs;
  int32_t start_node = 0;
  // when true, arcs are stored in topological order (see BuildArcTopo):
  // best_path / ctm_conf sweeps are single linear passes.
  bool topo_ok = false;
};

namespace {

// Flat per-(frame,state) set with epoch stamping — replaces the two
// unordered_maps (token costs + state->lattice-node) that dominated the
// lattice-decode profile. cost == kInf marks "node exists but its token
// was beam-pruned" (matching the old erase-after-cutoff behavior: the
// node and its incoming arcs stay, backward pruning removes them).
struct FrameSet {
  std::vector<uint32_t> stamp;
  std::vector<int32_t> node;   // lattice node id, valid iff stamped
  std::vector<double> cost;    // token cost, kInf = no live token
  std::vector<int32_t> list;   // unique states stamped this epoch
  uint32_t epoch = 0;

  void Init(int64_t num_states) {
    stamp.assign(num_states, 0);
    node.resize(num_states);
    cost.resize(num_states);
    epoch = 0;
    list.clear();
  }
  void Clear() {
    list.clear();
    if (++epoch == 0) {
      std::fill(stamp.begin(), stamp.end(), 0);
      epoch = 1;
    }
  }
  bool Has(int32_t s) const { return stamp[s] == epoch; }
  int32_t GetNode(PkcLattice* lat, int32_t frame, int32_t s) {
    if (!Has(s)) {
      stamp[s] = epoch;
      node[s] = (int32_t)lat->nodes.size();
      cost[s] = kInf;
      lat->nodes.push_back(LatNode{frame, s});
      list.push_back(s);
    }
    return node[s];
  }
};

double Cutoff(const FrameSet& toks, double beam, int64_t max_active) {
  double best = kInf;
  int64_t n_live = 0;
  for (int32_t s : toks.list) {
    if (toks.cost[s] == kInf) continue;
    best = std::min(best, toks.cost[s]);
    n_live++;
  }
  double cutoff = best + beam;
  if (max_active > 0 && n_live > max_active) {
    std::vector<double> costs;
    costs.reserve(n_live);
    for (int32_t s : toks.list)
      if (toks.cost[s] != kInf) costs.push_back(toks.cost[s]);
    std::nth_element(costs.begin(), costs.begin() + max_active - 1,
                     costs.end());
    cutoff = std::min(cutoff, costs[max_active - 1]);
  }
  return cutoff;
}

// epsilon closure inside one frame: lattice arcs with 0 acoustic cost
void EpsClosure(const PkcFst* fst, PkcLattice* lat, FrameSet* toks,
                int32_t frame, double cutoff) {
  std::vector<int32_t> work;
  for (int32_t s : toks->list)
    if (toks->cost[s] != kInf) work.push_back(s);
  while (!work.empty()) {
    int32_t s = work.back();
    work.pop_back();
    const double tok_cost = toks->cost[s];
    if (tok_cost > cutoff) continue;
    const int32_t tok_node = toks->node[s];
    for (int64_t a = fst->arc_offset[s]; a < fst->arc_offset[s + 1]; ++a) {
      const Arc& arc = fst->arcs[a];
      if (arc.ilabel != 0) continue;
      double nc = tok_cost + arc.cost;
      if (nc > cutoff) continue;
      int32_t dnode = toks->GetNode(lat, frame, arc.dst);
      lat->arcs.push_back(LatArc{tok_node, dnode, 0, arc.olabel,
                                 arc.cost, 0.0f});
      if (nc < toks->cost[arc.dst]) {
        toks->cost[arc.dst] = nc;
        work.push_back(arc.dst);
      }
    }
  }
}

// -log(exp(-a) + exp(-b)) in the neglog semiring
double NegLogAdd(double a, double b) {
  if (a == kInf) return b;
  if (b == kInf) return a;
  double m = std::min(a, b);
  return m - std::log1p(std::exp(-(std::max(a, b) - m)));
}

// Kahn topological order over lattice nodes; falls back to creation
// order (*ok = false) if a cycle sneaks in (eps self-structures).
std::vector<int32_t> TopoOrder(const PkcLattice* lat, bool* ok) {
  const int64_t N = (int64_t)lat->nodes.size();
  std::vector<int32_t> indeg(N, 0);
  std::vector<std::vector<int32_t>> out(N);
  for (size_t i = 0; i < lat->arcs.size(); ++i) {
    indeg[lat->arcs[i].to]++;
    out[lat->arcs[i].from].push_back((int32_t)i);
  }
  std::vector<int32_t> order;
  order.reserve(N);
  std::vector<int32_t> stack;
  for (int64_t i = 0; i < N; ++i)
    if (indeg[i] == 0) stack.push_back((int32_t)i);
  while (!stack.empty()) {
    int32_t n = stack.back();
    stack.pop_back();
    order.push_back(n);
    for (int32_t ai : out[n]) {
      if (--indeg[lat->arcs[ai].to] == 0)
        stack.push_back(lat->arcs[ai].to);
    }
  }
  *ok = (int64_t)order.size() == N;
  if (!*ok) {  // cycle: creation order fallback
    order.resize(N);
    for (int64_t i = 0; i < N; ++i) order[i] = (int32_t)i;
  }
  return order;
}

// Physically reorder lat->arcs into topological order (by source-node
// position) so best-path / forward-backward sweeps are single LINEAR
// passes — indirecting through an index array cost ~4x in cache misses
// on million-arc lattices.
void BuildArcTopo(PkcLattice* lat) {
  bool ok = false;
  std::vector<int32_t> order = TopoOrder(lat, &ok);
  lat->topo_ok = ok;
  if (!ok) return;  // keep creation order; sweeps fall back to fixpoint
  const int64_t N = (int64_t)lat->nodes.size();
  std::vector<int32_t> pos(N);
  for (int64_t i = 0; i < N; ++i) pos[order[i]] = (int32_t)i;
  // counting sort by pos[from]: O(arcs + nodes), stable
  std::vector<int32_t> cnt(N + 1, 0);
  for (const auto& a : lat->arcs) cnt[pos[a.from] + 1]++;
  for (int64_t i = 0; i < N; ++i) cnt[i + 1] += cnt[i];
  std::vector<LatArc> sorted(lat->arcs.size());
  for (const auto& a : lat->arcs) sorted[cnt[pos[a.from]]++] = a;
  lat->arcs.swap(sorted);
}

// Periodic in-decode lattice pruning (latgen-faster's prune_interval
// role): backward costs seeded 0 at the live frontier tokens, forward
// costs from the start node, drop every arc not on a path within
// lat_beam of the frontier best, compact, and remap the frontier's
// node ids. Without this the raw lattice grows O(T * beam-width) arcs
// and the final prune dominates decode time.
double PrunePartial(PkcLattice* lat, FrameSet* cur, double lat_beam) {
  const int64_t N = (int64_t)lat->nodes.size();
  const double arcs_before = (double)lat->arcs.size();
  std::vector<double> fwd(N, kInf), bwd(N, kInf);
  fwd[lat->start_node] = 0.0;
  double frontier_best = kInf;
  for (int32_t s : cur->list) {
    if (cur->cost[s] == kInf) continue;
    bwd[cur->node[s]] = 0.0;
    frontier_best = std::min(frontier_best, cur->cost[s]);
  }
  if (frontier_best == kInf) return 1.0;
  // arc creation order is near-topological: relax to fixpoint
  for (int pass = 0; pass < 16; ++pass) {
    bool changed = false;
    for (auto& a : lat->arcs) {
      double c = fwd[a.from] + a.graph_cost + a.acoustic_cost;
      if (c < fwd[a.to]) {
        fwd[a.to] = c;
        changed = true;
      }
    }
    if (!changed) break;
  }
  for (int pass = 0; pass < 16; ++pass) {
    bool changed = false;
    for (int64_t i = (int64_t)lat->arcs.size() - 1; i >= 0; --i) {
      const LatArc& a = lat->arcs[i];
      double c = bwd[a.to] + a.graph_cost + a.acoustic_cost;
      if (c < bwd[a.from]) {
        bwd[a.from] = c;
        changed = true;
      }
    }
    if (!changed) break;
  }
  const double keep = frontier_best + lat_beam;
  std::vector<int32_t> remap(N, -1);
  std::vector<LatNode> knodes;
  std::vector<LatArc> kept;
  kept.reserve(lat->arcs.size() / 2);
  auto keep_node = [&](int32_t id) {
    if (remap[id] < 0) {
      remap[id] = (int32_t)knodes.size();
      knodes.push_back(lat->nodes[id]);
    }
    return remap[id];
  };
  keep_node(lat->start_node);
  for (auto& a : lat->arcs) {
    double through =
        fwd[a.from] + a.graph_cost + a.acoustic_cost + bwd[a.to];
    if (through <= keep)
      kept.push_back(LatArc{keep_node(a.from), keep_node(a.to), a.ilabel,
                            a.olabel, a.graph_cost, a.acoustic_cost});
  }
  lat->arcs.swap(kept);
  lat->nodes.swap(knodes);
  lat->start_node = remap[lat->start_node];
  // remap frontier tokens; tokens whose node fell outside lat_beam die
  // (token cost == fwd[node], so a live in-beam token is always kept)
  for (int32_t s : cur->list) {
    if (cur->cost[s] == kInf) continue;
    int32_t nn = remap[cur->node[s]];
    if (nn < 0)
      cur->cost[s] = kInf;
    else
      cur->node[s] = nn;
  }
  return arcs_before > 0 ? (double)lat->arcs.size() / arcs_before : 1.0;
}

constexpr int64_t kPruneInterval = 25;

}  // namespace

extern "C" {

PkcLattice* pkc_decode_lattice(const PkcFst* fst, const float* loglikes,
                               int64_t T, int64_t S, double beam,
                               double lat_beam, int64_t max_active,
                               double acwt) {
  auto* lat = new PkcLattice();
  const int64_t NS = (int64_t)fst->final_cost.size();
  FrameSet cur, next;
  cur.Init(NS);
  next.Init(NS);
  cur.Clear();
  lat->nodes.push_back(LatNode{-1, fst->start});
  lat->start_node = 0;
  cur.stamp[fst->start] = cur.epoch;
  cur.node[fst->start] = 0;
  cur.cost[fst->start] = 0.0;
  cur.list.push_back(fst->start);
  EpsClosure(fst, lat, &cur, -1, kInf);
  bool prune_on = true;

  for (int64_t t = 0; t < T; ++t) {
    double cutoff = Cutoff(cur, beam, max_active);
    next.Clear();
    const float* frame = loglikes + t * S;
    double next_best = kInf;  // running best this frame: arcs landing
                              // beyond next_best + beam cannot carry a
                              // surviving token (they'd be erased at the
                              // post-frame cutoff) nor sit on a kept path
                              // (lat_beam <= beam)
    for (int32_t s : cur.list) {
      const double tok_cost = cur.cost[s];
      if (tok_cost > cutoff) continue;
      const int32_t tok_node = cur.node[s];
      for (int64_t a = fst->arc_offset[s]; a < fst->arc_offset[s + 1]; ++a) {
        const Arc& arc = fst->arcs[a];
        if (arc.ilabel == 0) continue;
        const int32_t pdf = arc.ilabel - 1;
        if (pdf >= S) continue;
        const double ac = -acwt * (double)frame[pdf];
        double nc = tok_cost + arc.cost + ac;
        if (nc > next_best + beam) continue;
        next_best = std::min(next_best, nc);
        int32_t dnode = next.GetNode(lat, (int32_t)t, arc.dst);
        lat->arcs.push_back(LatArc{tok_node, dnode, arc.ilabel, arc.olabel,
                                   arc.cost, (float)ac});
        if (nc < next.cost[arc.dst]) next.cost[arc.dst] = nc;
      }
    }
    if (next.list.empty()) {
      delete lat;
      return nullptr;
    }
    double ncut = Cutoff(next, beam, max_active);
    // drop over-beam tokens (their arcs remain; backward prune removes them)
    for (int32_t s : next.list)
      if (next.cost[s] > ncut) next.cost[s] = kInf;
    EpsClosure(fst, lat, &next, (int32_t)t, ncut);
    std::swap(cur, next);
    // adaptive: stop pruning if a pass keeps >75% of arcs — the lattice
    // is inherently dense (everything within lat_beam) and the O(arcs)
    // fixpoint costs more than it saves
    if (prune_on && (t + 1) % kPruneInterval == 0) {
      if (PrunePartial(lat, &cur, lat_beam) > 0.75) prune_on = false;
    }
  }

  // final costs (only states whose token survived the last beam)
  bool any_final = false;
  for (int32_t s : cur.list) {
    if (cur.cost[s] == kInf) continue;
    double fc = fst->final_cost[s];
    if (fc != kInf) {
      lat->nodes[cur.node[s]].final_cost = fc;
      any_final = true;
    }
  }
  if (!any_final)
    for (int32_t s : cur.list)
      if (cur.cost[s] != kInf) lat->nodes[cur.node[s]].final_cost = 0.0;

  // ---- forward/backward pruning at lat_beam (nodes are created in
  // topological order: frame increases monotonically, eps arcs go to
  // later-created nodes within a frame)
  const int64_t N = (int64_t)lat->nodes.size();
  for (auto& n : lat->nodes) {
    n.best_fwd = kInf;
    n.best_bwd = n.final_cost;
  }
  lat->nodes[lat->start_node].best_fwd = 0.0;
  // arc append order is *nearly* topological (frames increase; within-
  // frame eps arcs may point backwards) -> relax to fixpoint
  for (int pass = 0; pass < 16; ++pass) {
    bool changed = false;
    for (auto& a : lat->arcs) {
      double c = lat->nodes[a.from].best_fwd + a.graph_cost + a.acoustic_cost;
      if (c < lat->nodes[a.to].best_fwd) {
        lat->nodes[a.to].best_fwd = c;
        changed = true;
      }
    }
    if (!changed) break;
  }
  for (int pass = 0; pass < 16; ++pass) {
    bool changed = false;
    for (int64_t i = (int64_t)lat->arcs.size() - 1; i >= 0; --i) {
      auto& a = lat->arcs[i];
      double c = lat->nodes[a.to].best_bwd + a.graph_cost + a.acoustic_cost;
      if (c < lat->nodes[a.from].best_bwd) {
        lat->nodes[a.from].best_bwd = c;
        changed = true;
      }
    }
    if (!changed) break;
  }
  double best_total = lat->nodes[lat->start_node].best_bwd;
  double keep = best_total + lat_beam;
  // compact: keep arcs on paths within lat_beam of the best
  std::vector<LatArc> kept;
  kept.reserve(lat->arcs.size());
  std::vector<int32_t> remap(N, -1);
  std::vector<LatNode> knodes;
  auto keep_node = [&](int32_t id) {
    if (remap[id] < 0) {
      remap[id] = (int32_t)knodes.size();
      knodes.push_back(lat->nodes[id]);
    }
    return remap[id];
  };
  keep_node(lat->start_node);
  for (auto& a : lat->arcs) {
    double through = lat->nodes[a.from].best_fwd + a.graph_cost +
                     a.acoustic_cost + lat->nodes[a.to].best_bwd;
    if (through <= keep) {
      int32_t f = keep_node(a.from);
      int32_t to = keep_node(a.to);
      kept.push_back(LatArc{f, to, a.ilabel, a.olabel, a.graph_cost,
                            a.acoustic_cost});
    }
  }
  lat->arcs.swap(kept);
  lat->nodes.swap(knodes);
  lat->start_node = 0;
  BuildArcTopo(lat);  // rescoring sweeps become single-pass
  return lat;
}

void pkc_lattice_free(PkcLattice* lat) { delete lat; }

int64_t pkc_lattice_num_nodes(const PkcLattice* lat) {
  return (int64_t)lat->nodes.size();
}
int64_t pkc_lattice_num_arcs(const PkcLattice* lat) {
  return (int64_t)lat->arcs.size();
}

void pkc_lattice_nodes(const PkcLattice* lat, int32_t* frames,
                       double* final_costs) {
  for (size_t i = 0; i < lat->nodes.size(); ++i) {
    frames[i] = lat->nodes[i].frame;
    final_costs[i] = lat->nodes[i].final_cost;
  }
}

void pkc_lattice_arcs(const PkcLattice* lat, int32_t* from, int32_t* to,
                      int32_t* ilabels, int32_t* olabels, float* graph_costs,
                      float* acoustic_costs) {
  for (size_t i = 0; i < lat->arcs.size(); ++i) {
    const LatArc& a = lat->arcs[i];
    from[i] = a.from;
    to[i] = a.to;
    ilabels[i] = a.ilabel;
    olabels[i] = a.olabel;
    graph_costs[i] = a.graph_cost;
    acoustic_costs[i] = a.acoustic_cost;
  }
}

namespace {

// Tropical best path with arc backpointers: single pass in topo order
// when available, relax-to-fixpoint fallback otherwise.
void BestPathCosts(const PkcLattice* lat, double ac_scale,
                   std::vector<double>* best, std::vector<int64_t>* barc) {
  const int64_t N = (int64_t)lat->nodes.size();
  best->assign(N, kInf);
  barc->assign(N, -1);
  (*best)[lat->start_node] = 0.0;
  auto relax = [&](int64_t i) {
    const LatArc& a = lat->arcs[i];
    double c = (*best)[a.from] + (double)a.graph_cost +
               ac_scale * (double)a.acoustic_cost;
    if (c < (*best)[a.to]) {
      (*best)[a.to] = c;
      (*barc)[a.to] = i;
      return true;
    }
    return false;
  };
  const int passes = lat->topo_ok ? 1 : 16;
  for (int pass = 0; pass < passes; ++pass) {
    bool changed = false;
    for (size_t i = 0; i < lat->arcs.size(); ++i)
      if (relax((int64_t)i)) changed = true;
    if (!changed) break;
  }
}

}  // namespace

int64_t pkc_lattice_ctm_conf(const PkcLattice* lat, double ac_scale,
                             int32_t* out_labels, int32_t* out_frames,
                             float* out_conf, int64_t max_out) {
  // Best path (tropical) + per-token posterior confidence from the
  // log-sum forward/backward over the whole lattice — the
  // lattice-to-ctm-conf role (ref: local/score.sh:55-60).
  const int64_t N = (int64_t)lat->nodes.size();
  // arcs are in topological order after BuildArcTopo (or creation order
  // — near-topological — when a cycle forced the fallback, matching the
  // approximation the pre-reorder implementation used)
  auto arc_cost = [&](const LatArc& a) {
    return (double)a.graph_cost + ac_scale * (double)a.acoustic_cost;
  };

  std::vector<double> alpha(N, kInf), beta(N, kInf);
  alpha[lat->start_node] = 0.0;
  for (const LatArc& a : lat->arcs)
    alpha[a.to] = NegLogAdd(alpha[a.to], alpha[a.from] + arc_cost(a));
  for (int64_t i = 0; i < N; ++i)
    if (lat->nodes[i].final_cost != kInf) beta[i] = lat->nodes[i].final_cost;
  for (int64_t k = (int64_t)lat->arcs.size() - 1; k >= 0; --k) {
    const LatArc& a = lat->arcs[k];
    beta[a.from] = NegLogAdd(beta[a.from], beta[a.to] + arc_cost(a));
  }
  double logZ = kInf;
  for (int64_t i = 0; i < N; ++i)
    if (lat->nodes[i].final_cost != kInf)
      logZ = NegLogAdd(logZ, alpha[i] + lat->nodes[i].final_cost);
  if (logZ == kInf) return -1;

  std::vector<double> best;
  std::vector<int64_t> best_arc;
  BestPathCosts(lat, ac_scale, &best, &best_arc);
  double best_total = kInf;
  int32_t best_node = -1;
  for (int64_t i = 0; i < N; ++i) {
    if (lat->nodes[i].final_cost == kInf) continue;
    double c = best[i] + lat->nodes[i].final_cost;
    if (c < best_total) {
      best_total = c;
      best_node = (int32_t)i;
    }
  }
  if (best_node < 0) return -1;
  std::vector<int32_t> rev_lab, rev_frm;
  std::vector<float> rev_conf;
  int32_t node = best_node;
  while (node != lat->start_node && best_arc[node] >= 0) {
    const LatArc& a = lat->arcs[best_arc[node]];
    if (a.olabel != 0) {
      rev_lab.push_back(a.olabel);
      rev_frm.push_back(lat->nodes[a.to].frame);
      // posterior of all paths through this arc
      double post = std::exp(logZ - (alpha[a.from] + arc_cost(a) +
                                     beta[a.to]));
      rev_conf.push_back((float)std::min(post, 1.0));
    }
    node = a.from;
  }
  int64_t n = (int64_t)rev_lab.size();
  if (n > max_out) n = max_out;
  for (int64_t i = 0; i < n; ++i) {
    out_labels[i] = rev_lab[rev_lab.size() - 1 - i];
    out_frames[i] = rev_frm[rev_frm.size() - 1 - i];
    out_conf[i] = rev_conf[rev_conf.size() - 1 - i];
  }
  return n;
}

int64_t pkc_lattice_best_path(const PkcLattice* lat, double ac_scale,
                              int32_t* out_labels, int64_t max_out) {
  const int64_t N = (int64_t)lat->nodes.size();
  std::vector<double> best;
  std::vector<int64_t> best_arc;
  BestPathCosts(lat, ac_scale, &best, &best_arc);
  double best_total = kInf;
  int32_t best_node = -1;
  for (int64_t i = 0; i < N; ++i) {
    if (lat->nodes[i].final_cost == kInf) continue;
    double c = best[i] + lat->nodes[i].final_cost;
    if (c < best_total) {
      best_total = c;
      best_node = (int32_t)i;
    }
  }
  if (best_node < 0) return -1;
  std::vector<int32_t> rev;
  int32_t node = best_node;
  while (node != lat->start_node && best_arc[node] >= 0) {
    const LatArc& a = lat->arcs[best_arc[node]];
    if (a.olabel != 0) rev.push_back(a.olabel);
    node = a.from;
  }
  int64_t n = (int64_t)rev.size();
  if (n > max_out) n = max_out;
  for (int64_t i = 0; i < n; ++i) out_labels[i] = rev[rev.size() - 1 - i];
  return n;
}

}  // extern "C"

void pkc_decode_lattice_batch(const PkcFst* fst, const float* loglikes,
                              const int64_t* offsets, int64_t N,
                              int64_t S, double beam, double lat_beam,
                              int64_t max_active, double acwt,
                              PkcLattice** out_lats, int64_t n_threads) {
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
      out_lats[i] = pkc_decode_lattice(fst, loglikes + offsets[i] * S, T,
                                       S, beam, lat_beam, max_active,
                                       acwt);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve((size_t)n_threads);
  for (int64_t k = 0; k < n_threads; ++k) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}
