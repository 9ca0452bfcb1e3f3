// Multithreaded substructure matcher: label painting + BFS frontier join.
//
// Native counterpart of the reference's GPU substructure engine
// (src/substruct/): SMARTS atom predicates arrive as postfix boolean
// instruction sequences (boolean_tree.cuh role), labels are painted per
// (target, query-atom) (graph_labeler.cuh role), recursive patterns are
// evaluated leaf-first per target into root masks
// (recursive_preprocessor.cu role), and matching extends partial
// assignments in BFS order over a dense frontier
// (substruct_algos.cuh gsiBFSSearchGPU role). Work is split over a
// thread pool by (target, query) pair.
//
// Semantics mirror nvmolkit_tpu/ops/substruct.py find_matches exactly:
// same traversal order, frontier cap, uniquify-by-atom-set, max_matches
// truncation, and overflow flagging — the Python engine doubles as this
// engine's differential oracle in tests.
//
// Build: g++ -O3 -shared -fPIC -std=c++20 -pthread
#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <set>
#include <thread>
#include <vector>

namespace {

constexpr int64_t kMaxFrontier = 1 << 16;  // matches ops/substruct.MAX_FRONTIER

// postfix opcodes (must match chem/native_substruct.py)
enum Op : uint8_t {
  OP_TRUE = 0,
  OP_LEAF_EQ = 1,   // a = feature index, b = value
  OP_NOT = 2,
  OP_AND = 3,
  OP_OR = 4,
  OP_RECURSIVE = 5, // a = pattern id
};

// query bond flag bits (kind_mask): bit k set = bond type code k allowed
constexpr uint8_t kFlagNegate = 1;
constexpr uint8_t kFlagAny = 2;
constexpr uint8_t kFlagRing = 4;

struct GraphSpec {
  // one query or one recursive pattern
  int32_t n_atoms = 0;
  // per atom: [start, end) into instr arrays
  std::vector<std::pair<int64_t, int64_t>> atom_instr;
  // bonds
  std::vector<int32_t> b_begin, b_end;
  std::vector<uint8_t> b_kind_mask, b_flags;
  // adjacency: per atom, (neighbor, bond idx) in bond order
  std::vector<std::vector<std::pair<int32_t, int32_t>>> adj;

  void finalize() {
    adj.assign(n_atoms, {});
    for (size_t bi = 0; bi < b_begin.size(); ++bi) {
      adj[b_begin[bi]].push_back({b_end[bi], (int32_t)bi});
      adj[b_end[bi]].push_back({b_begin[bi], (int32_t)bi});
    }
  }
};

struct Inputs {
  int32_t n_targets = 0, n_queries = 0, n_features = 0;
  const int32_t* t_natoms = nullptr;
  const int64_t* t_feat_off = nullptr;  // [T+1] atom offsets
  const int32_t* feats = nullptr;       // [sum_nt, NF]
  const int64_t* t_adj_off = nullptr;   // [T+1] nt*nt block offsets
  const uint8_t* adj_kind = nullptr;
  const uint8_t* adj_ring = nullptr;
  const uint8_t* instr_op = nullptr;
  const int32_t* instr_a = nullptr;
  const int32_t* instr_b = nullptr;
  std::vector<GraphSpec> queries;
  std::vector<GraphSpec> patterns;  // leaf-first order
  int32_t max_matches = 10000;
  bool uniquify = true;
};

struct PairResult {
  std::vector<int32_t> atoms;  // rows of nq atoms each
  bool overflow = false;
};

struct Result {
  int32_t n_targets = 0, n_queries = 0;
  std::vector<PairResult> pairs;  // t-major
};

// --- predicate evaluation ---------------------------------------------------

bool eval_atom(const Inputs& in, const GraphSpec& g, int32_t q_atom,
               const int32_t* atom_feats,  // [NF] for one target atom
               const std::vector<std::vector<uint8_t>>& pattern_masks,
               int32_t t_atom) {
  auto [s, e] = g.atom_instr[q_atom];
  bool stack[64];
  int sp = 0;
  for (int64_t i = s; i < e; ++i) {
    switch (in.instr_op[i]) {
      case OP_TRUE:
        stack[sp++] = true;
        break;
      case OP_LEAF_EQ:
        stack[sp++] = atom_feats[in.instr_a[i]] == in.instr_b[i];
        break;
      case OP_RECURSIVE:
        stack[sp++] = pattern_masks[in.instr_a[i]][t_atom] != 0;
        break;
      case OP_NOT:
        stack[sp - 1] = !stack[sp - 1];
        break;
      case OP_AND:
        stack[sp - 2] = stack[sp - 2] && stack[sp - 1];
        --sp;
        break;
      case OP_OR:
        stack[sp - 2] = stack[sp - 2] || stack[sp - 1];
        --sp;
        break;
    }
  }
  return sp > 0 && stack[sp - 1];
}

inline bool bond_ok(const GraphSpec& g, int32_t bi, uint8_t kind, uint8_t ring) {
  if (kind == 0) return false;  // no bond
  const uint8_t flags = g.b_flags[bi];
  bool cond;
  if (flags & kFlagAny) {
    cond = true;
  } else {
    cond = (g.b_kind_mask[bi] >> kind) & 1;
    if ((flags & kFlagRing) && ring) cond = true;
  }
  if (flags & kFlagNegate) return !cond;
  return cond;
}

// --- label painting + BFS order ----------------------------------------------

void paint_labels(const Inputs& in, const GraphSpec& g, int32_t t_idx,
                  const std::vector<std::vector<uint8_t>>& pattern_masks,
                  std::vector<uint8_t>& labels /* [nt * nq] */) {
  const int32_t nt = in.t_natoms[t_idx];
  const int64_t f0 = in.t_feat_off[t_idx];
  labels.assign((size_t)nt * g.n_atoms, 0);
  for (int32_t a = 0; a < nt; ++a) {
    const int32_t* af = in.feats + (f0 + a) * in.n_features;
    for (int32_t q = 0; q < g.n_atoms; ++q) {
      labels[(size_t)a * g.n_atoms + q] =
          eval_atom(in, g, q, af, pattern_masks, a);
    }
  }
}

// Mirrors Python _bfs_order: start at fewest-candidate atom, then the
// lowest-index unplaced atom with a placed neighbor.
struct Order {
  std::vector<int32_t> atom;                                  // slot -> query atom
  std::vector<std::vector<std::pair<int32_t, int32_t>>> back; // slot -> (placed slot, bond)
  bool ok = true;
};

Order bfs_order(const GraphSpec& g, const std::vector<uint8_t>& labels, int32_t nt) {
  Order o;
  const int32_t nq = g.n_atoms;
  std::vector<int64_t> counts(nq, 0);
  for (int32_t a = 0; a < nt; ++a)
    for (int32_t q = 0; q < nq; ++q) counts[q] += labels[(size_t)a * nq + q];
  int32_t start = (int32_t)(std::min_element(counts.begin(), counts.end()) - counts.begin());

  std::vector<int32_t> slot_of(nq, -1);
  slot_of[start] = 0;
  o.atom.push_back(start);
  o.back.push_back({});
  while ((int32_t)o.atom.size() < nq) {
    int32_t next = -1;
    std::vector<std::pair<int32_t, int32_t>> back;
    for (int32_t q = 0; q < nq && next < 0; ++q) {
      if (slot_of[q] >= 0) continue;
      for (auto [nb, bi] : g.adj[q]) {
        if (slot_of[nb] >= 0) back.push_back({slot_of[nb], bi});
      }
      if (!back.empty()) next = q;
    }
    if (next < 0) {  // disconnected query: caller splits components
      o.ok = false;
      return o;
    }
    slot_of[next] = (int32_t)o.atom.size();
    o.atom.push_back(next);
    o.back.push_back(std::move(back));
  }
  return o;
}

// --- the join ---------------------------------------------------------------

void find_matches(const Inputs& in, const GraphSpec& g, int32_t t_idx,
                  const std::vector<uint8_t>& labels, int32_t max_matches,
                  bool uniquify, PairResult& out) {
  const int32_t nt = in.t_natoms[t_idx];
  const int32_t nq = g.n_atoms;
  out.atoms.clear();
  out.overflow = false;
  if (nq == 0) return;
  bool any = false;
  for (size_t i = 0; i < labels.size() && !any; ++i) any = labels[i];
  if (!any) return;

  Order order = bfs_order(g, labels, nt);
  if (!order.ok) return;  // caller handles disconnected queries

  const uint8_t* akind = in.adj_kind + in.t_adj_off[t_idx];
  const uint8_t* aring = in.adj_ring + in.t_adj_off[t_idx];

  // frontier: rows of `depth` target atoms
  std::vector<int32_t> frontier;
  frontier.reserve(256);
  for (int32_t a = 0; a < nt; ++a)
    if (labels[(size_t)a * nq + order.atom[0]]) frontier.push_back(a);

  int32_t depth = 1;
  std::vector<int32_t> next;
  for (; depth < nq && !frontier.empty(); ++depth) {
    const int32_t q = order.atom[depth];
    const auto& back = order.back[depth];
    next.clear();
    const int64_t rows = (int64_t)frontier.size() / depth;
    bool overflowed = false;
    for (int64_t r = 0; r < rows && !overflowed; ++r) {
      const int32_t* row = frontier.data() + r * depth;
      for (int32_t a = 0; a < nt; ++a) {
        if (!labels[(size_t)a * nq + q]) continue;
        bool ok = true;
        for (auto [slot, bi] : back) {
          const int32_t u = row[slot];
          if (!bond_ok(g, bi, akind[(size_t)u * nt + a], aring[(size_t)u * nt + a])) {
            ok = false;
            break;
          }
        }
        if (!ok) continue;
        // injectivity
        for (int32_t s = 0; s < depth; ++s)
          if (row[s] == a) { ok = false; break; }
        if (!ok) continue;
        if ((int64_t)next.size() / (depth + 1) >= kMaxFrontier) {
          out.overflow = true;
          overflowed = true;
          break;
        }
        next.insert(next.end(), row, row + depth);
        next.push_back(a);
      }
    }
    frontier.swap(next);
  }

  if (depth < nq || frontier.empty()) return;

  // reorder slots -> query-atom order; uniquify by atom set; cap
  std::vector<int32_t> perm(nq);
  for (int32_t slot = 0; slot < nq; ++slot) perm[order.atom[slot]] = slot;
  const int64_t rows = (int64_t)frontier.size() / nq;
  std::set<std::vector<int32_t>> seen;
  std::vector<int32_t> key;
  int64_t emitted = 0;
  for (int64_t r = 0; r < rows; ++r) {
    const int32_t* row = frontier.data() + r * nq;
    if (uniquify) {
      key.assign(row, row + nq);
      std::sort(key.begin(), key.end());
      if (!seen.insert(key).second) continue;
    }
    if (emitted >= max_matches) {
      out.overflow = true;
      break;
    }
    for (int32_t q = 0; q < nq; ++q) out.atoms.push_back(row[perm[q]]);
    ++emitted;
  }
}

// VF2-style depth-first matcher: enumerates every complete assignment
// with an explicit candidate stack (the reference's second algorithm,
// substruct_algos.cuh:95-250 vf2SearchGPU). Same slot order and
// candidate order (ascending target atom) as the Python oracle
// ops/substruct.find_matches_vf2, so results agree row-for-row;
// overflow semantics mirror that oracle (flag set when the uniquified
// match count reaches max_matches). No frontier, so kMaxFrontier never
// applies — high-multiplicity pairs that overflow the BFS join resolve
// here.
void find_matches_vf2(const Inputs& in, const GraphSpec& g, int32_t t_idx,
                      const std::vector<uint8_t>& labels, int32_t max_matches,
                      bool uniquify, PairResult& out) {
  const int32_t nt = in.t_natoms[t_idx];
  const int32_t nq = g.n_atoms;
  out.atoms.clear();
  out.overflow = false;
  if (nq == 0) return;
  bool any = false;
  for (size_t i = 0; i < labels.size() && !any; ++i) any = labels[i];
  if (!any) return;

  Order order = bfs_order(g, labels, nt);
  if (!order.ok) return;  // caller handles disconnected queries

  const uint8_t* akind = in.adj_kind + in.t_adj_off[t_idx];
  const uint8_t* aring = in.adj_ring + in.t_adj_off[t_idx];

  std::vector<int32_t> assign(nq, -1);
  std::vector<uint8_t> used(nt, 0);
  std::vector<int32_t> stack_cand(nq, 0);
  std::set<std::vector<int32_t>> seen;
  std::vector<int32_t> row(nq), key(nq);
  int64_t emitted = 0;

  int32_t d = 0;
  stack_cand[0] = 0;
  while (d >= 0) {
    const int32_t q = order.atom[d];
    int32_t a = stack_cand[d];
    bool advanced = false;
    for (; a < nt; ++a) {
      if (used[a] || !labels[(size_t)a * nq + q]) continue;
      bool ok = true;
      for (auto [slot, bi] : order.back[d]) {
        const int32_t u = assign[slot];
        if (!bond_ok(g, bi, akind[(size_t)u * nt + a],
                     aring[(size_t)u * nt + a])) {
          ok = false;
          break;
        }
      }
      if (!ok) continue;
      assign[d] = a;
      stack_cand[d] = a + 1;
      if (d + 1 == nq) {
        // complete match: emit in query-atom order
        for (int32_t slot = 0; slot < nq; ++slot)
          row[order.atom[slot]] = assign[slot];
        bool fresh = true;
        if (uniquify) {
          key = row;
          std::sort(key.begin(), key.end());
          fresh = seen.insert(key).second;
        }
        if (fresh) {
          out.atoms.insert(out.atoms.end(), row.begin(), row.end());
          if (++emitted >= max_matches) {
            out.overflow = true;
            return;
          }
        }
        // stay at this depth; next candidate
      } else {
        used[a] = 1;
        ++d;
        stack_cand[d] = 0;
      }
      advanced = true;
      break;
    }
    if (!advanced) {
      --d;
      if (d >= 0) {
        used[assign[d]] = 0;
        assign[d] = -1;
      }
    }
  }
}

// recursive-pattern root mask: atoms where a match rooted at pattern atom 0
// exists (DFS with early exit per root)
void pattern_roots(const Inputs& in, const GraphSpec& g, int32_t t_idx,
                   const std::vector<std::vector<uint8_t>>& deeper_masks,
                   std::vector<uint8_t>& roots) {
  const int32_t nt = in.t_natoms[t_idx];
  const int32_t nq = g.n_atoms;
  roots.assign(nt, 0);
  std::vector<uint8_t> labels;
  paint_labels(in, g, t_idx, deeper_masks, labels);

  const uint8_t* akind = in.adj_kind + in.t_adj_off[t_idx];
  const uint8_t* aring = in.adj_ring + in.t_adj_off[t_idx];

  // order rooted at pattern atom 0
  std::vector<int32_t> slot_of(nq, -1), atom_order;
  std::vector<std::vector<std::pair<int32_t, int32_t>>> back_order;
  slot_of[0] = 0;
  atom_order.push_back(0);
  back_order.push_back({});
  while ((int32_t)atom_order.size() < nq) {
    int32_t nxt = -1;
    std::vector<std::pair<int32_t, int32_t>> back;
    for (int32_t q = 0; q < nq && nxt < 0; ++q) {
      if (slot_of[q] >= 0) continue;
      for (auto [nb, bi] : g.adj[q])
        if (slot_of[nb] >= 0) back.push_back({slot_of[nb], bi});
      if (!back.empty()) nxt = q;
    }
    if (nxt < 0) return;  // disconnected pattern: no roots
    slot_of[nxt] = (int32_t)atom_order.size();
    atom_order.push_back(nxt);
    back_order.push_back(std::move(back));
  }

  std::vector<int32_t> assign(nq, -1);
  std::vector<uint8_t> used(nt, 0);

  // iterative DFS with early exit (one match rooted at t0 suffices)
  struct Frame { int32_t cand; };
  std::vector<int32_t> stack_cand(nq, 0);
  for (int32_t t0 = 0; t0 < nt; ++t0) {
    if (!labels[(size_t)t0 * nq + atom_order[0]]) continue;
    if (nq == 1) { roots[t0] = 1; continue; }
    assign[0] = t0;
    used[t0] = 1;
    int32_t d = 1;
    stack_cand[1] = 0;
    bool found = false;
    while (d >= 1 && !found) {
      const int32_t q = atom_order[d];
      int32_t a = stack_cand[d];
      bool advanced = false;
      for (; a < nt; ++a) {
        if (used[a] || !labels[(size_t)a * nq + q]) continue;
        bool ok = true;
        for (auto [slot, bi] : back_order[d]) {
          const int32_t u = assign[slot];
          if (!bond_ok(g, bi, akind[(size_t)u * nt + a], aring[(size_t)u * nt + a])) {
            ok = false;
            break;
          }
        }
        if (!ok) continue;
        assign[d] = a;
        used[a] = 1;
        stack_cand[d] = a + 1;
        if (d + 1 == nq) {
          found = true;
        } else {
          ++d;
          stack_cand[d] = 0;
        }
        advanced = true;
        break;
      }
      if (found) break;
      if (!advanced) {
        --d;
        if (d >= 1) {
          used[assign[d]] = 0;
          assign[d] = -1;
        }
      }
    }
    // unwind
    for (int32_t s = 1; s < nq; ++s)
      if (assign[s] >= 0) { used[assign[s]] = 0; assign[s] = -1; }
    used[t0] = 0;
    assign[0] = -1;
    if (found) roots[t0] = 1;
  }
}

}  // namespace

extern "C" {

void* nvmk_substruct_search(
    int32_t n_targets, const int32_t* t_natoms, const int64_t* t_feat_off,
    const int32_t* feats, int32_t n_features, const int64_t* t_adj_off,
    const uint8_t* adj_kind, const uint8_t* adj_ring,
    // flattened instruction pool
    const uint8_t* instr_op, const int32_t* instr_a, const int32_t* instr_b,
    // queries: per-atom instruction ranges + bonds (all CSR over queries)
    int32_t n_queries, const int32_t* q_natoms, const int64_t* q_atom_off,
    const int64_t* atom_instr_start, const int64_t* atom_instr_end,
    const int64_t* q_bond_off, const int32_t* qb_begin, const int32_t* qb_end,
    const uint8_t* qb_kind_mask, const uint8_t* qb_flags,
    // recursive patterns (leaf-first), same layout
    int32_t n_patterns, const int32_t* p_natoms, const int64_t* p_atom_off,
    const int64_t* p_atom_instr_start, const int64_t* p_atom_instr_end,
    const int64_t* p_bond_off, const int32_t* pb_begin, const int32_t* pb_end,
    const uint8_t* pb_kind_mask, const uint8_t* pb_flags,
    int32_t max_matches, int32_t uniquify, int32_t algorithm,
    int32_t n_threads) {
  Inputs in;
  in.n_targets = n_targets;
  in.n_queries = n_queries;
  in.n_features = n_features;
  in.t_natoms = t_natoms;
  in.t_feat_off = t_feat_off;
  in.feats = feats;
  in.t_adj_off = t_adj_off;
  in.adj_kind = adj_kind;
  in.adj_ring = adj_ring;
  in.instr_op = instr_op;
  in.instr_a = instr_a;
  in.instr_b = instr_b;
  in.max_matches = max_matches;
  in.uniquify = uniquify != 0;

  auto build = [&](int32_t n, const int32_t* natoms, const int64_t* atom_off,
                   const int64_t* is, const int64_t* ie, const int64_t* bond_off,
                   const int32_t* bb, const int32_t* be, const uint8_t* km,
                   const uint8_t* fl, std::vector<GraphSpec>& out_specs) {
    out_specs.resize(n);
    for (int32_t i = 0; i < n; ++i) {
      GraphSpec& g = out_specs[i];
      g.n_atoms = natoms[i];
      for (int64_t a = atom_off[i]; a < atom_off[i + 1]; ++a)
        g.atom_instr.push_back({is[a], ie[a]});
      for (int64_t b = bond_off[i]; b < bond_off[i + 1]; ++b) {
        g.b_begin.push_back(bb[b]);
        g.b_end.push_back(be[b]);
        g.b_kind_mask.push_back(km[b]);
        g.b_flags.push_back(fl[b]);
      }
      g.finalize();
    }
  };
  build(n_queries, q_natoms, q_atom_off, atom_instr_start, atom_instr_end,
        q_bond_off, qb_begin, qb_end, qb_kind_mask, qb_flags, in.queries);
  build(n_patterns, p_natoms, p_atom_off, p_atom_instr_start, p_atom_instr_end,
        p_bond_off, pb_begin, pb_end, pb_kind_mask, pb_flags, in.patterns);

  auto* res = new Result();
  res->n_targets = n_targets;
  res->n_queries = n_queries;
  res->pairs.resize((size_t)n_targets * n_queries);

  if (n_threads < 1)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min<int32_t>(n_threads, std::max(1, n_targets));

  // phase 1: per-target recursive pattern masks (leaf-first evaluation)
  std::vector<std::vector<std::vector<uint8_t>>> masks(n_targets);
  {
    std::atomic<int32_t> cursor{0};
    auto worker = [&]() {
      for (;;) {
        int32_t t = cursor.fetch_add(1);
        if (t >= n_targets) return;
        auto& tm = masks[t];
        tm.resize(in.patterns.size());
        for (size_t p = 0; p < in.patterns.size(); ++p)
          pattern_roots(in, in.patterns[p], t, tm, tm[p]);
      }
    };
    std::vector<std::thread> pool;
    for (int32_t i = 1; i < n_threads; ++i) pool.emplace_back(worker);
    worker();
    for (auto& th : pool) th.join();
  }

  // phase 2: (target, query) pairs
  {
    std::atomic<int64_t> cursor{0};
    const int64_t n_pairs = (int64_t)n_targets * n_queries;
    auto worker = [&]() {
      std::vector<uint8_t> labels;
      for (;;) {
        int64_t p = cursor.fetch_add(1);
        if (p >= n_pairs) return;
        const int32_t t = (int32_t)(p / n_queries);
        const int32_t q = (int32_t)(p % n_queries);
        paint_labels(in, in.queries[q], t, masks[t], labels);
        if (algorithm == 1)
          find_matches_vf2(in, in.queries[q], t, labels, in.max_matches,
                           in.uniquify, res->pairs[p]);
        else
          find_matches(in, in.queries[q], t, labels, in.max_matches,
                       in.uniquify, res->pairs[p]);
      }
    };
    std::vector<std::thread> pool;
    for (int32_t i = 1; i < n_threads; ++i) pool.emplace_back(worker);
    worker();
    for (auto& th : pool) th.join();
  }

  return res;
}

// per-pair ATOM totals (row count = total / query width, known Python-side)
void nvmk_substruct_counts(void* h, int64_t* out) {
  auto* res = static_cast<Result*>(h);
  for (size_t p = 0; p < res->pairs.size(); ++p)
    out[p] = (int64_t)res->pairs[p].atoms.size();
}

void nvmk_substruct_overflows(void* h, uint8_t* out) {
  auto* res = static_cast<Result*>(h);
  for (size_t p = 0; p < res->pairs.size(); ++p) out[p] = res->pairs[p].overflow;
}

int64_t nvmk_substruct_total_atoms(void* h) {
  auto* res = static_cast<Result*>(h);
  int64_t total = 0;
  for (auto& pr : res->pairs) total += (int64_t)pr.atoms.size();
  return total;
}

void nvmk_substruct_copy_atoms(void* h, int32_t* out) {
  auto* res = static_cast<Result*>(h);
  int64_t cur = 0;
  for (auto& pr : res->pairs) {
    std::memcpy(out + cur, pr.atoms.data(), pr.atoms.size() * sizeof(int32_t));
    cur += (int64_t)pr.atoms.size();
  }
}

void nvmk_substruct_free(void* h) { delete static_cast<Result*>(h); }

}  // extern "C"
