// Native ETKDG experimental-torsion library matcher.
//
// TPU-native counterpart of the reference's CPU torsion-preference
// preprocessing (the CrystalFF torsion-library walk inherited through
// rdkit_extensions/dist_geom_flattened_builder.cpp:5 and the OpenMP
// preprocessing parallelism role at src/etkdg.cpp:172-190): the
// rotor-anchored SMARTS-library matcher of
// nvmolkit_tpu/models/etkdg_torsions.py, re-implemented as a flat
// compiled-rule executor. Python compiles the library ONCE into flat
// postfix atom-expression programs + bond-code masks + anchored match
// plans; this module executes them over a batch of molecules in a
// single ctypes call. The Python matcher remains the differential
// oracle (tests/test_torsion_library.py asserts identical claims).
//
// Semantics mirrored exactly (claim order, first-rule-per-central-bond,
// ascending-neighbor DFS, ring-tier classification via smallest ring
// through the bond, BFS cap 24 as in chem/rings.py).
//
// Build: part of csrc/Makefile (libnvmoletk.so). C ABI only; ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>

namespace {

// postfix atom-expression opcodes (compiled from chem/smarts.py Exprs)
enum Op : int32_t {
  OP_LEAF = 0,   // push feats[atom * n_props + a] == b
  OP_TRUE = 1,   // push true
  OP_NOT = 2,    // pop x, push !x
  OP_AND = 3,    // pop y, x, push x && y
  OP_OR = 4,     // pop y, x, push x || y
};

struct Rule {
  int32_t quad[4];
  int32_t ring_code;
  int32_t pj, pk;
  int32_t central_bid;
  int32_t n_qatoms;
  const int32_t* aeids;      // [n_qatoms]
  const int32_t* steps;      // [n_steps][3] (new_atom, from_atom, bond_id)
  int32_t n_steps;
  const int32_t* clos;       // [n_clos][3] (atom_a, atom_b, bond_id)
  int32_t n_clos;
  uint64_t elem_mask;
};

struct Library {
  int32_t n_props = 0;
  std::vector<int32_t> expr_prog;   // flat (op, a, b) triples
  std::vector<int32_t> expr_off;    // [n_exprs + 1] triple offsets
  std::vector<uint16_t> bond_masks; // accept mask over code = kind + 8*ring
  std::vector<int32_t> aeids, steps, clos;
  std::vector<Rule> rules;
};

// evaluate one postfix program for one atom (feature row base pointer)
bool eval_expr(const Library& lib, int32_t eid, const int32_t* feat_row) {
  bool stack[32];
  int sp = 0;
  const int32_t* prog = lib.expr_prog.data();
  for (int32_t i = lib.expr_off[eid]; i < lib.expr_off[eid + 1]; ++i) {
    int32_t op = prog[3 * i], a = prog[3 * i + 1], b = prog[3 * i + 2];
    switch (op) {
      case OP_LEAF: stack[sp++] = feat_row[a] == b; break;
      case OP_TRUE: stack[sp++] = true; break;
      case OP_NOT: stack[sp - 1] = !stack[sp - 1]; break;
      case OP_AND: --sp; stack[sp - 1] = stack[sp - 1] && stack[sp]; break;
      case OP_OR: --sp; stack[sp - 1] = stack[sp - 1] || stack[sp]; break;
    }
  }
  return stack[0];
}

struct MolView {
  int32_t n_atoms, n_bonds;
  const int32_t* feats;       // [n_atoms, n_props]
  const int32_t* bond_atoms;  // [n_bonds, 2]
  const uint8_t* bond_code;   // [n_bonds] kind + 8*in_ring
  // derived
  std::vector<std::vector<std::pair<int32_t, uint8_t>>> adj;  // (nbr, code) asc
  std::vector<int8_t> bond_class;  // 0 acyclic 1 small 2 mid 3 macro
};

// smallest ring through bond bi: BFS avoiding the bond, cap 24
// (mirrors nvmolkit_tpu/chem/rings.py:_smallest_ring_through_bond)
int smallest_ring_through_bond(const MolView& m, int32_t bi) {
  int32_t start = m.bond_atoms[2 * bi], goal = m.bond_atoms[2 * bi + 1];
  std::vector<int32_t> dist(m.n_atoms, -1);
  std::deque<int32_t> q{start};
  dist[start] = 0;
  while (!q.empty()) {
    int32_t u = q.front();
    q.pop_front();
    if (dist[u] >= 24) break;
    for (auto [v, code] : m.adj[u]) {
      // skip the excluded bond itself (identified by endpoint pair)
      if ((u == start && v == goal) || (u == goal && v == start)) {
        // only skip the direct edge, which is bond bi (no multi-edges)
        continue;
      }
      if (dist[v] == -1) {
        dist[v] = dist[u] + 1;
        if (v == goal) return dist[v] + 1;
        q.push_back(v);
      }
    }
  }
  return 0;
}

void build_mol_view(MolView& m, int32_t macro_min) {
  m.adj.assign(m.n_atoms, {});
  for (int32_t bi = 0; bi < m.n_bonds; ++bi) {
    int32_t a = m.bond_atoms[2 * bi], b = m.bond_atoms[2 * bi + 1];
    m.adj[a].push_back({b, m.bond_code[bi]});
    m.adj[b].push_back({a, m.bond_code[bi]});
  }
  for (auto& lst : m.adj) std::sort(lst.begin(), lst.end());
  m.bond_class.assign(m.n_bonds, 0);
  for (int32_t bi = 0; bi < m.n_bonds; ++bi) {
    if (!(m.bond_code[bi] >> 3)) continue;  // acyclic
    int size = smallest_ring_through_bond(m, bi);
    int8_t cls;
    if (size && size <= 6) cls = 1;            // small
    else if (!size || size >= macro_min) cls = 3;  // macro
    else cls = 2;                               // mid
    m.bond_class[bi] = cls;
  }
}

uint8_t code_between(const MolView& m, int32_t a, int32_t b) {
  for (auto [v, code] : m.adj[a])
    if (v == b) return code;
  return 0;
}

// anchored DFS extension (mirrors ExperimentalTorsionProvider
// ._match_anchored: ascending-neighbor candidate order, first match wins)
bool extend_plan(const Library& lib, const Rule& r, const MolView& m,
                 const std::vector<std::vector<uint8_t>>& labels,
                 int32_t si, int32_t* mapping, uint8_t* used) {
  if (si == r.n_steps) {
    for (int32_t c = 0; c < r.n_clos; ++c) {
      int32_t pa = r.clos[3 * c], pb = r.clos[3 * c + 1],
              be = r.clos[3 * c + 2];
      uint8_t code = code_between(m, mapping[pa], mapping[pb]);
      if (!((lib.bond_masks[be] >> code) & 1)) return false;
    }
    return true;
  }
  int32_t pa = r.steps[3 * si], pfrom = r.steps[3 * si + 1],
          be = r.steps[3 * si + 2];
  int32_t base = mapping[pfrom];
  const auto& lab = labels[r.aeids[pa]];
  uint16_t bmask = lib.bond_masks[be];
  for (auto [cand, code] : m.adj[base]) {
    if (used[cand] || !lab[cand] || !((bmask >> code) & 1)) continue;
    mapping[pa] = cand;
    used[cand] = 1;
    if (extend_plan(lib, r, m, labels, si + 1, mapping, used)) return true;
    used[cand] = 0;
  }
  return false;
}

}  // namespace

extern "C" {

void* nvmk_etk_compile(
    int32_t n_props, int32_t n_exprs, const int32_t* expr_prog,
    const int32_t* expr_off, int32_t n_bexprs, const uint16_t* bond_masks,
    int32_t n_rules, const int32_t* rule_tab /* [n_rules, 9] */,
    const uint64_t* elem_masks, const int32_t* aeids,
    const int32_t* aeid_off /* [n_rules + 1] */, const int32_t* steps,
    const int32_t* step_off /* [n_rules + 1] */, const int32_t* clos,
    const int32_t* clo_off /* [n_rules + 1] */) {
  auto* lib = new Library();
  lib->n_props = n_props;
  lib->expr_prog.assign(expr_prog, expr_prog + 3 * expr_off[n_exprs]);
  lib->expr_off.assign(expr_off, expr_off + n_exprs + 1);
  lib->bond_masks.assign(bond_masks, bond_masks + n_bexprs);
  lib->aeids.assign(aeids, aeids + aeid_off[n_rules]);
  lib->steps.assign(steps, steps + 3 * step_off[n_rules]);
  lib->clos.assign(clos, clos + 3 * clo_off[n_rules]);
  lib->rules.resize(n_rules);
  for (int32_t r = 0; r < n_rules; ++r) {
    const int32_t* row = rule_tab + 9 * r;
    Rule& rule = lib->rules[r];
    rule.quad[0] = row[0]; rule.quad[1] = row[1];
    rule.quad[2] = row[2]; rule.quad[3] = row[3];
    rule.ring_code = row[4];
    rule.pj = row[5]; rule.pk = row[6];
    rule.central_bid = row[7];
    rule.n_qatoms = row[8];
    rule.aeids = lib->aeids.data() + aeid_off[r];
    rule.steps = lib->steps.data() + 3 * step_off[r];
    rule.n_steps = step_off[r + 1] - step_off[r];
    rule.clos = lib->clos.data() + 3 * clo_off[r];
    rule.n_clos = clo_off[r + 1] - clo_off[r];
    rule.elem_mask = elem_masks[r];
  }
  return lib;
}

void nvmk_etk_free(void* h) { delete static_cast<Library*>(h); }

// Match the compiled library against a batch of molecules.
// feats: concatenated [n_atoms_i, n_props] int32 blocks (atom-major).
// Outputs are claim rows in (molecule, rule-order) order:
//   out_mol [max_out], out_rule [max_out], out_quad [max_out, 4].
// Returns the number of rows written, or -1 if max_out was too small
// (max_out = total bond count is always sufficient: one claim per
// central bond).
int64_t nvmk_etk_match_batch(
    void* h, int32_t n_mols, const int32_t* n_atoms,
    const int64_t* atom_off, const int32_t* feats, const int32_t* n_bonds,
    const int64_t* bond_off, const int32_t* bond_atoms,
    const uint8_t* bond_code, const uint64_t* mol_elem_mask,
    int32_t macro_min, int64_t max_out, int32_t* out_mol, int32_t* out_rule,
    int32_t* out_quad) {
  auto& lib = *static_cast<Library*>(h);
  int64_t n_out = 0;

  std::vector<std::vector<uint8_t>> labels(lib.expr_off.size() - 1);
  std::vector<int8_t> lab_state;   // 0 unevaluated, 1 empty, 2 has-any
  std::vector<uint8_t> claimed;
  int32_t mapping[64];
  uint8_t used[512];

  for (int32_t mi = 0; mi < n_mols; ++mi) {
    MolView m;
    m.n_atoms = n_atoms[mi];
    m.n_bonds = n_bonds[mi];
    if (m.n_atoms > 512) continue;  // caller drains oversize to Python
    m.feats = feats + atom_off[mi] * lib.n_props;
    m.bond_atoms = bond_atoms + 2 * bond_off[mi];
    m.bond_code = bond_code + bond_off[mi];
    build_mol_view(m, macro_min);

    lab_state.assign(labels.size(), 0);
    claimed.assign(m.n_bonds, 0);
    uint64_t mmask = mol_elem_mask[mi];

    auto label_of = [&](int32_t eid) -> const std::vector<uint8_t>& {
      if (!lab_state[eid]) {
        auto& v = labels[eid];
        v.assign(m.n_atoms, 0);
        bool any = false;
        for (int32_t a = 0; a < m.n_atoms; ++a) {
          v[a] = eval_expr(lib, eid, m.feats + (int64_t)a * lib.n_props);
          any |= v[a];
        }
        lab_state[eid] = any ? 2 : 1;
      }
      return labels[eid];
    };

    for (size_t ri = 0; ri < lib.rules.size(); ++ri) {
      const Rule& r = lib.rules[ri];
      if ((r.elem_mask & mmask) != r.elem_mask) continue;
      int32_t eid_j = r.aeids[r.pj], eid_k = r.aeids[r.pk];
      label_of(eid_j);
      if (lab_state[eid_j] == 1) continue;
      label_of(eid_k);
      if (lab_state[eid_k] == 1) continue;
      const auto& lj = labels[eid_j];
      const auto& lk = labels[eid_k];
      uint16_t cmask = lib.bond_masks[r.central_bid];
      // both orientations of every bond, (begin,end) block first —
      // the Python matcher's [2B] bond-list order
      for (int32_t h2 = 0; h2 < 2 * m.n_bonds; ++h2) {
        int32_t bi = h2 % m.n_bonds;
        if (claimed[bi]) continue;
        if (m.bond_class[bi] != r.ring_code) continue;
        uint8_t code = m.bond_code[bi];
        if (!((cmask >> code) & 1)) continue;
        int32_t j = m.bond_atoms[2 * bi], k = m.bond_atoms[2 * bi + 1];
        if (h2 >= m.n_bonds) std::swap(j, k);
        if (!lj[j] || !lk[k]) continue;
        // anchored DFS from {pj: j, pk: k}
        std::memset(used, 0, m.n_atoms);
        for (int32_t q = 0; q < r.n_qatoms; ++q) mapping[q] = -1;
        mapping[r.pj] = j;
        mapping[r.pk] = k;
        used[j] = used[k] = 1;
        // pre-touch labels the DFS needs (lazy is fine; extend_plan
        // reads labels[aeids[pa]] which we evaluate on demand here)
        for (int32_t s = 0; s < r.n_steps; ++s)
          label_of(r.aeids[r.steps[3 * s]]);
        if (!extend_plan(lib, r, m, labels, 0, mapping, used)) continue;
        if (n_out >= max_out) return -1;
        out_mol[n_out] = mi;
        out_rule[n_out] = (int32_t)ri;
        for (int32_t q = 0; q < 4; ++q)
          out_quad[4 * n_out + q] = mapping[r.quad[q]];
        ++n_out;
        claimed[bi] = 1;
      }
    }
  }
  return n_out;
}

}  // extern "C"
