// Native batch molecule-graph compiler.
//
// TPU-native counterpart of the reference's host-side C++ preprocessing
// layer (the RDKit-walking/flattening code paths around
// rdkit_extensions/ and src/morgan_fingerprint_common.cpp): parses a
// batch of SMILES strings into flat per-atom/per-bond arrays with a
// worker thread pool, so Python only assembles numpy views. Semantics
// match nvmolkit_tpu/chem/smiles.py exactly (the Python parser is the
// differential oracle in tests).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++20 -pthread
//        mol_graph.cpp -o libnvmolgraph.so
//
// C ABI only; loaded from Python via ctypes (no pybind11 dependency).

#include <algorithm>
#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <string>
#include <thread>
#include <vector>

namespace {

enum BondType : int32_t { SINGLE = 1, DOUBLE = 2, TRIPLE = 3, AROMATIC = 4 };

struct Atom {
  int32_t atomic_num = 0;
  int32_t charge = 0;
  bool aromatic = false;
  int32_t isotope = 0;
  int32_t explicit_hs = 0;
  bool from_bracket = false;
  int32_t chiral = 0;  // 0 none, 1 @, 2 @@
  // perceived
  int32_t implicit_hs = 0;
  bool in_ring = false;
  int32_t min_ring_size = 0;
};

struct Bond {
  int32_t a = 0, b = 0;
  int32_t type = SINGLE;
  bool in_ring = false;
};

struct Molecule {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<std::vector<int32_t>> adj;  // bond indices per atom
  std::string error;

  void build_adj() {
    adj.assign(atoms.size(), {});
    for (size_t bi = 0; bi < bonds.size(); ++bi) {
      adj[bonds[bi].a].push_back((int32_t)bi);
      adj[bonds[bi].b].push_back((int32_t)bi);
    }
  }
  int32_t other(int32_t bi, int32_t atom) const {
    return bonds[bi].a == atom ? bonds[bi].b : bonds[bi].a;
  }
};

const std::map<std::string, int> kSymbols = {
    {"H", 1},   {"He", 2},  {"Li", 3},  {"Be", 4},  {"B", 5},   {"C", 6},
    {"N", 7},   {"O", 8},   {"F", 9},   {"Ne", 10}, {"Na", 11}, {"Mg", 12},
    {"Al", 13}, {"Si", 14}, {"P", 15},  {"S", 16},  {"Cl", 17}, {"Ar", 18},
    {"K", 19},  {"Ca", 20}, {"Sc", 21}, {"Ti", 22}, {"V", 23},  {"Cr", 24},
    {"Mn", 25}, {"Fe", 26}, {"Co", 27}, {"Ni", 28}, {"Cu", 29}, {"Zn", 30},
    {"Ga", 31}, {"Ge", 32}, {"As", 33}, {"Se", 34}, {"Br", 35}, {"Kr", 36},
    {"Rb", 37}, {"Sr", 38}, {"Y", 39},  {"Zr", 40}, {"Nb", 41}, {"Mo", 42},
    {"Tc", 43}, {"Ru", 44}, {"Rh", 45}, {"Pd", 46}, {"Ag", 47}, {"Cd", 48},
    {"In", 49}, {"Sn", 50}, {"Sb", 51}, {"Te", 52}, {"I", 53},  {"Xe", 54},
    {"Cs", 55}, {"Ba", 56}, {"Pt", 78}, {"Au", 79}, {"Hg", 80}, {"Pb", 82},
    {"Bi", 83}};

const std::map<int, int> kCommonMass = {
    {1, 1},   {2, 4},   {3, 7},   {4, 9},   {5, 11},  {6, 12},  {7, 14},
    {8, 16},  {9, 19},  {10, 20}, {11, 23}, {12, 24}, {13, 27}, {14, 28},
    {15, 31}, {16, 32}, {17, 35}, {18, 40}, {19, 39}, {20, 40}, {26, 56},
    {29, 64}, {30, 65}, {33, 75}, {34, 79}, {35, 80}, {50, 119}, {53, 127}};

bool default_valences(int z, std::vector<int>& out) {
  switch (z) {
    case 5: out = {3}; return true;
    case 6: out = {4}; return true;
    case 7: out = {3}; return true;
    case 8: out = {2}; return true;
    case 15: out = {3, 5}; return true;
    case 16: out = {2, 4, 6}; return true;
    case 9: case 17: case 35: case 53: out = {1}; return true;
    default: return false;
  }
}

bool is_organic(const std::string& s) {
  static const char* kOrg[] = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"};
  for (auto* o : kOrg)
    if (s == o) return true;
  return false;
}

bool parse_bracket(const std::string& body, Atom& atom, std::string& err) {
  size_t i = 0, n = body.size();
  auto read_int = [&](int def) {
    size_t s = i;
    while (i < n && isdigit((unsigned char)body[i])) ++i;
    return s == i ? def : std::stoi(body.substr(s, i - s));
  };
  atom.isotope = read_int(0);
  if (i >= n) { err = "missing symbol"; return false; }
  // symbol (aromatic lowercase allowed)
  std::string sym;
  if (body[i] == '*') {
    sym = "*"; ++i;
  } else if (islower((unsigned char)body[i])) {
    sym += body[i++];
    if (i < n && islower((unsigned char)body[i])) {
      std::string two = sym + body[i];
      if (two == "se" || two == "as" || two == "te" || two == "si") {
        sym = two; ++i;
      }
    }
    atom.aromatic = true;
  } else if (isupper((unsigned char)body[i])) {
    sym += body[i++];
    if (i < n && islower((unsigned char)body[i]) && body[i] != 'H') {
      std::string two = sym + body[i];
      if (kSymbols.count(two)) { sym = two; ++i; }
    }
  } else {
    err = "bad symbol"; return false;
  }
  if (sym == "*") {
    atom.atomic_num = 0;
  } else {
    std::string lookup = sym;
    if (atom.aromatic) lookup[0] = (char)toupper((unsigned char)lookup[0]);
    auto it = kSymbols.find(lookup);
    if (it == kSymbols.end()) { err = "unknown element " + sym; return false; }
    atom.atomic_num = it->second;
  }
  // chirality
  if (i < n && body[i] == '@') {
    ++i;
    if (i < n && body[i] == '@') { atom.chiral = 2; ++i; }
    else {
      atom.chiral = 1;
      // swallow TH1/AL1/SP1 style classes
      if (i + 2 < n && isupper((unsigned char)body[i]) && isupper((unsigned char)body[i + 1]))
        i += 3;
    }
  }
  // H count
  if (i < n && body[i] == 'H') {
    ++i;
    atom.explicit_hs = read_int(1);
  }
  // charge
  if (i < n && (body[i] == '+' || body[i] == '-')) {
    char c = body[i];
    int count = 0;
    while (i < n && body[i] == c) { ++count; ++i; }
    if (count == 1 && i < n && isdigit((unsigned char)body[i])) count = read_int(1);
    atom.charge = (c == '+') ? count : -count;
  }
  // atom map
  if (i < n && body[i] == ':') { ++i; read_int(0); }
  if (i != n) { err = "trailing '" + body.substr(i) + "'"; return false; }
  atom.from_bracket = true;
  return true;
}

// bridge detection via iterative DFS lowlink (ring membership)
void perceive_rings(Molecule& m) {
  size_t n = m.atoms.size();
  std::vector<int> disc(n, -1), low(n, 0);
  std::vector<bool> is_bridge(m.bonds.size(), false);
  int timer = 0;
  struct Frame { int32_t u; int32_t pbond; size_t pos; };
  for (size_t root = 0; root < n; ++root) {
    if (disc[root] != -1) continue;
    std::vector<Frame> stack{{(int32_t)root, -1, 0}};
    disc[root] = low[root] = timer++;
    while (!stack.empty()) {
      Frame& f = stack.back();
      auto& bonds = m.adj[f.u];
      if (f.pos < bonds.size()) {
        int32_t bi = bonds[f.pos++];
        if (bi == f.pbond) continue;
        int32_t v = m.other(bi, f.u);
        if (disc[v] == -1) {
          disc[v] = low[v] = timer++;
          stack.push_back({v, bi, 0});
        } else {
          low[f.u] = std::min(low[f.u], disc[v]);
        }
      } else {
        int32_t u = f.u, pbond = f.pbond;
        stack.pop_back();
        if (!stack.empty()) {
          int32_t parent = stack.back().u;
          low[parent] = std::min(low[parent], low[u]);
          if (low[u] > disc[parent]) is_bridge[pbond] = true;
        }
      }
    }
  }
  for (size_t bi = 0; bi < m.bonds.size(); ++bi)
    m.bonds[bi].in_ring = !is_bridge[bi];
  // smallest ring through each ring bond (BFS excluding the bond)
  for (auto& a : m.atoms) { a.in_ring = false; a.min_ring_size = 0; }
  for (size_t bi = 0; bi < m.bonds.size(); ++bi) {
    if (!m.bonds[bi].in_ring) continue;
    int32_t start = m.bonds[bi].a, goal = m.bonds[bi].b;
    std::vector<int> dist(n, -1);
    std::deque<int32_t> q{start};
    dist[start] = 0;
    int size = 0;
    while (!q.empty() && size == 0) {
      int32_t u = q.front();
      q.pop_front();
      if (dist[u] >= 24) break;
      for (int32_t b2 : m.adj[u]) {
        if ((size_t)b2 == bi) continue;
        int32_t v = m.other(b2, u);
        if (dist[v] == -1) {
          dist[v] = dist[u] + 1;
          if (v == goal) { size = dist[v] + 1; break; }
          q.push_back(v);
        }
      }
    }
    for (int32_t ai : {m.bonds[bi].a, m.bonds[bi].b}) {
      m.atoms[ai].in_ring = true;
      if (size && (m.atoms[ai].min_ring_size == 0 || size < m.atoms[ai].min_ring_size))
        m.atoms[ai].min_ring_size = size;
    }
  }
}

void assign_implicit_hs(Molecule& m) {
  for (size_t i = 0; i < m.atoms.size(); ++i) {
    Atom& a = m.atoms[i];
    if (a.from_bracket) { a.implicit_hs = 0; continue; }
    std::vector<int> valences;
    if (!default_valences(a.atomic_num, valences)) { a.implicit_hs = 0; continue; }
    int used;
    if (a.aromatic) {
      used = (int)m.adj[i].size() + 1;
    } else {
      used = 0;
      for (int32_t bi : m.adj[i])
        used += m.bonds[bi].type == AROMATIC ? 1 : m.bonds[bi].type;
    }
    a.implicit_hs = 0;
    for (int v : valences)
      if (used <= v) { a.implicit_hs = v - used; break; }
  }
}

// Hückel 4n+2 aromaticity perception for Kekulé-form input
// (mirrors nvmolkit_tpu/chem/aromaticity.py).
void perceive_aromaticity(Molecule& m) {
  // smallest ring through each ring bond, deduped by atom set
  std::vector<std::vector<int32_t>> rings;
  std::vector<std::vector<bool>> seen_sets;
  size_t n = m.atoms.size();
  for (size_t bi = 0; bi < m.bonds.size(); ++bi) {
    if (!m.bonds[bi].in_ring) continue;
    int32_t start = m.bonds[bi].a, goal = m.bonds[bi].b;
    std::vector<int32_t> prev(n, -2);
    prev[start] = -1;
    std::deque<int32_t> q{start};
    std::vector<int32_t> path;
    while (!q.empty() && path.empty()) {
      int32_t u = q.front();
      q.pop_front();
      for (int32_t bj : m.adj[u]) {
        if ((size_t)bj == bi) continue;
        int32_t v = m.other(bj, u);
        if (prev[v] != -2) continue;
        prev[v] = u;
        if (v == goal) {
          for (int32_t x = v; x != -1; x = prev[x]) path.push_back(x);
          break;
        }
        q.push_back(v);
      }
    }
    if (path.empty() || path.size() > 7) continue;
    std::vector<bool> set(n, false);
    for (int32_t a : path) set[a] = true;
    bool dup = false;
    for (auto& s : seen_sets)
      if (s == set) { dup = true; break; }
    if (!dup) {
      seen_sets.push_back(set);
      rings.push_back(path);
    }
  }

  for (auto& ring : rings) {
    std::vector<bool> in_this(n, false);
    for (int32_t a : ring) in_this[a] = true;
    bool all_arom = true;
    for (int32_t a : ring)
      if (!m.atoms[a].aromatic) { all_arom = false; break; }
    if (all_arom) continue;

    int pi = 0;
    bool ok = true;
    for (int32_t a : ring) {
      const Atom& atom = m.atoms[a];
      // exocyclic double bonds: to O/N/S contribute 0 pi electrons and
      // keep the ring eligible (the RDKit pyridone/pyranone rule,
      // mirrored in nvmolkit_tpu/chem/aromaticity.py); to carbon
      // (fulvene-like) they disqualify the ring
      bool double_in = false, double_exo_en = false, double_exo_c = false,
           has_triple = false;
      for (int32_t bi : m.adj[a]) {
        const Bond& b = m.bonds[bi];
        int32_t other = m.other(bi, a);
        if (b.type == DOUBLE || b.type == AROMATIC) {
          if (in_this[other] || m.atoms[other].in_ring) double_in = true;
          else if (m.atoms[other].atomic_num == 7 ||
                   m.atoms[other].atomic_num == 8 ||
                   m.atoms[other].atomic_num == 16) double_exo_en = true;
          else double_exo_c = true;
        } else if (b.type == TRIPLE) {
          has_triple = true;
        }
      }
      if (has_triple) { ok = false; break; }
      if (double_in) pi += 1;
      else if (double_exo_en) { /* 0 electrons, ring stays eligible */ }
      else if (double_exo_c) { ok = false; break; }
      else if ((atom.atomic_num == 7 || atom.atomic_num == 8 ||
                atom.atomic_num == 16) && atom.charge == 0) pi += 2;
      else if (atom.atomic_num == 6 && atom.charge == -1) pi += 2;
      else { ok = false; break; }
    }
    if (!ok || pi < 2 || (pi - 2) % 4 != 0) continue;

    for (int32_t a : ring) {
      Atom& atom = m.atoms[a];
      if (!atom.aromatic) {
        atom.explicit_hs += atom.implicit_hs;  // freeze Kekulé H count
        atom.implicit_hs = 0;
        atom.from_bracket = true;
        atom.aromatic = true;
      }
    }
    for (auto& b : m.bonds) {
      if (in_this[b.a] && in_this[b.b] && b.in_ring &&
          (b.type == SINGLE || b.type == DOUBLE))
        b.type = AROMATIC;
    }
  }
}

bool parse_smiles(const std::string& smiles, Molecule& mol) {
  int32_t prev = -1;
  bool has_pending = false;
  int32_t pending_type = SINGLE;
  std::vector<int32_t> branch;
  // ring number -> (atom, has_bond_spec, bond_type)
  std::map<int, std::tuple<int32_t, bool, int32_t>> ring_open;

  auto add_bond = [&](int32_t a, int32_t b, int32_t t) -> bool {
    if (a == b) { mol.error = "self-bond"; return false; }
    for (auto& bd : mol.bonds)
      if ((bd.a == a && bd.b == b) || (bd.a == b && bd.b == a)) {
        mol.error = "duplicate bond";
        return false;
      }
    mol.bonds.push_back({a, b, t, false});
    return true;
  };
  auto attach = [&](int32_t idx) -> bool {
    if (prev >= 0) {
      int32_t t = has_pending ? pending_type : SINGLE;
      if (!add_bond(prev, idx, t)) return false;
    }
    prev = idx;
    has_pending = false;
    return true;
  };
  auto close_ring = [&](int num) -> bool {
    if (prev < 0) { mol.error = "ring closure before atom"; return false; }
    auto it = ring_open.find(num);
    if (it != ring_open.end()) {
      auto [open_idx, open_has, open_type] = it->second;
      ring_open.erase(it);
      int32_t t = SINGLE;
      if (has_pending) t = pending_type;
      else if (open_has) t = open_type;
      if (!add_bond(open_idx, prev, t)) return false;
      has_pending = false;
    } else {
      ring_open[num] = {prev, has_pending, pending_type};
      has_pending = false;
    }
    return true;
  };

  size_t i = 0, n = smiles.size();
  while (i < n) {
    char c = smiles[i];
    if (c == '[') {
      size_t j = smiles.find(']', i);
      if (j == std::string::npos) { mol.error = "unclosed bracket"; return false; }
      Atom atom;
      std::string err;
      if (!parse_bracket(smiles.substr(i + 1, j - i - 1), atom, err)) {
        mol.error = err;
        return false;
      }
      mol.atoms.push_back(atom);
      if (!attach((int32_t)mol.atoms.size() - 1)) return false;
      i = j + 1;
    } else if (isupper((unsigned char)c)) {
      std::string sym(1, c);
      if (i + 1 < n) {
        std::string two = smiles.substr(i, 2);
        if (two == "Cl" || two == "Br") sym = two;
      }
      if (!is_organic(sym)) { mol.error = "element '" + sym + "' must be bracketed"; return false; }
      Atom atom;
      atom.atomic_num = kSymbols.at(sym);
      mol.atoms.push_back(atom);
      if (!attach((int32_t)mol.atoms.size() - 1)) return false;
      i += sym.size();
    } else if (c == 'b' || c == 'c' || c == 'n' || c == 'o' || c == 'p' || c == 's') {
      Atom atom;
      std::string up(1, (char)toupper((unsigned char)c));
      atom.atomic_num = kSymbols.at(up);
      atom.aromatic = true;
      mol.atoms.push_back(atom);
      if (!attach((int32_t)mol.atoms.size() - 1)) return false;
      ++i;
    } else if (c == '*') {
      mol.atoms.push_back(Atom{});
      if (!attach((int32_t)mol.atoms.size() - 1)) return false;
      ++i;
    } else if (c == '-' || c == '/' || c == '\\') {
      has_pending = true; pending_type = SINGLE; ++i;
    } else if (c == '=') {
      has_pending = true; pending_type = DOUBLE; ++i;
    } else if (c == '#' || c == '$') {
      has_pending = true; pending_type = TRIPLE; ++i;
    } else if (c == ':') {
      has_pending = true; pending_type = AROMATIC; ++i;
    } else if (isdigit((unsigned char)c)) {
      if (!close_ring(c - '0')) return false;
      ++i;
    } else if (c == '%') {
      if (i + 2 >= n || !isdigit((unsigned char)smiles[i + 1]) ||
          !isdigit((unsigned char)smiles[i + 2])) {
        mol.error = "bad %nn ring closure";
        return false;
      }
      if (!close_ring((smiles[i + 1] - '0') * 10 + (smiles[i + 2] - '0'))) return false;
      i += 3;
    } else if (c == '(') {
      if (prev < 0) { mol.error = "branch with no root atom"; return false; }
      branch.push_back(prev);
      ++i;
    } else if (c == ')') {
      if (branch.empty()) { mol.error = "unmatched ')'"; return false; }
      prev = branch.back();
      branch.pop_back();
      has_pending = false;
      ++i;
    } else if (c == '.') {
      prev = -1; has_pending = false; ++i;
    } else if (c == ' ' || c == '\t') {
      break;  // trailing name
    } else {
      mol.error = std::string("unexpected character '") + c + "'";
      return false;
    }
  }
  if (!branch.empty()) { mol.error = "unclosed branch"; return false; }
  if (!ring_open.empty()) { mol.error = "unclosed ring closures"; return false; }

  mol.build_adj();
  perceive_rings(mol);
  // aromatic bond post-pass (matches chem/smiles.py)
  for (auto& b : mol.bonds) {
    if (b.type == SINGLE && b.in_ring && mol.atoms[b.a].aromatic &&
        mol.atoms[b.b].aromatic)
      b.type = AROMATIC;
  }
  assign_implicit_hs(mol);
  perceive_aromaticity(mol);
  return true;
}

struct Batch {
  std::vector<Molecule> mols;
};

}  // namespace

extern "C" {

void* nvmk_parse_batch(const char** smiles, int32_t n, int32_t n_threads) {
  auto* batch = new Batch();
  batch->mols.resize(n);
  if (n_threads < 1)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min<int32_t>(n_threads, n > 0 ? n : 1);
  std::atomic<int32_t> next{0};
  auto worker = [&]() {
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      Molecule& m = batch->mols[i];
      if (!parse_smiles(smiles[i], m)) {
        m.atoms.clear();
        m.bonds.clear();
        if (m.error.empty()) m.error = "parse error";
      }
    }
  };
  std::vector<std::thread> pool;
  for (int32_t t = 1; t < n_threads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return batch;
}

void nvmk_free(void* h) { delete static_cast<Batch*>(h); }

int32_t nvmk_num_atoms(void* h, int32_t mol) {
  auto& m = static_cast<Batch*>(h)->mols[mol];
  return m.error.empty() ? (int32_t)m.atoms.size() : -1;
}

int32_t nvmk_num_bonds(void* h, int32_t mol) {
  return (int32_t)static_cast<Batch*>(h)->mols[mol].bonds.size();
}

const char* nvmk_error(void* h, int32_t mol) {
  auto& m = static_cast<Batch*>(h)->mols[mol];
  return m.error.empty() ? nullptr : m.error.c_str();
}

void nvmk_get_atoms(void* h, int32_t mol, int32_t* atomic_num, int32_t* charge,
                    int32_t* degree, int32_t* total_hs, int32_t* in_ring,
                    int32_t* is_aromatic, int32_t* mass, int32_t* isotope,
                    int32_t* min_ring_size, int32_t* chiral, int32_t* explicit_hs,
                    int32_t* from_bracket) {
  auto& m = static_cast<Batch*>(h)->mols[mol];
  for (size_t i = 0; i < m.atoms.size(); ++i) {
    const Atom& a = m.atoms[i];
    atomic_num[i] = a.atomic_num;
    charge[i] = a.charge;
    degree[i] = (int32_t)m.adj[i].size();
    total_hs[i] = a.explicit_hs + a.implicit_hs;
    in_ring[i] = a.in_ring ? 1 : 0;
    is_aromatic[i] = a.aromatic ? 1 : 0;
    auto it = kCommonMass.find(a.atomic_num);
    mass[i] = a.isotope ? a.isotope
                        : (it != kCommonMass.end() ? it->second : a.atomic_num * 2);
    isotope[i] = a.isotope;
    min_ring_size[i] = a.min_ring_size;
    chiral[i] = a.chiral;
    explicit_hs[i] = a.explicit_hs;
    from_bracket[i] = a.from_bracket ? 1 : 0;
  }
}

// Fill the padded Morgan kernel batch arrays for a bucket of molecules
// directly (the role of the reference's MorganInvariantsGenerator CPU
// stage): atom invariants are boost hash_combine over (atomicNum,
// degree, totalHs, charge, deltaMass, inRing) — arithmetic identical to
// nvmolkit_tpu/utils/hashing.py + ops/morgan_cpu.py.
//
// Output layouts (B = n_indices, A = max_atoms, K = max_bonds_per_atom,
// W = 2*A/32 words):
//   inv0      uint32 [B, A]
//   adj_atoms int32  [B, A, K]
//   adj_code  uint32 [B, A, K]
//   adj_mask  uint8  [B, A, K]
//   own_bits  uint32 [B, A, W]
//   atom_mask uint8  [B, A]
//   degree    int32  [B, A]
// Returns 0 on success, -1 if any molecule exceeds A atoms / 2A bonds /
// K bonds-per-atom or failed to parse.
int32_t nvmk_fill_morgan_batch(void* h, const int32_t* mol_indices, int32_t b,
                               int32_t max_atoms, int32_t max_bonds_per_atom,
                               int32_t use_chirality,
                               uint32_t* inv0, int32_t* adj_atoms,
                               uint32_t* adj_code, uint8_t* adj_mask,
                               uint32_t* own_bits, uint8_t* atom_mask,
                               int32_t* degree_out) {
  auto* batch = static_cast<Batch*>(h);
  const int32_t A = max_atoms, K = max_bonds_per_atom;
  const int32_t W = (2 * A) / 32;
  auto hash_combine = [](uint32_t seed, uint32_t v) {
    return seed ^ (v + 0x9e3779b9u + (seed << 6) + (seed >> 2));
  };
  for (int32_t k = 0; k < b; ++k) {
    const Molecule& m = batch->mols[mol_indices[k]];
    if (!m.error.empty()) return -1;
    int32_t na = (int32_t)m.atoms.size();
    if (na > A || (int32_t)m.bonds.size() > 2 * A) return -1;
    uint32_t* inv_row = inv0 + (size_t)k * A;
    int32_t* adj_a = adj_atoms + (size_t)k * A * K;
    uint32_t* adj_c = adj_code + (size_t)k * A * K;
    uint8_t* adj_m = adj_mask + (size_t)k * A * K;
    uint32_t* own = own_bits + (size_t)k * A * W;
    uint8_t* amask = atom_mask + (size_t)k * A;
    int32_t* deg = degree_out + (size_t)k * A;
    std::memset(inv_row, 0, sizeof(uint32_t) * A);
    std::memset(adj_a, 0, sizeof(int32_t) * A * K);
    std::memset(adj_c, 0, sizeof(uint32_t) * A * K);
    std::memset(adj_m, 0, sizeof(uint8_t) * A * K);
    std::memset(own, 0, sizeof(uint32_t) * A * W);
    std::memset(amask, 0, sizeof(uint8_t) * A);
    std::memset(deg, 0, sizeof(int32_t) * A);
    for (int32_t i = 0; i < na; ++i) {
      const Atom& a = m.atoms[i];
      auto it = kCommonMass.find(a.atomic_num);
      int32_t mass = a.isotope ? a.isotope
                               : (it != kCommonMass.end() ? it->second
                                                          : a.atomic_num * 2);
      int32_t delta_mass = mass - a.atomic_num * 2;
      uint32_t inv = 0;
      inv = hash_combine(inv, (uint32_t)a.atomic_num);
      inv = hash_combine(inv, (uint32_t)m.adj[i].size());
      inv = hash_combine(inv, (uint32_t)(a.explicit_hs + a.implicit_hs));
      inv = hash_combine(inv, (uint32_t)a.charge);
      inv = hash_combine(inv, (uint32_t)delta_mass);
      inv = hash_combine(inv, (uint32_t)(a.in_ring ? 1 : 0));
      if (use_chirality) inv = hash_combine(inv, (uint32_t)a.chiral);
      inv_row[i] = inv;
      amask[i] = 1;
      int32_t d = (int32_t)m.adj[i].size();
      if (d > K) return -1;
      deg[i] = d;
      for (int32_t s = 0; s < d; ++s) {
        int32_t bi = m.adj[i][s];
        adj_a[i * K + s] = m.other(bi, i);
        adj_c[i * K + s] = (uint32_t)m.bonds[bi].type;
        adj_m[i * K + s] = 1;
        own[i * W + bi / 32] |= (1u << (bi % 32));
      }
    }
  }
  return 0;
}

void nvmk_get_bonds(void* h, int32_t mol, int32_t* bond_atoms,
                    int32_t* bond_type, int32_t* bond_in_ring) {
  auto& m = static_cast<Batch*>(h)->mols[mol];
  for (size_t bi = 0; bi < m.bonds.size(); ++bi) {
    bond_atoms[2 * bi] = m.bonds[bi].a;
    bond_atoms[2 * bi + 1] = m.bonds[bi].b;
    bond_type[bi] = m.bonds[bi].type;
    bond_in_ring[bi] = m.bonds[bi].in_ring ? 1 : 0;
  }
}

}  // extern "C"
