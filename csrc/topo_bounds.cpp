// Topological distance-bounds matrices, batched native implementation.
//
// Native counterpart of nvmolkit_tpu/chem/bounds.py (which plays the
// role of the reference's rdkit_extensions/bounds_matrix.h adapter over
// RDKit setTopolBounds). The Python builder is the semantic oracle —
// this file reproduces it bit-for-bit in double precision (same
// iteration order: bonds in insertion order, neighbor lists built by
// appending both endpoints of each bond in order) and exists because
// the 1-core host box made the per-molecule Python graph walks the
// single largest host cost of EmbedMolecules (~0.6 ms/molecule;
// round-4 profiling).
//
// Chemistry inputs (UFF per-atom r1/chi/theta0, vdW floors, effective
// bond orders, stereo double-bond quads) are computed by the Python
// layer and passed as flat arrays, so all chemistry stays defined in
// exactly one place.
//
// One call processes a whole molecule batch and writes straight into
// the padded [M, A, A] float32 upper/lower arrays the embedding
// pipeline dispatches to the device.

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kBig = 1000.0;

struct MolView {
    int32_t n;
    const double* r1;
    const double* chi;
    const double* theta0;  // degrees
    const double* vdw;
    int32_t nb;
    const int32_t* bond_ij;  // [nb, 2] local
    const double* order;
};

inline double natural_bond_length(double ri, double rj, double chi_i,
                                  double chi_j, double order) {
    const double r_bo = -0.1332 * (ri + rj) * std::log(order);
    const double sq = std::sqrt(chi_i) - std::sqrt(chi_j);
    const double r_en = ri * rj * sq * sq / (chi_i * ri + chi_j * rj);
    return ri + rj + r_bo - r_en;
}

// |i - l| for the 1-4 chain (rij, theta_j, rjk, theta_k, rkl) at
// dihedral phi — same closed form as bounds.py d14().
inline double d14(double rij, double tj, double rjk, double rkl, double tk,
                  double phi) {
    const double bx = rij * std::cos(tj);
    const double by = rij * std::sin(tj);
    const double cx = rjk - rkl * std::cos(tk);
    const double cy = rkl * std::sin(tk) * std::cos(phi);
    const double cz = rkl * std::sin(tk) * std::sin(phi);
    return std::sqrt((bx - cx) * (bx - cx) + (by - cy) * (by - cy) + cz * cz);
}

void bounds_one(const MolView& m, bool relaxed, int32_t n_sdb,
                const int32_t* sdb_quads, const uint8_t* sdb_cis,
                int32_t pad_n, float* upper_out, float* lower_out) {
    const int n = m.n;
    const double vdw_scale = relaxed ? 0.7 : 1.0;
    const double tol13 = relaxed ? 0.10 : 0.04;
    const double lo14 = relaxed ? 0.88 : 0.95;
    const double hi14 = relaxed ? 1.08 : 1.02;
    const double deg = M_PI / 180.0;

    std::vector<double> upper(static_cast<size_t>(n) * n, kBig);
    std::vector<double> lower(static_cast<size_t>(n) * n);
    std::vector<double> r0(static_cast<size_t>(n) * n, 0.0);
    auto U = [&](int i, int j) -> double& { return upper[i * n + j]; };
    auto L = [&](int i, int j) -> double& { return lower[i * n + j]; };
    auto R0 = [&](int i, int j) -> double& { return r0[i * n + j]; };

    for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j)
            L(i, j) = vdw_scale * 0.9 * (m.vdw[i] + m.vdw[j]) / 1.2;
    for (int i = 0; i < n; ++i) L(i, i) = 0.0;

    // neighbor lists in bond-insertion order (matches Mol.atom_bonds)
    std::vector<std::vector<int>> nbr(n);
    for (int b = 0; b < m.nb; ++b) {
        nbr[m.bond_ij[2 * b]].push_back(m.bond_ij[2 * b + 1]);
        nbr[m.bond_ij[2 * b + 1]].push_back(m.bond_ij[2 * b]);
    }

    // 1-2 from natural bond lengths
    for (int b = 0; b < m.nb; ++b) {
        const int i = m.bond_ij[2 * b], j = m.bond_ij[2 * b + 1];
        const double r = natural_bond_length(m.r1[i], m.r1[j], m.chi[i],
                                             m.chi[j], m.order[b]);
        R0(i, j) = R0(j, i) = r;
        U(i, j) = U(j, i) = r * 1.01;
        L(i, j) = L(j, i) = r * 0.99;
    }

    // 1-3 via law of cosines at the central atom's theta0
    for (int j = 0; j < n; ++j) {
        const double t0 = m.theta0[j] * deg;
        const auto& nj = nbr[j];
        for (size_t x = 0; x < nj.size(); ++x) {
            for (size_t y = x + 1; y < nj.size(); ++y) {
                const int i = nj[x], k = nj[y];
                const double rij = R0(i, j), rjk = R0(j, k);
                double d2 = rij * rij + rjk * rjk -
                            2.0 * rij * rjk * std::cos(t0);
                const double d13 = std::sqrt(d2 > 1e-6 ? d2 : 1e-6);
                double u = std::min(U(i, k), d13 * (1.0 + tol13));
                double l = std::max(L(i, k), d13 * (1.0 - tol13));
                if (l > u) {  // conflicting angle paths (rings): widen
                    const double mid = 0.5 * (l + u);
                    u = mid * 1.03;
                    l = mid * 0.97;
                }
                U(i, k) = U(k, i) = u;
                L(i, k) = L(k, i) = l;
            }
        }
    }

    // 1-4: cis minimum to trans maximum over every bond-centered path
    for (int b = 0; b < m.nb; ++b) {
        const int j = m.bond_ij[2 * b], k = m.bond_ij[2 * b + 1];
        const double tj = m.theta0[j] * deg, tk = m.theta0[k] * deg;
        for (int i : nbr[j]) {
            if (i == k) continue;
            for (int l : nbr[k]) {
                if (l == j || l == i) continue;
                const double rij = R0(i, j), rjk = R0(j, k), rkl = R0(k, l);
                const double d_cis = d14(rij, tj, rjk, rkl, tk, 0.0);
                const double d_trans = d14(rij, tj, rjk, rkl, tk, M_PI);
                double u = std::min(U(i, l), std::max(d_cis, d_trans) * hi14);
                double lo = std::max(L(i, l), std::min(d_cis, d_trans) * lo14);
                if (lo > u) {
                    const double mid = 0.5 * (lo + u);
                    u = mid * 1.05;
                    lo = mid * 0.95;
                }
                U(i, l) = U(l, i) = u;
                L(i, l) = L(l, i) = lo;
            }
        }
    }

    // E/Z double bonds: pin the flanking 1-4 distance (quads from the
    // Python stereo perception, local indices)
    for (int s = 0; s < n_sdb; ++s) {
        const int i = sdb_quads[4 * s], j = sdb_quads[4 * s + 1];
        const int k = sdb_quads[4 * s + 2], l = sdb_quads[4 * s + 3];
        const double rij = R0(i, j), rjk = R0(j, k), rkl = R0(k, l);
        const double tj = m.theta0[j] * deg, tk = m.theta0[k] * deg;
        const double d =
            d14(rij, tj, rjk, rkl, tk, sdb_cis[s] ? 0.0 : M_PI);
        U(i, l) = U(l, i) = d * 1.03;
        L(i, l) = L(l, i) = d * 0.97;
    }

    for (int i = 0; i < n; ++i) U(i, i) = L(i, i) = 0.0;

    // write into the padded [pad_n, pad_n] float32 outputs (pad = 0)
    for (int i = 0; i < n; ++i) {
        float* urow = upper_out + static_cast<size_t>(i) * pad_n;
        float* lrow = lower_out + static_cast<size_t>(i) * pad_n;
        for (int j = 0; j < n; ++j) {
            urow[j] = static_cast<float>(U(i, j));
            lrow[j] = static_cast<float>(L(i, j));
        }
    }
}

}  // namespace

extern "C" {

// Batched bounds: fills upper_out/lower_out [n_mols, pad_n, pad_n]
// float32 (caller-zeroed or not — every in-molecule entry is written,
// padding is written as 0 only on the diagonal block edges, so callers
// should pass zero-initialized buffers).
void nvmk_topo_bounds(
    int32_t n_mols, const int32_t* atom_off /* [n_mols+1] */,
    const double* r1, const double* chi, const double* theta0,
    const double* vdw, const int32_t* bond_off /* [n_mols+1] */,
    const int32_t* bond_ij /* [sum_b, 2] local */, const double* order,
    const int32_t* sdb_off /* [n_mols+1] */,
    const int32_t* sdb_quads /* [sum_s, 4] local */, const uint8_t* sdb_cis,
    int32_t relaxed, int32_t pad_n, float* upper_out, float* lower_out) {
    const size_t page = static_cast<size_t>(pad_n) * pad_n;
    for (int32_t mi = 0; mi < n_mols; ++mi) {
        const int32_t a0 = atom_off[mi], b0 = bond_off[mi], s0 = sdb_off[mi];
        MolView v{atom_off[mi + 1] - a0, r1 + a0,    chi + a0,
                  theta0 + a0,           vdw + a0,   bond_off[mi + 1] - b0,
                  bond_ij + 2 * b0,      order + b0};
        bounds_one(v, relaxed != 0, sdb_off[mi + 1] - s0, sdb_quads + 4 * s0,
                   sdb_cis + s0, pad_n, upper_out + mi * page,
                   lower_out + mi * page);
    }
}

}  // extern "C"
