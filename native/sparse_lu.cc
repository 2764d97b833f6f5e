// Sparse LU solver for MNA systems — the native-lineage component.
//
// The Go reference consumes github.com/edp1096/sparse, a pure-Go port of
// Berkeley Sparse 1.3 (C).  This is a fresh C++ implementation of the same
// role: a fill-in-capable sparse LU with partial pivoting, exposed through a
// C API consumed from Python via ctypes (toyspice_tpu/native.py).  The TPU
// compute path uses batched dense elimination (ops/solve.py) — dense wins
// outright at fixture sizes — so this solver serves the host-side big-circuit
// path and as an independent numerical oracle for tests.
//
// Algorithm: left-looking (Gilbert-Peierls) column LU with partial pivoting.
// Symbolic structure is rediscovered per factorization (circuit matrices here
// are small enough that the symbolic reuse optimization of Sparse 1.3 is not
// the bottleneck; the API mirrors the create/add/clear/factor/solve cycle of
// the reference's matrix wrapper, pkg/matrix/circuit.go).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <utility>
#include <vector>

namespace {

struct SparseMatrix {
  int n = 0;
  // triplet accumulation with coordinate dedup
  std::map<std::pair<int, int>, double> entries;

  // factorization result: column-compressed L and U (unit-diagonal L)
  bool factored = false;
  std::vector<std::vector<std::pair<int, double>>> lcols;  // rows > pivot
  std::vector<std::vector<std::pair<int, double>>> ucols;  // rows <= pivot
  std::vector<int> perm;   // row permutation: perm[k] = original row at pos k
  std::vector<int> pinv;   // inverse permutation
};

}  // namespace

extern "C" {

void* tsn_create(int n) {
  auto* m = new SparseMatrix();
  m->n = n;
  return m;
}

void tsn_destroy(void* h) { delete static_cast<SparseMatrix*>(h); }

void tsn_clear(void* h) {
  auto* m = static_cast<SparseMatrix*>(h);
  m->entries.clear();
  m->factored = false;
}

// 0-based indices
void tsn_add(void* h, int i, int j, double v) {
  auto* m = static_cast<SparseMatrix*>(h);
  if (i < 0 || j < 0 || i >= m->n || j >= m->n) return;
  m->entries[{i, j}] += v;
}

int tsn_nnz(void* h) {
  return static_cast<int>(static_cast<SparseMatrix*>(h)->entries.size());
}

// Returns 0 on success, nonzero if structurally/numerically singular.
int tsn_factor(void* h) {
  auto* m = static_cast<SparseMatrix*>(h);
  const int n = m->n;

  // column-wise input
  std::vector<std::vector<std::pair<int, double>>> acols(n);
  for (const auto& kv : m->entries) {
    acols[kv.first.second].push_back({kv.first.first, kv.second});
  }

  m->lcols.assign(n, {});
  m->ucols.assign(n, {});
  m->perm.assign(n, -1);
  m->pinv.assign(n, -1);

  // dense work vector + occupancy flags (classic sparse trick)
  std::vector<double> work(n, 0.0);
  std::vector<int> stamp(n, -1);
  std::vector<int> touched;
  touched.reserve(n);

  for (int k = 0; k < n; ++k) {
    touched.clear();
    for (const auto& e : acols[k]) {
      if (stamp[e.first] != k) {
        stamp[e.first] = k;
        work[e.first] = 0.0;
        touched.push_back(e.first);
      }
      work[e.first] += e.second;
    }

    // left-looking update: apply previous columns' L in pivot order
    for (int j = 0; j < k; ++j) {
      // u_jk = work at the row pivoted into position j
      int prow = m->perm[j];
      if (stamp[prow] != k) continue;
      double ujk = work[prow];
      if (ujk == 0.0) continue;
      for (const auto& le : m->lcols[j]) {
        if (stamp[le.first] != k) {
          stamp[le.first] = k;
          work[le.first] = 0.0;
          touched.push_back(le.first);
        }
        work[le.first] -= le.second * ujk;
      }
    }

    // partial pivot among not-yet-pivoted rows
    int prow = -1;
    double pval = 0.0;
    for (int r : touched) {
      if (m->pinv[r] >= 0) continue;  // already a pivot row
      double a = std::fabs(work[r]);
      if (a > pval) {
        pval = a;
        prow = r;
      }
    }
    if (prow < 0 || pval == 0.0 || !std::isfinite(pval)) return 1;

    m->perm[k] = prow;
    m->pinv[prow] = k;

    const double piv = work[prow];
    for (int r : touched) {
      double v = work[r];
      if (v == 0.0) continue;
      int pos = m->pinv[r];
      if (pos >= 0 && pos < k) {
        m->ucols[k].push_back({pos, v});  // U entry at pivoted position
      } else if (r == prow) {
        m->ucols[k].push_back({k, v});
      } else {
        m->lcols[k].push_back({r, v / piv});  // original row id for L
      }
    }
  }

  m->factored = true;
  return 0;
}

// Solve A x = b.  rhs/out length n.  Returns 0 on success.
int tsn_solve(void* h, const double* rhs, double* out) {
  auto* m = static_cast<SparseMatrix*>(h);
  if (!m->factored) return 1;
  const int n = m->n;

  // forward solve L y = P b, in pivot order
  std::vector<double> y(n);
  std::vector<double> b(rhs, rhs + n);
  for (int k = 0; k < n; ++k) {
    double v = b[m->perm[k]];
    y[k] = v;
    if (v != 0.0) {
      for (const auto& le : m->lcols[k]) {
        b[le.first] -= le.second * v;
      }
    }
  }

  // back solve U x = y; ucols[k] holds column k of U by pivoted row position
  std::vector<double> x(n, 0.0);
  for (int k = n - 1; k >= 0; --k) {
    double diag = 0.0;
    for (const auto& ue : m->ucols[k]) {
      if (ue.first == k) diag = ue.second;
    }
    if (diag == 0.0) return 1;
    double xk = y[k] / diag;
    x[k] = xk;
    if (xk != 0.0) {
      for (const auto& ue : m->ucols[k]) {
        if (ue.first < k) y[ue.first] -= ue.second * xk;
      }
    }
  }

  std::memcpy(out, x.data(), n * sizeof(double));
  return 0;
}

}  // extern "C"
