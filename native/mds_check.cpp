// Exhaustive MDS verification for width-12 matrices over Goldilocks.
//
// A matrix is MDS iff every square submatrix is nonsingular. For t = 12
// that is sum_k C(12,k)^2 = 2,704,155 minors; with __uint128_t mulmod and
// fraction-free Gaussian elimination this runs in well under a minute, so
// the "fast" circulant matrix used by starky_bn254_tpu/poseidon.py can be
// *proved* MDS rather than assumed (the provably-MDS Cauchy fallback needs
// 144 full 64-bit modmuls per permutation; the circulant needs only
// power-of-two shifts). Run: ./mds_check  (exit 0 = MDS).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;

static const u64 P = 0xFFFFFFFF00000001ull;  // Goldilocks

static inline u64 mulmod(u64 a, u64 b) { return (u64)((u128)a * b % P); }
static inline u64 submod(u64 a, u64 b) { return a >= b ? a - b : a + P - b; }

// det != 0 of the k x k submatrix (rows[0..k), cols[0..k)) of m, mod P.
static bool nonsingular(const u64 m[12][12], const int* rows, const int* cols,
                        int k) {
  u64 a[12][12];
  for (int i = 0; i < k; i++)
    for (int j = 0; j < k; j++) a[i][j] = m[rows[i]][cols[j]];
  // plain Gaussian elimination with inverse-free pivoting: det != 0 iff we
  // can always find a nonzero pivot; eliminate using cross-multiplication.
  for (int c = 0; c < k; c++) {
    int piv = -1;
    for (int r = c; r < k; r++)
      if (a[r][c] != 0) { piv = r; break; }
    if (piv < 0) return false;
    if (piv != c)
      for (int j = c; j < k; j++) { u64 t = a[c][j]; a[c][j] = a[piv][j]; a[piv][j] = t; }
    for (int r = c + 1; r < k; r++) {
      if (a[r][c] == 0) continue;
      u64 f = a[r][c], g = a[c][c];
      for (int j = c; j < k; j++)
        a[r][j] = submod(mulmod(a[r][j], g), mulmod(a[c][j], f));
    }
  }
  return true;
}

static long long checked = 0;

static bool all_minors(const u64 m[12][12], int k) {
  int rows[12], cols[12];
  // iterate k-subsets of {0..11} for rows and cols
  std::vector<std::vector<int>> subsets;
  int idx[12];
  for (int i = 0; i < k; i++) idx[i] = i;
  while (true) {
    subsets.emplace_back(idx, idx + k);
    int i = k - 1;
    while (i >= 0 && idx[i] == 12 - k + i) i--;
    if (i < 0) break;
    idx[i]++;
    for (int j = i + 1; j < k; j++) idx[j] = idx[j - 1] + 1;
  }
  for (const auto& rs : subsets)
    for (const auto& cs : subsets) {
      for (int i = 0; i < k; i++) { rows[i] = rs[i]; cols[i] = cs[i]; }
      checked++;
      if (!nonsingular(m, rows, cols, k)) {
        printf("singular %dx%d minor rows=[", k, k);
        for (int i = 0; i < k; i++) printf("%d ", rows[i]);
        printf("] cols=[");
        for (int i = 0; i < k; i++) printf("%d ", cols[i]);
        printf("]\n");
        return false;
      }
    }
  return true;
}

int main(int argc, char** argv) {
  // first row of the circulant; overridable from argv for searching
  u64 row[12] = {1, 1, 2, 1, 8, 32, 2, 256, 4096, 8, 65536, 1024};
  if (argc == 13)
    for (int i = 0; i < 12; i++) row[i] = strtoull(argv[i + 1], nullptr, 10);
  u64 m[12][12];
  for (int i = 0; i < 12; i++)
    for (int j = 0; j < 12; j++) m[i][j] = row[(j - i + 12) % 12];
  for (int k = 1; k <= 12; k++) {
    if (!all_minors(m, k)) {
      printf("NOT MDS (checked %lld minors)\n", checked);
      return 1;
    }
    printf("k=%d ok (%lld minors so far)\n", k, checked);
  }
  printf("MDS verified: all %lld minors nonsingular\n", checked);
  return 0;
}
