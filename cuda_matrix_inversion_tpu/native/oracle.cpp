// Native CPU oracle: batched LU / Cholesky inversion via LAPACK + OpenMP.
//
// TPU-native equivalent of the reference's C oracle (src/inverse.c):
//   inverse_lu_blas / inverse_lu_blas_omp     (inverse.c:55-86)
//   inverse_chol_blas / inverse_chol_blas_omp (inverse.c:89-107)
// Same structure: per-matrix LAPACK calls fanned out with an OpenMP
// dynamic-schedule parallel-for and per-thread workspace.
//
// Layout note: buffers arrive row-major (C order). LAPACK is
// column-major, so it sees Aᵀ; since inv(Aᵀ) = inv(A)ᵀ, the LU path
// needs no transposes at all. The Cholesky path works on symmetric
// input (Aᵀ = A) with uplo='L' and mirrors the triangle afterwards.
//
// Exposed as a C ABI consumed via ctypes.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {
// LAPACK Fortran symbols (liblapack.so.3)
void sgetrf_(const int *m, const int *n, float *a, const int *lda, int *ipiv, int *info);
void sgetri_(const int *n, float *a, const int *lda, const int *ipiv, float *work,
             const int *lwork, int *info);
void spotrf_(const char *uplo, const int *n, float *a, const int *lda, int *info);
void spotri_(const char *uplo, const int *n, float *a, const int *lda, int *info);
void dgetrf_(const int *m, const int *n, double *a, const int *lda, int *ipiv, int *info);
void dgetri_(const int *n, double *a, const int *lda, const int *ipiv, double *work,
             const int *lwork, int *info);
void dpotrf_(const char *uplo, const int *n, double *a, const int *lda, int *info);
void dpotri_(const char *uplo, const int *n, double *a, const int *lda, int *info);
}

namespace {

template <typename T>
struct Lapack;

template <>
struct Lapack<float> {
  static void getrf(const int *m, const int *n, float *a, const int *lda, int *ipiv,
                    int *info) { sgetrf_(m, n, a, lda, ipiv, info); }
  static void getri(const int *n, float *a, const int *lda, const int *ipiv,
                    float *work, const int *lwork, int *info) {
    sgetri_(n, a, lda, ipiv, work, lwork, info);
  }
  static void potrf(const char *u, const int *n, float *a, const int *lda, int *info) {
    spotrf_(u, n, a, lda, info);
  }
  static void potri(const char *u, const int *n, float *a, const int *lda, int *info) {
    spotri_(u, n, a, lda, info);
  }
};

template <>
struct Lapack<double> {
  static void getrf(const int *m, const int *n, double *a, const int *lda, int *ipiv,
                    int *info) { dgetrf_(m, n, a, lda, ipiv, info); }
  static void getri(const int *n, double *a, const int *lda, const int *ipiv,
                    double *work, const int *lwork, int *info) {
    dgetri_(n, a, lda, ipiv, work, lwork, info);
  }
  static void potrf(const char *u, const int *n, double *a, const int *lda, int *info) {
    dpotrf_(u, n, a, lda, info);
  }
  static void potri(const char *u, const int *n, double *a, const int *lda, int *info) {
    dpotri_(u, n, a, lda, info);
  }
};

// Batched in-place LU inversion (ref inverse_lu_blas_omp, inverse.c:71-86).
template <typename T>
int64_t inverse_lu(T *a, int64_t batch, int64_t n) {
  const int ni = static_cast<int>(n);
  const int lwork = ni * 64;
  int64_t first_bad = 0;  // 1-based batch index of first failure; 0 = ok
#pragma omp parallel
  {
    std::vector<int> ipiv(ni);
    std::vector<T> work(lwork);
#pragma omp for schedule(dynamic, 8)
    for (int64_t k = 0; k < batch; ++k) {
      T *m = a + k * n * n;
      int info = 0;
      Lapack<T>::getrf(&ni, &ni, m, &ni, ipiv.data(), &info);
      if (info == 0) {
        Lapack<T>::getri(&ni, m, &ni, ipiv.data(), work.data(), &lwork, &info);
      }
      if (info != 0) {
#pragma omp critical
        if (first_bad == 0 || k + 1 < first_bad) first_bad = k + 1;
      }
    }
  }
  return first_bad;
}

// Batched in-place SPD inversion (ref inverse_chol_blas_omp, inverse.c:100-107),
// plus the triangle mirror the reference omits (SURVEY §2.4: it leaves the
// other triangle stale).
template <typename T>
int64_t inverse_chol(T *a, int64_t batch, int64_t n) {
  const int ni = static_cast<int>(n);
  const char lo = 'L';
  int64_t first_bad = 0;
#pragma omp parallel for schedule(dynamic, 8)
  for (int64_t k = 0; k < batch; ++k) {
    T *m = a + k * n * n;
    int info = 0;
    Lapack<T>::potrf(&lo, &ni, m, &ni, &info);
    if (info == 0) Lapack<T>::potri(&lo, &ni, m, &ni, &info);
    if (info != 0) {
#pragma omp critical
      if (first_bad == 0 || k + 1 < first_bad) first_bad = k + 1;
      continue;
    }
    // potri filled col-major-'L' = row-major upper; mirror it down.
    for (int64_t i = 1; i < n; ++i)
      for (int64_t j = 0; j < i; ++j) m[i * n + j] = m[j * n + i];
  }
  return first_bad;
}

}  // namespace

extern "C" {

int64_t oracle_inverse_lu_f32(float *a, int64_t batch, int64_t n) {
  return inverse_lu<float>(a, batch, n);
}
int64_t oracle_inverse_lu_f64(double *a, int64_t batch, int64_t n) {
  return inverse_lu<double>(a, batch, n);
}
int64_t oracle_inverse_chol_f32(float *a, int64_t batch, int64_t n) {
  return inverse_chol<float>(a, batch, n);
}
int64_t oracle_inverse_chol_f64(double *a, int64_t batch, int64_t n) {
  return inverse_chol<double>(a, batch, n);
}

int oracle_num_threads(void) {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
