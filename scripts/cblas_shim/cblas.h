/* Minimal CBLAS interface covering exactly the five routines the reference
 * trainer uses (cblas_daxpy/dscal/ddot/dgemm/dgemv — see
 * /root/reference/ffm.cpp:21-69).  Implemented in cblas_shim.cpp with plain
 * OpenMP'd loops so the reference binary can be built for baseline
 * measurement on machines without MKL/OpenBLAS.  NOT a performance BLAS —
 * but for this workload the hot dgemm/dgemv shapes are k x k Grams and
 * (n x k) x k, where a vectorized -O3 -march=native loop is within ~2x of a
 * tuned BLAS; the dominant cost is the OpenMP sparse passes, which don't go
 * through BLAS at all.
 */
#ifndef CBLAS_SHIM_H
#define CBLAS_SHIM_H

#ifdef __cplusplus
extern "C" {
#endif

typedef enum { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_LAYOUT;
typedef enum { CblasNoTrans = 111, CblasTrans = 112, CblasConjTrans = 113 } CBLAS_TRANSPOSE;
typedef CBLAS_LAYOUT CBLAS_ORDER;

void cblas_daxpy(int n, double alpha, const double *x, int incx, double *y, int incy);
void cblas_dscal(int n, double alpha, double *x, int incx);
double cblas_ddot(int n, const double *x, int incx, const double *y, int incy);
void cblas_dgemm(CBLAS_LAYOUT layout, CBLAS_TRANSPOSE transa, CBLAS_TRANSPOSE transb,
                 int m, int n, int k, double alpha, const double *a, int lda,
                 const double *b, int ldb, double beta, double *c, int ldc);
void cblas_dgemv(CBLAS_LAYOUT layout, CBLAS_TRANSPOSE trans, int m, int n,
                 double alpha, const double *a, int lda, const double *x, int incx,
                 double beta, double *y, int incy);

#ifdef __cplusplus
}
#endif

#endif
