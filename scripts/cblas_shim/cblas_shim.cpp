/* Plain-C++ implementations of the five CBLAS routines the reference uses.
 * Row-major only (the reference always passes CblasRowMajor).  dgemm covers
 * the NoTrans/Trans combinations the reference emits (NN, TN, NT —
 * /root/reference/ffm.cpp:29-48). */
#include "cblas.h"

#include <cstddef>

extern "C" {

void cblas_daxpy(int n, double alpha, const double *x, int incx, double *y,
                 int incy) {
    if (incx == 1 && incy == 1) {
        for (int i = 0; i < n; i++) y[i] += alpha * x[i];
    } else {
        for (int i = 0; i < n; i++) y[i * incy] += alpha * x[i * incx];
    }
}

void cblas_dscal(int n, double alpha, double *x, int incx) {
    if (incx == 1) {
        for (int i = 0; i < n; i++) x[i] *= alpha;
    } else {
        for (int i = 0; i < n; i++) x[i * incx] *= alpha;
    }
}

double cblas_ddot(int n, const double *x, int incx, const double *y, int incy) {
    double s = 0.0;
    if (incx == 1 && incy == 1) {
        for (int i = 0; i < n; i++) s += x[i] * y[i];
    } else {
        for (int i = 0; i < n; i++) s += x[i * incx] * y[i * incy];
    }
    return s;
}

/* C(m x n) = alpha * op(A) * op(B) + beta * C, row-major. */
void cblas_dgemm(CBLAS_LAYOUT layout, CBLAS_TRANSPOSE transa,
                 CBLAS_TRANSPOSE transb, int m, int n, int k, double alpha,
                 const double *a, int lda, const double *b, int ldb,
                 double beta, double *c, int ldc) {
    (void)layout; /* row-major assumed */
    for (int i = 0; i < m; i++)
        for (int j = 0; j < n; j++) c[(size_t)i * ldc + j] *= beta;

    const bool ta = (transa == CblasTrans);
    const bool tb = (transb == CblasTrans);
    /* loop order i-l-j keeps the inner loop contiguous on B and C */
    for (int i = 0; i < m; i++) {
        for (int l = 0; l < k; l++) {
            const double av =
                alpha * (ta ? a[(size_t)l * lda + i] : a[(size_t)i * lda + l]);
            if (av == 0.0) continue;
            const double *brow = tb ? nullptr : &b[(size_t)l * ldb];
            double *crow = &c[(size_t)i * ldc];
            if (!tb) {
                for (int j = 0; j < n; j++) crow[j] += av * brow[j];
            } else {
                for (int j = 0; j < n; j++) crow[j] += av * b[(size_t)j * ldb + l];
            }
        }
    }
}

/* y = alpha * op(A) x + beta * y, row-major. */
void cblas_dgemv(CBLAS_LAYOUT layout, CBLAS_TRANSPOSE trans, int m, int n,
                 double alpha, const double *a, int lda, const double *x,
                 int incx, double beta, double *y, int incy) {
    (void)layout;
    if (trans == CblasNoTrans) {
        for (int i = 0; i < m; i++) {
            double s = 0.0;
            const double *arow = &a[(size_t)i * lda];
            for (int j = 0; j < n; j++) s += arow[j] * x[j * incx];
            y[i * incy] = alpha * s + beta * y[i * incy];
        }
    } else {
        for (int j = 0; j < n; j++) y[j * incy] *= beta;
        for (int i = 0; i < m; i++) {
            const double xv = alpha * x[i * incx];
            if (xv == 0.0) continue;
            const double *arow = &a[(size_t)i * lda];
            for (int j = 0; j < n; j++) y[j * incy] += xv * arow[j];
        }
    }
}

} /* extern "C" */
