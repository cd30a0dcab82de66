/* Declarations for the helpers in /root/reference/test_problems/tools.c
 * (expm + small LU solve) used by the golden-fixture generator. */
#ifndef GOLDEN_TOOLS_DECL_H
#define GOLDEN_TOOLS_DECL_H
void expm(int row, double *A);
void dgesv_3l(int n, int nrhs, double *A, int lda, int *ipiv, double *B, int ldb, int *info);
void dgemm_nn_3l(int m, int n, int k, double *A, int lda, double *B, int ldb, double *C, int ldc);
#endif
