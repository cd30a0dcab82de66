/*
 * Portable implementations of dpotrf_lib_old / dsyrk_dpotrf_lib_old.
 *
 * The reference's d_cond.c condensing algorithms call these two panel-BLAS
 * routines, which are declared in include/blas_d.h:77-78 but DEFINED
 * NOWHERE in the shipped tree (dead-symbol rot, same situation as the
 * panel MHE solvers — see build_ref.sh).  The call sites
 * (d_cond.c:2663,4149,...) use them as a plain lower-trapezoidal Cholesky
 * with the TRUE diagonal stored in the factor (the result feeds dtrtr_l /
 * dtrmm_nt_u directly, which read the in-panel diagonal), optionally fused
 * with a symmetric rank-k update:
 *
 *   dpotrf_lib_old(m, n, C, sdc, D, sdd, diag):
 *       D[0:m,0:n] = lower-trapezoidal chol of symmetric C (m>=n);
 *       diag[j] = D[j,j]
 *   dsyrk_dpotrf_lib_old(m, n, k, A, sda, alg, C, sdc, D, sdd, diag, fr):
 *       same on (alg? C : 0) + A A' restricted to the first n columns
 *
 * Implemented via unpack -> dense O(n^3) C -> repack using the reference's
 * own d_cvt_(tran_)pmat2mat/d_cvt_mat2pmat converters; golden-fixture
 * tooling only, nothing ships with the framework.
 */

#include <stdlib.h>
#include <math.h>

#include "block_size.h"

void d_cvt_pmat2mat(int row, int col, int offset, double *pA, int sda, double *A, int lda);
void d_cvt_mat2pmat(int row, int col, double *A, int lda, int offset, double *pA, int sda);

/* dense lower-trapezoidal Cholesky: factor leading n x n (lower triangle
   of M is valid), then rows n..m-1 get L21 = M21 L11^-T; M is m x n
   column-major and overwritten by the factor. */
static void dense_trap_chol(int m, int n, double *M, double *diag)
	{
	int i, j, k;
	for(j=0; j<n; j++)
		{
		double d = M[j+j*m];
		for(k=0; k<j; k++) d -= M[j+k*m]*M[j+k*m];
		d = d>0.0 ? sqrt(d) : 0.0;
		M[j+j*m] = d;
		diag[j] = d;
		double dinv = d>0.0 ? 1.0/d : 0.0;
		for(i=j+1; i<m; i++)
			{
			double a = M[i+j*m];
			for(k=0; k<j; k++) a -= M[i+k*m]*M[j+k*m];
			M[i+j*m] = a*dinv;
			}
		}
	/* zero the strict upper triangle of the leading n x n block */
	for(j=1; j<n; j++)
		for(i=0; i<j; i++)
			M[i+j*m] = 0.0;
	}

void dpotrf_lib_old(int m, int n, double *pC, int sdc, double *pD, int sdd, double *diag)
	{
	double *M = malloc((size_t)m*n*sizeof(double));
	d_cvt_pmat2mat(m, n, 0, pC, sdc, M, m);
	dense_trap_chol(m, n, M, diag);
	d_cvt_mat2pmat(m, n, M, m, 0, pD, sdd);
	free(M);
	}

void dsyrk_dpotrf_lib_old(int m, int n, int k, double *pA, int sda, int alg, double *pC, int sdc, double *pD, int sdd, double *diag, int fast_rsqrt)
	{
	(void)fast_rsqrt;
	int i, j, kk;
	double *M = malloc((size_t)m*n*sizeof(double));
	double *Ad = malloc((size_t)m*(k>0?k:1)*sizeof(double));
	if(alg)
		d_cvt_pmat2mat(m, n, 0, pC, sdc, M, m);
	else
		for(i=0; i<m*n; i++) M[i] = 0.0;
	d_cvt_pmat2mat(m, k, 0, pA, sda, Ad, m);
	for(j=0; j<n; j++)
		for(i=j; i<m; i++)   /* lower part only; chol reads only lower */
			{
			double acc = M[i+j*m];
			for(kk=0; kk<k; kk++) acc += Ad[i+kk*m]*Ad[j+kk*m];
			M[i+j*m] = acc;
			}
	dense_trap_chol(m, n, M, diag);
	d_cvt_mat2pmat(m, n, M, m, 0, pD, sdd);
	free(M);
	free(Ad);
	}
