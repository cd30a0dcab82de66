/*
 * Golden-fixture generator for the forward Schur-complement recursion.
 *
 * Calls the reference's PANEL solvers d_forward_schur_trf_tv /
 * d_forward_schur_trs_tv (/root/reference/lqcp_solvers/d_for_schur_rec.c:
 * 45,476 — the implementation the library actually ships; packing and
 * workspace conventions mirrored from
 * test_problems/test_d_forward_schur.c:407-700) on a deterministic
 * full-Hessian chain and dumps problem + solution as JSON.
 *
 * NOTE: reference_code/d_ric_sv_blas.c also contains *_blas twins of these,
 * but their solutions do NOT satisfy the KKT conditions of the problem
 * defined by the library's own residual evaluator (d_res.c:153) — that file
 * is exploration code (its MHE parts are #if 0'd).  The panel solver here
 * is the trusted oracle.
 *
 * Problem (from d_forward_schur_res_tv, d_res.c:153):
 *   min sum 1/2 v_n' Q_n v_n + q_n' v_n
 *   s.t. A_n v_n + b_n = v_{n+1}[0:ne_n]      (multipliers pi_n)
 *
 * Data layout: qb[n] = [q_n (at 0); b_n (at bs-padded offset pnv)];
 * xupi[n] = [v_n; pi_n (at pnv)].
 *
 * Test oracle only; nothing here ships with the framework.
 *
 * Usage: schur_main N nv ne reg > out.json   (ne[N] = 0)
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "aux_d.h"
#include "block_size.h"

int d_forward_schur_trf_tv(int N, int *nv, int *ne, double reg, int *diag_hessian, double **hpQA, double **hpLA, double **hdLA, double **hpLe, double *work);
void d_forward_schur_trs_tv(int N, int *nv, int *ne, int *diag_hessian, double **hqb, double **hpLA, double **hdLA, double **hpLe, double **hxupi, double *tmp);

/* deterministic pseudo-random in [-1, 1] */
static double prnd(int *s)
	{
	*s = (1103515245 * (*s) + 12345) & 0x7fffffff;
	return 2.0 * ((double)(*s) / 2147483647.0) - 1.0;
	}

int main(int argc, char **argv)
	{
	if(argc<5) { fprintf(stderr, "usage: %s N nv ne reg\n", argv[0]); return 1; }
	int N = atoi(argv[1]);
	int nv0 = atoi(argv[2]);
	int ne0 = atoi(argv[3]);
	double reg = atof(argv[4]);
	int ii, jj, kk, n;
	int seed = 42;

	const int bs = D_MR;
	const int ncl = D_NCL;

	int *nv = malloc((N+1)*sizeof(int));
	int *ne = malloc((N+1)*sizeof(int));
	int *dh = calloc(N+1, sizeof(int));
	for(n=0; n<=N; n++) { nv[n] = nv0; ne[n] = (n<N) ? ne0 : 0; }

	int pnv = (nv0+bs-1)/bs*bs;
	int cnv = (nv0+ncl-1)/ncl*ncl;
	int pne = (ne0+bs-1)/bs*bs;
	int cne = (ne0+ncl-1)/ncl*ncl;

	double **Q  = malloc((N+1)*sizeof(double*));
	double **A  = malloc((N+1)*sizeof(double*));
	double **q  = malloc((N+1)*sizeof(double*));
	double **b  = malloc((N+1)*sizeof(double*));
	double **hpQA = malloc((N+1)*sizeof(double*));
	double **hqb  = malloc((N+1)*sizeof(double*));
	double **hpLA = malloc((N+1)*sizeof(double*));
	double **hdLA = malloc((N+1)*sizeof(double*));
	double **hpLe = malloc((N+1)*sizeof(double*));
	double **hxupi = malloc((N+1)*sizeof(double*));

	for(n=0; n<=N; n++)
		{
		Q[n] = calloc(nv0*nv0, sizeof(double));
		A[n] = calloc((ne0>0?ne0:1)*nv0, sizeof(double));
		q[n] = calloc(nv0, sizeof(double));
		b[n] = calloc(ne0>0?ne0:1, sizeof(double));

		/* Q = M M' + (1 + n/4) I, column-major */
		double *M = calloc(nv0*nv0, sizeof(double));
		for(ii=0; ii<nv0*nv0; ii++) M[ii] = 0.4*prnd(&seed);
		for(jj=0; jj<nv0; jj++)
			for(ii=0; ii<nv0; ii++)
				{
				double acc = (ii==jj) ? 1.0 + 0.25*n : 0.0;
				for(kk=0; kk<nv0; kk++) acc += M[ii+kk*nv0]*M[jj+kk*nv0];
				Q[n][ii+jj*nv0] = acc;
				}
		free(M);
		for(ii=0; ii<ne[n]*nv0; ii++) A[n][ii] = 0.5*prnd(&seed);
		for(ii=0; ii<nv0; ii++) q[n][ii] = 0.3*prnd(&seed);
		for(ii=0; ii<ne[n]; ii++) b[n][ii] = 0.2*prnd(&seed);

		/* panel packing: [Q; A] like test_d_forward_schur.c:446-453 */
		d_zeros_align(&hpQA[n], pnv+pne, cnv);
		d_cvt_mat2pmat(nv0, nv0, Q[n], nv0, 0, hpQA[n], cnv);
		if(ne[n]>0)
			d_cvt_mat2pmat(ne[n], nv0, A[n], ne[n], 0, hpQA[n]+pnv*cnv, cnv);

		d_zeros_align(&hqb[n], pnv+pne, 1);
		for(ii=0; ii<nv0; ii++) hqb[n][ii] = q[n][ii];
		for(ii=0; ii<ne[n]; ii++) hqb[n][pnv+ii] = b[n][ii];

		d_zeros_align(&hpLA[n], pnv+pne, cnv);
		d_zeros_align(&hdLA[n], pnv, 1);
		d_zeros_align(&hpLe[n], pne, cne);
		d_zeros_align(&hxupi[n], pnv+pne, 1);
		}

	double *work; d_zeros_align(&work, pne*cne+pne, 1);
	double *tmp; d_zeros_align(&tmp, pne, 1);

	int ret = d_forward_schur_trf_tv(N, nv, ne, reg, dh, hpQA, hpLA, hdLA, hpLe, work);
	if(ret!=0) { fprintf(stderr, "trf failed %d\n", ret); return 2; }
	d_forward_schur_trs_tv(N, nv, ne, dh, hqb, hpLA, hdLA, hpLe, hxupi, tmp);

	printf("{\n");
	printf("\"N\": %d, \"nv\": %d, \"ne\": %d, \"reg\": %.17g,\n", N, nv0, ne0, reg);
	printf("\"Q\": [");
	for(n=0; n<=N; n++)
		{
		printf("[");
		for(ii=0; ii<nv0*nv0; ii++) printf("%.17g%s", Q[n][ii], ii<nv0*nv0-1?",":"");
		printf("]%s", n<N?",":"");
		}
	printf("],\n\"A\": [");
	for(n=0; n<N; n++)
		{
		printf("[");
		for(ii=0; ii<ne0*nv0; ii++) printf("%.17g%s", A[n][ii], ii<ne0*nv0-1?",":"");
		printf("]%s", n<N-1?",":"");
		}
	printf("],\n\"q\": [");
	for(n=0; n<=N; n++)
		{
		printf("[");
		for(ii=0; ii<nv0; ii++) printf("%.17g%s", q[n][ii], ii<nv0-1?",":"");
		printf("]%s", n<N?",":"");
		}
	printf("],\n\"b\": [");
	for(n=0; n<N; n++)
		{
		printf("[");
		for(ii=0; ii<ne0; ii++) printf("%.17g%s", b[n][ii], ii<ne0-1?",":"");
		printf("]%s", n<N-1?",":"");
		}
	printf("],\n\"v\": [");
	for(n=0; n<=N; n++)
		{
		printf("[");
		for(ii=0; ii<nv0; ii++) printf("%.17g%s", hxupi[n][ii], ii<nv0-1?",":"");
		printf("]%s", n<N?",":"");
		}
	printf("],\n\"pi\": [");
	for(n=0; n<N; n++)
		{
		printf("[");
		for(ii=0; ii<ne0; ii++) printf("%.17g%s", hxupi[n][pnv+ii], ii<ne0-1?",":"");
		printf("]%s", n<N-1?",":"");
		}
	printf("]\n}\n");
	return 0;
	}
