/*
 * Golden-fixture generator for FULL condensing (N -> 1).
 *
 * Calls the reference's dedicated full-condensing driver d_cond_lqcp
 * (/root/reference/lqcp_solvers/d_cond.c:3617) with N2=1 for all three
 * flops-class algorithms:
 *   alg=0  N^3 nx^2   (d_cond_R_N3_nx2,  d_cond.c:76)
 *   alg=1  N^2 nx^2   (d_cond_R_N2_nx2,  d_cond.c:239)
 *   alg=2  N^2 nx^3   (d_cond_R_N2_nx3,  d_cond.c:483)
 * and dumps the condensed data (R2, r2, B2, b2) per algorithm as JSON.
 * With N2=1 the reference eliminates the initial state entirely
 * (nx2[0]=0, d_cond.c:3733) and keeps the terminal state: the condensed
 * QP is  min 1/2 U'R2 U + r2'U + (terminal cost on x_N),
 * s.t. x_N = B2 U + b2, with U = [u_0; ...; u_{N-1}].  The terminal
 * Q_N/q_N stay untouched on the kept x_N (nzero_Q_N=0 in the first-stage
 * d_cond_R call, d_cond.c:3751).
 *
 * Input packing mirrors test_problems/test_d_cond_mpc.c:380-460.
 * Time-invariant data like that driver (A, B, b shared across stages;
 * hb[0] = b0 carries the eliminated initial state).
 *
 * Test oracle only; nothing here ships with the framework.
 *
 * Usage: cond_lqcp_main nx nu N > out.json
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "aux_d.h"
#include "block_size.h"

void d_cond_lqcp(int N, int nx, int nu, int alg, double **hpA, double **hpAt, double **hpBt, double **hb, double **hpBAt, int diag_hessian, double **hpQ, double **hpS, double **hpR, double **hr, double **hq, double **hpRSQ, double **hrq, int N2, int *nx2, int *nu2, double **hpA2, double **hpB2, double **hb2, double **hpR2, double **hpSt2, double **hpQ2, double **hr2, double **hq2, double *work_double);
int d_cond_lqcp_work_space(int N, int nx, int nu, int N2, int alg);
void dgecp_lib(int m, int n, int offsetA, double *A, int sda, int offsetB, double *B, int sdb);
void dgetr_lib(int m, int n, int offsetA, double *pA, int sda, int offsetC, double *pC, int sdc);

/* deterministic pseudo-random in [-1, 1] */
static double prnd(int *s)
	{
	*s = (1103515245 * (*s) + 12345) & 0x7fffffff;
	return 2.0 * ((double)(*s) / 2147483647.0) - 1.0;
	}

static void dump_vec(const char *k, double *v, int n, int last)
	{
	int ii;
	printf("\"%s\": [", k);
	for(ii=0; ii<n; ii++) printf("%.17g%s", v[ii], ii<n-1?",":"");
	printf("]%s\n", last?"":",");
	}

int main(int argc, char **argv)
	{
	if(argc<4) { fprintf(stderr, "usage: %s nx nu N\n", argv[0]); return 1; }
	int nx = atoi(argv[1]);
	int nu = atoi(argv[2]);
	int N = atoi(argv[3]);
	int ii, jj, kk, n, alg;
	int seed = 42;

	const int bs = D_MR;
	const int ncl = D_NCL;

	int pnx = (nx+bs-1)/bs*bs;
	int pnu = (nu+bs-1)/bs*bs;
	int ny = nu+nx;
	int pny = (ny+bs-1)/bs*bs;
	int cnx = (nx+ncl-1)/ncl*ncl;
	int cnu = (nu+ncl-1)/ncl*ncl;
	int cny = (ny+ncl-1)/ncl*ncl;
	int Nnu = N*nu;
	int pNnu = (Nnu+bs-1)/bs*bs;
	int cNnu = (Nnu+ncl-1)/ncl*ncl;

	/* ---- deterministic time-invariant data (column-major) ---- */
	double *A; d_zeros(&A, nx, nx);
	for(jj=0; jj<nx; jj++)
		for(ii=0; ii<nx; ii++)
			A[ii+jj*nx] = (ii==jj ? 0.8 : 0.0) + 0.1*prnd(&seed);
	double *B; d_zeros(&B, nx, nu);
	for(ii=0; ii<nx*nu; ii++) B[ii] = 0.5*prnd(&seed);
	double *b; d_zeros_align(&b, pnx, 1);
	for(ii=0; ii<nx; ii++) b[ii] = 0.2*prnd(&seed);
	double *b0; d_zeros_align(&b0, pnx, 1);
	for(ii=0; ii<nx; ii++) b0[ii] = 0.3*prnd(&seed);

	/* SPD Q, R; full S */
	double *Q; d_zeros(&Q, nx, nx);
	{
	double *M = calloc(nx*nx, sizeof(double));
	for(ii=0; ii<nx*nx; ii++) M[ii] = 0.4*prnd(&seed);
	for(jj=0; jj<nx; jj++)
		for(ii=0; ii<nx; ii++)
			{
			double acc = (ii==jj) ? 1.0 : 0.0;
			for(kk=0; kk<nx; kk++) acc += M[ii+kk*nx]*M[jj+kk*nx];
			Q[ii+jj*nx] = acc;
			}
	free(M);
	}
	double *R; d_zeros(&R, nu, nu);
	{
	double *M = calloc(nu*nu, sizeof(double));
	for(ii=0; ii<nu*nu; ii++) M[ii] = 0.4*prnd(&seed);
	for(jj=0; jj<nu; jj++)
		for(ii=0; ii<nu; ii++)
			{
			double acc = (ii==jj) ? 2.0 : 0.0;
			for(kk=0; kk<nu; kk++) acc += M[ii+kk*nu]*M[jj+kk*nu];
			R[ii+jj*nu] = acc;
			}
	free(M);
	}
	double *S; d_zeros(&S, nu, nx); /* nu x nx like the reference */
	for(ii=0; ii<nu*nx; ii++) S[ii] = 0.1*prnd(&seed);
	double *q; d_zeros_align(&q, pnx, 1);
	for(ii=0; ii<nx; ii++) q[ii] = 0.3*prnd(&seed);
	double *r; d_zeros_align(&r, pnu, 1);
	for(ii=0; ii<nu; ii++) r[ii] = 0.3*prnd(&seed);

	/* ---- panel packing (test_d_cond_mpc.c:360-460) ---- */
	double *pA; d_zeros_align(&pA, pnx, cnx);
	d_cvt_mat2pmat(nx, nx, A, nx, 0, pA, cnx);
	double *pAt; d_zeros_align(&pAt, pnx, cnx);
	d_cvt_tran_mat2pmat(nx, nx, A, nx, 0, pAt, cnx);
	double *pBt; d_zeros_align(&pBt, pnu, cnx);
	d_cvt_tran_mat2pmat(nx, nu, B, nx, 0, pBt, cnx);
	double *pBAt; d_zeros_align(&pBAt, pny, cnx);
	dgecp_lib(nu, nx, 0, pBt, cnx, 0, pBAt, cnx);
	dgecp_lib(nx, nx, 0, pAt, cnx, nu, pBAt+nu/bs*bs*cnx+nu%bs, cnx);

	double *pQ; d_zeros_align(&pQ, pnx, cnx);
	d_cvt_mat2pmat(nx, nx, Q, nx, 0, pQ, cnx);
	double *pR; d_zeros_align(&pR, pnu, cnu);
	d_cvt_mat2pmat(nu, nu, R, nu, 0, pR, cnu);
	double *pS; d_zeros_align(&pS, pnu, cnx);
	d_cvt_mat2pmat(nu, nx, S, nu, 0, pS, cnx);
	double *pRSQ; d_zeros_align(&pRSQ, pny, cny);
	dgecp_lib(nu, nu, 0, pR, cnu, 0, pRSQ, cny);
	dgetr_lib(nu, nx, 0, pS, cnx, nu, pRSQ+nu/bs*bs*cny+nu%bs, cny);
	dgecp_lib(nx, nx, 0, pQ, cnx, nu, pRSQ+nu/bs*bs*cny+nu%bs+nu*bs, cny);
	double *rq; d_zeros_align(&rq, pny, 1);
	for(ii=0; ii<nu; ii++) rq[ii] = r[ii];
	for(ii=0; ii<nx; ii++) rq[nu+ii] = q[ii];

	double **hpA  = malloc(N*sizeof(double*));
	double **hpAt = malloc(N*sizeof(double*));
	double **hpBt = malloc(N*sizeof(double*));
	double **hb   = malloc(N*sizeof(double*));
	double **hpBAt= malloc(N*sizeof(double*));
	double **hpQ  = malloc((N+1)*sizeof(double*));
	double **hpS  = malloc(N*sizeof(double*));
	double **hpR  = malloc(N*sizeof(double*));
	double **hr   = malloc(N*sizeof(double*));
	double **hq   = malloc((N+1)*sizeof(double*));
	double **hpRSQ= malloc((N+1)*sizeof(double*));
	double **hrq  = malloc((N+1)*sizeof(double*));
	for(n=0; n<N; n++)
		{
		hpA[n] = pA; hpAt[n] = pAt; hpBt[n] = pBt;
		hb[n] = (n==0) ? b0 : b;
		hpBAt[n] = pBAt;
		hpQ[n] = pQ; hpS[n] = pS; hpR[n] = pR;
		hr[n] = r; hq[n] = q; hpRSQ[n] = pRSQ; hrq[n] = rq;
		}
	hpQ[N] = pQ; hq[N] = q; hpRSQ[N] = pRSQ; hrq[N] = rq;

	/* ---- condensed outputs, N2=1 ---- */
	int N2 = 1;
	int nx2[2], nu2[2];
	double *pH_A; d_zeros_align(&pH_A, pnx, cnx);
	double *pH_B; d_zeros_align(&pH_B, pnx, cNnu);
	double *H_b;  d_zeros_align(&H_b, pnx, 1);
	double *pH_R; d_zeros_align(&pH_R, pNnu, cNnu);
	double *pH_St; d_zeros_align(&pH_St, pnx, cNnu);
	double *pH_Q[2]; pH_Q[0] = 0; pH_Q[1] = pQ;
	d_zeros_align(&pH_Q[0], pnx, cnx);
	double *H_q[2]; d_zeros_align(&H_q[0], pnx, 1); H_q[1] = q;
	double *H_r;  d_zeros_align(&H_r, pNnu, 1);
	double **hpA2 = &pH_A; double **hpB2 = &pH_B; double **hb2 = &H_b;
	double **hpR2 = &pH_R; double **hpSt2 = &pH_St;
	double **hr2 = &H_r;

	double *R2d; d_zeros(&R2d, Nnu, Nnu);
	double *B2d; d_zeros(&B2d, nx, Nnu);

	printf("{\n");
	printf("\"config\": {\"nx\": %d, \"nu\": %d, \"N\": %d, \"N2\": 1},\n", nx, nu, N);
	dump_vec("A_colmajor", A, nx*nx, 0);
	dump_vec("B_colmajor", B, nx*nu, 0);
	dump_vec("b", b, nx, 0);
	dump_vec("b0", b0, nx, 0);
	dump_vec("Q_colmajor", Q, nx*nx, 0);
	dump_vec("R_colmajor", R, nu*nu, 0);
	dump_vec("S_colmajor", S, nu*nx, 0);
	dump_vec("q", q, nx, 0);
	dump_vec("r", r, nu, 0);

	for(alg=0; alg<3; alg++)
		{
		int wk = d_cond_lqcp_work_space(N, nx, nu, N2, alg);
		double *work; d_zeros_align(&work, wk, 1);
		for(ii=0; ii<pNnu*cNnu; ii++) pH_R[ii] = 0.0;
		for(ii=0; ii<pnx*cNnu; ii++) pH_B[ii] = 0.0;
		for(ii=0; ii<pnx; ii++) H_b[ii] = 0.0;
		for(ii=0; ii<pNnu; ii++) H_r[ii] = 0.0;

		d_cond_lqcp(N, nx, nu, alg, hpA, hpAt, hpBt, hb, hpBAt, 0,
			hpQ, hpS, hpR, hr, hq, hpRSQ, hrq,
			N2, nx2, nu2, hpA2, hpB2, hb2, hpR2, hpSt2, pH_Q, hr2, H_q, work);

		if(nx2[0]!=0 || nu2[0]!=Nnu)
			{ fprintf(stderr, "unexpected condensed sizes\n"); return 2; }

		d_cvt_pmat2mat(Nnu, Nnu, 0, pH_R, cNnu, R2d, Nnu);
		d_cvt_pmat2mat(nx, Nnu, 0, pH_B, cNnu, B2d, nx);

		char key[32];
		sprintf(key, "R2_colmajor_alg%d", alg); dump_vec(key, R2d, Nnu*Nnu, 0);
		sprintf(key, "B2_colmajor_alg%d", alg); dump_vec(key, B2d, nx*Nnu, 0);
		sprintf(key, "b2_alg%d", alg); dump_vec(key, H_b, nx, 0);
		sprintf(key, "r2_alg%d", alg); dump_vec(key, H_r, Nnu, alg==2);

		free(work);
		}

	printf("}\n");
	return 0;
	}
