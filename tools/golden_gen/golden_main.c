/*
 * Golden-fixture generator for hpmpc_tpu tests.
 *
 * Sets up the mass-spring MPC benchmark exactly as the reference test driver
 * does (see /root/reference/test_problems/test_d_ip_hard.c:140-560 for the
 * conventions: x0 elimination, d[] packing, RSQrq layout) and calls the
 * reference solvers directly:
 *   - d_back_ric_rec_sv_tv_res   (unconstrained Riccati factorize+solve)
 *   - d_ip2_res_mpc_hard_tv      (two-phase Mehrotra IPM)
 * then dumps problem data + solution + per-iteration stats as JSON.
 *
 * This is a test oracle only; nothing here ships with the framework.
 *
 * Usage: golden_main nx nu N ng_mid ngN k_max mu_tol mode > out.json
 *   mode 0 = IPM solve, mode 1 = unconstrained Riccati only
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "aux_d.h"
#include "blas_d.h"
#include "lqcp_solvers.h"
#include "mpc_solvers.h"

int d_ip2_mpc_soft_tv(int *kk, int k_max, double mu0, double mu_tol, double alpha_min, int warm_start, double *stat, int N, int *nx, int *nu, int *nb, int **idxb, int *ng, int *ns, double **pBAbt, double **pQ, double **Z, double **z, double **pDCt, double **d, double **ux, int compute_mult, double **pi, double **lam, double **t, double *double_work_memory);
int d_ip2_mpc_soft_tv_work_space_size_bytes(int N, int *nx, int *nu, int *nb, int *ng, int *ns);
#include "block_size.h"
#include "../../tools/golden_gen/tools_decl.h"

/* ---- mass-spring system (same math as the reference tests) ---- */
static void mass_spring(double Ts, int nx, int nu, double *A, double *B)
	{
	int pp = nx/2;
	int ii, info = 0;
	double *Ac = calloc(nx*nx, sizeof(double));   /* column-major */
	for(ii=0; ii<pp; ii++) Ac[pp+ii + ii*nx] = -2.0;      /* T diag    */
	for(ii=0; ii<pp-1; ii++) Ac[pp+ii+1 + ii*nx] = 1.0;   /* T subdiag */
	for(ii=1; ii<pp; ii++) Ac[pp+ii-1 + ii*nx] = 1.0;     /* T supdiag */
	for(ii=0; ii<pp; ii++) Ac[ii + (pp+ii)*nx] = 1.0;     /* I block   */
	double *Bc = calloc(nx*nu, sizeof(double));
	for(ii=0; ii<nu; ii++) Bc[pp+ii + ii*nx] = 1.0;

	/* A = expm(Ts*Ac) */
	memcpy(A, Ac, nx*nx*sizeof(double));
	for(ii=0; ii<nx*nx; ii++) A[ii] *= Ts;
	expm(nx, A);

	/* B = Ac \ (A - I) * Bc */
	double *T = calloc(nx*nx, sizeof(double));
	memcpy(T, A, nx*nx*sizeof(double));
	for(ii=0; ii<nx; ii++) T[ii + ii*nx] -= 1.0;
	dgemm_nn_3l(nx, nu, nx, T, nx, Bc, nx, B, nx);
	int *ipiv = malloc(nx*sizeof(int));
	dgesv_3l(nx, nu, Ac, nx, ipiv, B, nx, &info);
	free(ipiv); free(T); free(Ac); free(Bc);
	}

static void print_vec(const char *name, double *v, int n, int comma)
	{
	printf("\"%s\": [", name);
	for(int i=0; i<n; i++) printf("%.17e%s", v[i], i<n-1?",":"");
	printf("]%s\n", comma?",":"");
	}

int main(int argc, char **argv)
	{
	if(argc<9) { fprintf(stderr, "usage: %s nx nu N ng_mid ngN k_max mu_tol mode\n", argv[0]); return 1; }
	int nx = atoi(argv[1]);
	int nu = atoi(argv[2]);
	int N  = atoi(argv[3]);
	int ng  = atoi(argv[4]);
	int ngN = atoi(argv[5]);
	int k_max = atoi(argv[6]);
	double mu_tol = atof(argv[7]);
	int mode = atoi(argv[8]);

	/* mode 3 (partial-condensing golden): the ng_mid slot carries N2; the
	   lib4 d_part_cond supports general constraints only at the last stage
	   (d_part_cond.c:969-974), so interior ng is forced to 0 */
	int N2_arg = 0;
	if(mode==3) { N2_arg = ng; ng = 0; }

	int nb = nu + nx/2;
	double alpha_min = 1e-8;
	double mu0 = 2.0;
	double Ts = 0.5;

	const int bs = D_MR, ncl = D_NCL;
	int ii, jj;

	int nbu = nu<nb ? nu : nb;
	int nbx = nb-nu>0 ? nb-nu : 0;

	int nx_v[N+1], nu_v[N+1], nb_v[N+1], ng_v[N+1];
	nx_v[0] = 0; for(ii=1; ii<=N; ii++) nx_v[ii] = nx;
	for(ii=0; ii<N; ii++) nu_v[ii] = nu; nu_v[N] = 0;
	nb_v[0] = nbu; for(ii=1; ii<N; ii++) nb_v[ii] = nb; nb_v[N] = nbx;
	for(ii=0; ii<N; ii++) ng_v[ii] = ii==0 ? 0 : ng; ng_v[N] = ngN;
	if(mode==1) { for(ii=0; ii<=N; ii++) { nb_v[ii]=0; ng_v[ii]=0; } }

	int pnb_v[N+1], png_v[N+1], pnx_v[N+1], pnz_v[N+1], pnux_v[N+1], cnx_v[N+1], cnux_v[N+1], cng_v[N+1];
	for(ii=0; ii<=N; ii++)
		{
		int nuii = ii<N ? nu_v[ii] : 0;
		pnb_v[ii] = (nb_v[ii]+bs-1)/bs*bs;
		png_v[ii] = (ng_v[ii]+bs-1)/bs*bs;
		pnx_v[ii] = (nx_v[ii]+bs-1)/bs*bs;
		pnz_v[ii] = (nuii+nx_v[ii]+1+bs-1)/bs*bs;
		pnux_v[ii] = (nuii+nx_v[ii]+bs-1)/bs*bs;
		cnx_v[ii] = (nx_v[ii]+ncl-1)/ncl*ncl;
		cnux_v[ii] = (nuii+nx_v[ii]+ncl-1)/ncl*ncl;
		cng_v[ii] = (ng_v[ii]+ncl-1)/ncl*ncl;
		}

	/* system */
	double *A = calloc(nx*nx, sizeof(double));
	double *B = calloc(nx*nu, sizeof(double));
	double *b; d_zeros_align(&b, nx, 1);
	double *x0; d_zeros_align(&x0, nx, 1);
	mass_spring(Ts, nx, nu, A, B);
	for(jj=0; jj<nx; jj++) b[jj] = 0.1;
	x0[0] = 2.5; x0[1] = 2.5;

	/* b0 = b + A*x0 (x0 elimination) */
	double *pA; d_zeros_align(&pA, pnx_v[1], cnx_v[1]);
	d_cvt_mat2pmat(nx, nx, A, nx, 0, pA, cnx_v[1]);
	double *b0; d_zeros_align(&b0, pnx_v[1], 1);
	for(ii=0; ii<nx; ii++) b0[ii] = b[ii];
	dgemv_n_lib(nx, nx, pA, cnx_v[1], x0, 1, b0, b0);

	/* pBAbt */
	double *hpBAbt[N];
	for(ii=0; ii<N; ii++)
		{
		d_zeros_align(&hpBAbt[ii], pnz_v[ii], cnx_v[ii+1]);
		d_cvt_tran_mat2pmat(nx, nu_v[ii], B, nx, 0, hpBAbt[ii], cnx_v[ii+1]);
		if(nx_v[ii]>0)
			d_cvt_tran_mat2pmat(nx, nx_v[ii], A, nx, nu_v[ii], hpBAbt[ii]+nu_v[ii]/bs*bs*cnx_v[ii+1]+nu_v[ii]%bs, cnx_v[ii+1]);
		double *bused = ii==0 ? b0 : b;
		d_cvt_tran_mat2pmat(nx, 1, bused, nx, nu_v[ii]+nx_v[ii], hpBAbt[ii]+(nu_v[ii]+nx_v[ii])/bs*bs*cnx_v[ii+1]+(nu_v[ii]+nx_v[ii])%bs, cnx_v[ii+1]);
		}

	/* cost: Q=I, R=2I, S=0, q=0.1, r=0.2 */
	double *Q = calloc(nx*nx, sizeof(double)); for(ii=0; ii<nx; ii++) Q[ii*(nx+1)] = 1.0;
	double *R = calloc(nu*nu, sizeof(double)); for(ii=0; ii<nu; ii++) R[ii*(nu+1)] = 2.0;
	double *S = calloc(nu*nx, sizeof(double));
	double *q = calloc(nx, sizeof(double)); for(ii=0; ii<nx; ii++) q[ii] = 0.1;
	double *r = calloc(nu, sizeof(double)); for(ii=0; ii<nu; ii++) r[ii] = 0.2;

	double *hpQ[N+1];
	for(ii=0; ii<=N; ii++)
		{
		int nu0 = nu_v[ii], nx0 = nx_v[ii];
		d_zeros_align(&hpQ[ii], pnz_v[ii], cnux_v[ii]);
		if(nu0>0)
			{
			d_cvt_mat2pmat(nu0, nu0, R, nu, 0, hpQ[ii], cnux_v[ii]);
			d_cvt_tran_mat2pmat(nu0, 1, r, nu, nu0+nx0, hpQ[ii]+(nu0+nx0)/bs*bs*cnux_v[ii]+(nu0+nx0)%bs, cnux_v[ii]);
			}
		if(nx0>0)
			{
			d_cvt_tran_mat2pmat(nu0, nx0, S, nu, nu0, hpQ[ii]+nu0/bs*bs*cnux_v[ii]+nu0%bs, cnux_v[ii]);
			d_cvt_mat2pmat(nx0, nx0, Q, nx, nu0, hpQ[ii]+nu0/bs*bs*cnux_v[ii]+nu0%bs+nu0*bs, cnux_v[ii]);
			d_cvt_tran_mat2pmat(nx0, 1, q, nx, nu0+nx0, hpQ[ii]+(nu0+nx0)/bs*bs*cnux_v[ii]+(nu0+nx0)%bs+nu0*bs, cnux_v[ii]);
			}
		}

	/* box + general constraints */
	int *hidxb[N+1];
	double *hd[N+1];
	for(ii=0; ii<=N; ii++)
		{
		int_zeros(&hidxb[ii], nb_v[ii]>0?nb_v[ii]:1, 1);
		d_zeros_align(&hd[ii], 2*pnb_v[ii]+2*png_v[ii]>0?2*pnb_v[ii]+2*png_v[ii]:1, 1);
		if(ii<N)
			{
			for(jj=0; jj<nbu && jj<nb_v[ii]; jj++)
				{ hd[ii][jj] = -0.5; hd[ii][pnb_v[ii]+jj] = 0.5; hidxb[ii][jj] = jj; }
			for(; jj<nb_v[ii]; jj++)
				{ hd[ii][jj] = -4.0; hd[ii][pnb_v[ii]+jj] = 4.0; hidxb[ii][jj] = jj; }
			}
		else
			{
			for(jj=0; jj<nb_v[N]; jj++)
				{ hd[ii][jj] = -4.0; hd[ii][pnb_v[ii]+jj] = 4.0; hidxb[ii][jj] = jj; }
			}
		for(jj=0; jj<ng_v[ii]; jj++)
			{
			double lg = ii==N ? 0.0 : -100.0;
			double ug = ii==N ? 0.0 :  100.0;
			hd[ii][2*pnb_v[ii]+jj] = lg;
			hd[ii][2*pnb_v[ii]+png_v[ii]+jj] = ug;
			}
		}

	/* DCt: middle stages select states x[0..ng); last stage selects x[0..ngN) */
	double *hpDCt[N+1];
	for(ii=0; ii<=N; ii++)
		{
		d_zeros_align(&hpDCt[ii], pnux_v[ii], cng_v[ii]>0?cng_v[ii]:1);
		if(ng_v[ii]>0)
			{
			int nu0 = nu_v[ii], nx0 = nx_v[ii];
			double *DC = calloc(ng_v[ii]*(nu0+nx0), sizeof(double));
			for(jj=0; jj<ng_v[ii]; jj++) DC[jj + (nu0+jj)*ng_v[ii]] = 1.0;
			d_cvt_tran_mat2pmat(ng_v[ii], nu0+nx0, DC, ng_v[ii], 0, hpDCt[ii], cng_v[ii]);
			free(DC);
			}
		}

	/* solution memory */
	double *hux[N+1], *hpi[N+1], *hlam[N+1], *ht[N+1];
	for(ii=0; ii<=N; ii++)
		{
		d_zeros_align(&hux[ii], pnz_v[ii], 1);
		d_zeros_align(&hpi[ii], pnx_v[ii<N?ii+1:N], 1);
		d_zeros_align(&hlam[ii], 2*pnb_v[ii]+2*png_v[ii]>0?2*pnb_v[ii]+2*png_v[ii]:1, 1);
		d_zeros_align(&ht[ii], 2*pnb_v[ii]+2*png_v[ii]>0?2*pnb_v[ii]+2*png_v[ii]:1, 1);
		}

	double *stat = calloc(5*k_max, sizeof(double));
	int kk = 0;

	int ws_size = d_ip2_res_mpc_hard_tv_work_space_size_bytes(N, nx_v, nu_v, nb_v, ng_v);
	double *work; v_zeros_align((void**)&work, ws_size);

	if(mode==3)
		{
		/* partial-condensing golden: run the reference d_part_cond
		   (d_part_cond.c:926) and dump the CONDENSED matrices dense */
		int N2 = N2_arg;
		int nx2[N2+1], nu2[N2+1], nb2[N2+1], ng2[N2+1];
		int *hidxb2[N2+1];
		double *hpBAbt2[N2+1], *hpRSQrq2[N2+1], *hpDCt2[N2+1], *hd2[N2+1];
		d_part_cond_compute_problem_size(N, nx_v, nu_v, nb_v, hidxb, ng_v, N2, nx2, nu2, nb2, ng2);
		int mem_size = d_part_cond_memory_space_size_bytes(N, nx_v, nu_v, nb_v, hidxb, ng_v, N2, nx2, nu2, nb2, ng2);
		int wk_size = d_part_cond_work_space_size_bytes(N, nx_v, nu_v, nb_v, hidxb, ng_v, N2, nx2, nu2, nb2, ng2);
		void *mem3; v_zeros_align(&mem3, mem_size);
		void *wk3; v_zeros_align(&wk3, wk_size);
		d_part_cond(N, nx_v, nu_v, nb_v, hidxb, ng_v, hpBAbt, hpQ, hpDCt, hd,
		            N2, nx2, nu2, nb2, hidxb2, ng2, hpBAbt2, hpRSQrq2, hpDCt2, hd2, mem3, wk3);

		printf("{\n\"config\": {\"nx\": %d, \"nu\": %d, \"N\": %d, \"N2\": %d},\n", nx, nu, N, N2);
		print_vec("A", A, nx*nx, 1);
		print_vec("B", B, nx*nu, 1);
		printf("\"nx2\": ["); for(ii=0; ii<=N2; ii++) printf("%d%s", nx2[ii], ii<N2?",":""); printf("],\n");
		printf("\"nu2\": ["); for(ii=0; ii<=N2; ii++) printf("%d%s", nu2[ii], ii<N2?",":""); printf("],\n");
		printf("\"nb2\": ["); for(ii=0; ii<=N2; ii++) printf("%d%s", nb2[ii], ii<N2?",":""); printf("],\n");
		printf("\"ng2\": ["); for(ii=0; ii<=N2; ii++) printf("%d%s", ng2[ii], ii<N2?",":""); printf("],\n");
		printf("\"idxb2\": [");
		for(ii=0; ii<=N2; ii++)
			{
			printf("[");
			for(jj=0; jj<nb2[ii]; jj++) printf("%d%s", hidxb2[ii][jj], jj<nb2[ii]-1?",":"");
			printf("]%s", ii<N2?",":"");
			}
		printf("],\n");
		/* condensed matrices, dense row-major-per-column dump (column-major
		   with lda = rows, flattened) */
		printf("\"BAbt2\": [");
		for(ii=0; ii<N2; ii++)
			{
			int rows = nu2[ii]+nx2[ii]+1, cols = nx2[ii+1];
			int cnx2n = (nx2[ii+1]+ncl-1)/ncl*ncl;
			double *D = calloc(rows*cols, sizeof(double));
			d_cvt_pmat2mat(rows, cols, 0, hpBAbt2[ii], cnx2n, D, rows);
			printf("[");
			for(jj=0; jj<rows*cols; jj++) printf("%.17e%s", D[jj], jj<rows*cols-1?",":"");
			printf("]%s", ii<N2-1?",":"");
			free(D);
			}
		printf("],\n");
		printf("\"RSQrq2\": [");
		for(ii=0; ii<=N2; ii++)
			{
			int nux = nu2[ii]+nx2[ii];
			int rows = nux+1, cols = nux;
			int cnux2n = (nux+ncl-1)/ncl*ncl;
			double *D = calloc(rows*cols, sizeof(double));
			d_cvt_pmat2mat(rows, cols, 0, hpRSQrq2[ii], cnux2n, D, rows);
			printf("[");
			for(jj=0; jj<rows*cols; jj++) printf("%.17e%s", D[jj], jj<rows*cols-1?",":"");
			printf("]%s", ii<N2?",":"");
			free(D);
			}
		printf("],\n");
		printf("\"DCt2\": [");
		for(ii=0; ii<=N2; ii++)
			{
			int nux = nu2[ii]+nx2[ii];
			int rows = nux, cols = ng2[ii];
			int cng2n = (ng2[ii]+ncl-1)/ncl*ncl;
			double *D = calloc((rows*cols>0?rows*cols:1), sizeof(double));
			if(cols>0)
				d_cvt_pmat2mat(rows, cols, 0, hpDCt2[ii], cng2n, D, rows);
			printf("[");
			for(jj=0; jj<rows*cols; jj++) printf("%.17e%s", D[jj], jj<rows*cols-1?",":"");
			printf("]%s", ii<N2?",":"");
			free(D);
			}
		printf("],\n");
		printf("\"d2\": [");
		for(ii=0; ii<=N2; ii++)
			{
			int pnb2n = (nb2[ii]+bs-1)/bs*bs;
			int png2n = (ng2[ii]+bs-1)/bs*bs;
			int tot = 2*nb2[ii]+2*ng2[ii];
			printf("[");
			for(jj=0; jj<nb2[ii]; jj++) printf("%.17e,", hd2[ii][jj]);
			for(jj=0; jj<nb2[ii]; jj++) printf("%.17e%s", hd2[ii][pnb2n+jj], (2*ng2[ii]>0||jj<nb2[ii]-1)?",":"");
			for(jj=0; jj<ng2[ii]; jj++) printf("%.17e,", hd2[ii][2*pnb2n+jj]);
			for(jj=0; jj<ng2[ii]; jj++) printf("%.17e%s", hd2[ii][2*pnb2n+png2n+jj], jj<ng2[ii]-1?",":"");
			printf("]%s", ii<N2?",":"");
			}
		printf("]\n}\n");
		return 0;
		}

	if(mode==1)
		{
		/* unconstrained Riccati: q/b as plain vectors */
		double *hb[N], *hq[N+1], *hPb[N];
		for(ii=0; ii<N; ii++)
			{
			d_zeros_align(&hb[ii], pnx_v[ii+1], 1);
			for(jj=0; jj<nx; jj++) hb[ii][jj] = ii==0 ? b0[jj] : b[jj];
			d_zeros_align(&hPb[ii], pnx_v[ii+1], 1);
			}
		for(ii=0; ii<=N; ii++)
			{
			d_zeros_align(&hq[ii], pnz_v[ii], 1);
			for(jj=0; jj<nu_v[ii]; jj++) hq[ii][jj] = r[jj];
			for(jj=0; jj<nx_v[ii]; jj++) hq[ii][nu_v[ii]+jj] = q[jj];
			}
		int rsize = d_back_ric_rec_sv_tv_work_space_size_bytes(N, nx_v, nu_v, nb_v, ng_v);
		int msize = d_back_ric_rec_sv_tv_memory_space_size_bytes(N, nx_v, nu_v, nb_v, ng_v);
		double *rwork; v_zeros_align((void**)&rwork, rsize);
		double *rmem; v_zeros_align((void**)&rmem, msize);
		double **dummy = NULL;
		d_back_ric_rec_sv_tv_res(N, nx_v, nu_v, nb_v, hidxb, ng_v, 0, hpBAbt, hb, 0, hpQ, hq, dummy, dummy, dummy, dummy, hux, 1, hpi, 1, hPb, rmem, rwork);
		}
	else
		{
		d_ip2_res_mpc_hard_tv(&kk, k_max, mu0, mu_tol, alpha_min, 0, stat, N, nx_v, nu_v, nb_v, hidxb, ng_v, hpBAbt, hpQ, hpDCt, hd, hux, 1, hpi, hlam, ht, work);
		}

	/* mode 4/5: soft-constraint IPM (d_ip2_mpc_soft_tv) on the reference
	   test_d_ip_soft.c configuration: hard input boxes +-0.5, soft state
	   constraints +-1.0 with linear penalty z=100 (mode 4) or additionally
	   quadratic penalty Z=10 (mode 5); Q=0, q=0.1, R=2I, r=0.2, b=0,
	   x0=(3.5,3.5,0,...), mu0=100.  Dumps lam/t in logical order
	   lb,ub(hard) then the 4 soft groups. */
	if(mode==4 || mode==5)
		{
		double Zval = mode==5 ? 10.0 : 0.0;
		double zval = 100.0;
		int ns_v[N+1];
		ns_v[0] = 0; for(ii=1; ii<=N; ii++) ns_v[ii] = nx;
		int nbs_v[N+1];
		/* redefine constraint setup: hard boxes on inputs only */
		for(ii=0; ii<N; ii++) nb_v[ii] = ii==0 ? nbu : nu;
		nb_v[N] = 0;
		for(ii=0; ii<=N; ii++) { ng_v[ii] = 0; nbs_v[ii] = nb_v[ii] + ns_v[ii]; }
		int pns_v[N+1];
		for(ii=0; ii<=N; ii++)
			{
			pnb_v[ii] = (nb_v[ii]+bs-1)/bs*bs;
			png_v[ii] = (ng_v[ii]+bs-1)/bs*bs;
			pns_v[ii] = (ns_v[ii]+bs-1)/bs*bs;
			}
		/* rebuild b=0, x0=(3.5,3.5,...), b0 = A x0 */
		for(ii=0; ii<nx; ii++) { b[ii] = 0.0; x0[ii] = 0.0; }
		x0[0] = 3.5; x0[1] = 3.5;
		for(ii=0; ii<nx; ii++) b0[ii] = 0.0;
		dgemv_n_lib(nx, nx, pA, cnx_v[1], x0, 1, b0, b0);
		for(ii=0; ii<N; ii++)
			{
			double *bused = ii==0 ? b0 : b;
			d_cvt_tran_mat2pmat(nx, 1, bused, nx, nu_v[ii]+nx_v[ii], hpBAbt[ii]+(nu_v[ii]+nx_v[ii])/bs*bs*cnx_v[ii+1]+(nu_v[ii]+nx_v[ii])%bs, cnx_v[ii+1]);
			}
		/* cost: Q=0 diag (keep q=0.1, R=2I, r=0.2 already packed) -> rebuild pQ with Q=0 */
		for(ii=0; ii<nx*nx; ii++) Q[ii] = 0.0;
		for(ii=0; ii<=N; ii++)
			{
			int nu0 = nu_v[ii], nx0 = nx_v[ii];
			for(jj=0; jj<pnz_v[ii]*cnux_v[ii]; jj++) hpQ[ii][jj] = 0.0;
			if(nu0>0)
				{
				d_cvt_mat2pmat(nu0, nu0, R, nu, 0, hpQ[ii], cnux_v[ii]);
				d_cvt_tran_mat2pmat(nu0, 1, r, nu, nu0+nx0, hpQ[ii]+(nu0+nx0)/bs*bs*cnux_v[ii]+(nu0+nx0)%bs, cnux_v[ii]);
				}
			if(nx0>0)
				{
				d_cvt_mat2pmat(nx0, nx0, Q, nx, nu0, hpQ[ii]+nu0/bs*bs*cnux_v[ii]+nu0%bs+nu0*bs, cnux_v[ii]);
				d_cvt_tran_mat2pmat(nx0, 1, q, nx, nu0+nx0, hpQ[ii]+(nu0+nx0)/bs*bs*cnux_v[ii]+(nu0+nx0)%bs+nu0*bs, cnux_v[ii]);
				}
			}
		/* constraints: idxb covers hard inputs then soft states */
		int *hidxbs[N+1]; double *hds[N+1]; double *hZ[N+1]; double *hz[N+1];
		double *hlams[N+1]; double *hts[N+1];
		for(ii=0; ii<=N; ii++)
			{
			int_zeros(&hidxbs[ii], nbs_v[ii]>0?nbs_v[ii]:1, 1);
			d_zeros_align(&hds[ii], 2*pnb_v[ii]+2*png_v[ii]+2*pns_v[ii]>0?2*pnb_v[ii]+2*png_v[ii]+2*pns_v[ii]:1, 1);
			d_zeros_align(&hZ[ii], 2*pns_v[ii]>0?2*pns_v[ii]:1, 1);
			d_zeros_align(&hz[ii], 2*pns_v[ii]>0?2*pns_v[ii]:1, 1);
			d_zeros_align(&hlams[ii], 2*pnb_v[ii]+2*png_v[ii]+4*pns_v[ii]>0?2*pnb_v[ii]+2*png_v[ii]+4*pns_v[ii]:1, 1);
			d_zeros_align(&hts[ii], 2*pnb_v[ii]+2*png_v[ii]+4*pns_v[ii]>0?2*pnb_v[ii]+2*png_v[ii]+4*pns_v[ii]:1, 1);
			for(jj=0; jj<nb_v[ii]; jj++)
				{ hds[ii][jj] = -0.5; hds[ii][pnb_v[ii]+jj] = 0.5; hidxbs[ii][jj] = jj; }
			for(jj=0; jj<ns_v[ii]; jj++)
				{
				hds[ii][2*pnb_v[ii]+2*png_v[ii]+jj] = -1.0;
				hds[ii][2*pnb_v[ii]+2*png_v[ii]+pns_v[ii]+jj] = 1.0;
				hidxbs[ii][nb_v[ii]+jj] = nu_v[ii] + jj;
				hZ[ii][jj] = Zval; hZ[ii][pns_v[ii]+jj] = Zval;
				hz[ii][jj] = zval; hz[ii][pns_v[ii]+jj] = zval;
				}
			}
		double mu0s = 100.0;
		int wss = d_ip2_mpc_soft_tv_work_space_size_bytes(N, nx_v, nu_v, nbs_v, ng_v, ns_v);
		double *works; v_zeros_align((void**)&works, wss);
		d_ip2_mpc_soft_tv(&kk, k_max, mu0s, mu_tol, alpha_min, 0, stat, N, nx_v, nu_v, nb_v, hidxbs, ng_v, ns_v, hpBAbt, hpQ, hZ, hz, NULL, hds, hux, 1, hpi, hlams, hts, works);
		/* dump with soft layout */
		printf("{\n");
		printf("\"config\": {\"nx\": %d, \"nu\": %d, \"N\": %d, \"nb\": %d, \"ns\": %d, \"Z\": %.1f, \"zlin\": %.1f, \"k_max\": %d, \"mu_tol\": %.3e, \"mu0\": %.1f, \"alpha_min\": %.1e, \"mode\": %d},\n",
			nx, nu, N, nu, nx, Zval, zval, k_max, mu_tol, mu0s, alpha_min, mode);
		print_vec("A_colmajor", A, nx*nx, 1);
		print_vec("B_colmajor", B, nx*nu, 1);
		print_vec("b0", b0, nx, 1);
		print_vec("x0", x0, nx, 1);
		printf("\"kk\": %d,\n", kk);
		print_vec("stat", stat, 5*k_max, 1);
		printf("\"ux\": [\n");
		for(ii=0; ii<=N; ii++)
			{
			printf("[");
			int n = nu_v[ii]+nx_v[ii];
			for(jj=0; jj<n; jj++) printf("%.17e%s", hux[ii][jj], jj<n-1?",":"");
			printf("]%s\n", ii<N?",":"");
			}
		printf("],\n");
		printf("\"pi\": [\n");
		for(ii=0; ii<N; ii++)
			{
			printf("[");
			for(jj=0; jj<nx_v[ii+1]; jj++) printf("%.17e%s", hpi[ii][jj], jj<nx_v[ii+1]-1?",":"");
			printf("]%s\n", ii<N-1?",":"");
			}
		printf("],\n");
		/* lam/t logical order: lb_h, ub_h, then soft slots 0..3 */
		double tmpvs[2*nu+4*nx+8];
		int nts;
		printf("\"lam\": [\n");
		for(ii=0; ii<=N; ii++)
			{
			nts = 0;
			for(jj=0; jj<nb_v[ii]; jj++) tmpvs[nts++] = hlams[ii][jj];
			for(jj=0; jj<nb_v[ii]; jj++) tmpvs[nts++] = hlams[ii][pnb_v[ii]+jj];
			for(int ss=0; ss<4; ss++)
				for(jj=0; jj<ns_v[ii]; jj++) tmpvs[nts++] = hlams[ii][2*pnb_v[ii]+2*png_v[ii]+ss*pns_v[ii]+jj];
			printf("[");
			for(jj=0; jj<nts; jj++) printf("%.17e%s", tmpvs[jj], jj<nts-1?",":"");
			printf("]%s\n", ii<N?",":"");
			}
		printf("],\n");
		printf("\"t\": [\n");
		for(ii=0; ii<=N; ii++)
			{
			nts = 0;
			for(jj=0; jj<nb_v[ii]; jj++) tmpvs[nts++] = hts[ii][jj];
			for(jj=0; jj<nb_v[ii]; jj++) tmpvs[nts++] = hts[ii][pnb_v[ii]+jj];
			for(int ss=0; ss<4; ss++)
				for(jj=0; jj<ns_v[ii]; jj++) tmpvs[nts++] = hts[ii][2*pnb_v[ii]+2*png_v[ii]+ss*pns_v[ii]+jj];
			printf("[");
			for(jj=0; jj<nts; jj++) printf("%.17e%s", tmpvs[jj], jj<nts-1?",":"");
			printf("]%s\n", ii<N?",":"");
			}
		printf("]\n");
		printf("}\n");
		return 0;
		}

	/* mode 2: after the full IPM solve, change b0 (new initial state) and
	   re-solve with the retained factorization via
	   d_kkt_solve_new_rhs_res_mpc_hard_tv (RTI-style warm re-solve).
	   The standard dump below then holds the POST-resolve solution. */
	double *x0_new = calloc(nx, sizeof(double));
	double *b0_new; d_zeros_align(&b0_new, pnx_v[1], 1);
	if(mode==2)
		{
		double *hb_vec[N]; double *hq_vec[N+1];
		for(ii=0; ii<N; ii++)
			{
			d_zeros_align(&hb_vec[ii], pnx_v[ii+1], 1);
			for(jj=0; jj<nx; jj++) hb_vec[ii][jj] = ii==0 ? b0[jj] : b[jj];
			}
		for(ii=0; ii<=N; ii++)
			{
			d_zeros_align(&hq_vec[ii], pnz_v[ii], 1);
			for(jj=0; jj<nu_v[ii]; jj++) hq_vec[ii][jj] = r[jj];
			for(jj=0; jj<nx_v[ii]; jj++) hq_vec[ii][nu_v[ii]+jj] = q[jj];
			}
		for(jj=0; jj<nx; jj++) x0_new[jj] = 1.1*x0[jj];
		for(jj=0; jj<nx; jj++) b0_new[jj] = b[jj];
		dgemv_n_lib(nx, nx, pA, cnx_v[1], x0_new, 1, b0_new, b0_new);
		for(jj=0; jj<nx; jj++) hb_vec[0][jj] = b0_new[jj];
		d_kkt_solve_new_rhs_res_mpc_hard_tv(N, nx_v, nu_v, nb_v, hidxb, ng_v, hpBAbt, hb_vec, hpQ, hq_vec, hpDCt, hd, hux, 1, hpi, hlam, ht, work);
		}

	/* ---- dump JSON ---- */
	printf("{\n");
	printf("\"config\": {\"nx\": %d, \"nu\": %d, \"N\": %d, \"nb\": %d, \"ng\": %d, \"ngN\": %d, \"k_max\": %d, \"mu_tol\": %.3e, \"mu0\": %.1f, \"Ts\": %.2f, \"alpha_min\": %.1e, \"mode\": %d},\n",
		nx, nu, N, nb, ng, ngN, k_max, mu_tol, mu0, Ts, alpha_min, mode);
	print_vec("A_colmajor", A, nx*nx, 1);
	print_vec("B_colmajor", B, nx*nu, 1);
	print_vec("b", b, nx, 1);
	print_vec("b0", b0, nx, 1);
	print_vec("x0", x0, nx, 1);
	print_vec("x0_new", x0_new, nx, 1);
	print_vec("b0_new", b0_new, nx, 1);
	printf("\"kk\": %d,\n", kk);
	print_vec("stat", stat, 5*k_max, 1);
	printf("\"ux\": [\n");
	for(ii=0; ii<=N; ii++)
		{
		printf("[");
		int n = nu_v[ii]+nx_v[ii];
		for(jj=0; jj<n; jj++) printf("%.17e%s", hux[ii][jj], jj<n-1?",":"");
		printf("]%s\n", ii<N?",":"");
		}
	printf("],\n");
	printf("\"pi\": [\n");
	for(ii=0; ii<N; ii++)
		{
		printf("[");
		for(jj=0; jj<nx_v[ii+1]; jj++) printf("%.17e%s", hpi[ii][jj], jj<nx_v[ii+1]-1?",":"");
		printf("]%s\n", ii<N-1?",":"");
		}
	printf("],\n");
	/* lam/t in logical order: lb(nb), ub(nb), lg(ng), ug(ng) */
	double tmpv[4*(nb+ng+ngN)+4];
	int ntmp;
	printf("\"lam\": [\n");
	for(ii=0; ii<=N; ii++)
		{
		ntmp = 0;
		for(jj=0; jj<nb_v[ii]; jj++) tmpv[ntmp++] = hlam[ii][jj];
		for(jj=0; jj<nb_v[ii]; jj++) tmpv[ntmp++] = hlam[ii][pnb_v[ii]+jj];
		for(jj=0; jj<ng_v[ii]; jj++) tmpv[ntmp++] = hlam[ii][2*pnb_v[ii]+jj];
		for(jj=0; jj<ng_v[ii]; jj++) tmpv[ntmp++] = hlam[ii][2*pnb_v[ii]+png_v[ii]+jj];
		printf("[");
		for(jj=0; jj<ntmp; jj++) printf("%.17e%s", tmpv[jj], jj<ntmp-1?",":"");
		printf("]%s\n", ii<N?",":"");
		}
	printf("],\n");
	printf("\"t\": [\n");
	for(ii=0; ii<=N; ii++)
		{
		ntmp = 0;
		for(jj=0; jj<nb_v[ii]; jj++) tmpv[ntmp++] = ht[ii][jj];
		for(jj=0; jj<nb_v[ii]; jj++) tmpv[ntmp++] = ht[ii][pnb_v[ii]+jj];
		for(jj=0; jj<ng_v[ii]; jj++) tmpv[ntmp++] = ht[ii][2*pnb_v[ii]+jj];
		for(jj=0; jj<ng_v[ii]; jj++) tmpv[ntmp++] = ht[ii][2*pnb_v[ii]+png_v[ii]+jj];
		printf("[");
		for(jj=0; jj<ntmp; jj++) printf("%.17e%s", tmpv[jj], jj<ntmp-1?",":"");
		printf("]%s\n", ii<N?",":"");
		}
	printf("]\n");
	printf("}\n");

	return 0;
	}
